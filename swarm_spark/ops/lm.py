"""N-gram language-model perplexity scoring — the classical corpus
quality filter.

Public technique: CCNet (Wenzek et al. 2020, "CCNet: Extracting high
quality monolingual datasets from web crawl data") ranks documents by
their perplexity under a language model trained on a trusted reference
corpus and keeps the low-perplexity head; Stupid Backoff (Brants et
al. 2007, "Large language models in machine translation") is the
counts-only smoothing that makes the model a pair of integer count
tables — no discounting constants to fit, so training is exactly two
aggregations and the whole scorer is deterministic and value-oracle-
able. This is the missing member of the repo's quality tier next to
the hashed-NB classifier (`text.py::nb_train_quality`) and DSIR
importance weights (`text.py::dsir_importance`): NB needs labels,
DSIR needs a target corpus per wave; the LM filter needs ONE trusted
corpus and then scores any wave against it.

Model = one persistable frame of (ctx, tok, cnt):

- ``ctx IS NULL``  → unigram rows (tok, cnt)
- ``ctx NOT NULL`` → k-gram rows for k = 2..order: ctx is the
  space-joined (k−1)-token context (tokens are whitespace-split, so
  the join is unambiguous) and cnt is the k-gram's TRUE corpus
  frequency — including document-final occurrences, exactly Brants et
  al.'s f(·), not a continuation sum. The order of a row is implied
  by its ctx arity, so ONE frame holds the whole backoff chain.

Grand totals are NOT stored: scoring derives T (total tokens) and V
(vocabulary size) from the unigram rows in one vocab-sized
aggregation, so a persisted model parquet is fully self-contained AND
the counts stay a pure SUM monoid — waves fold into the model with a
``groupBy(ctx, tok).sum(cnt)``, never a corpus rescan (the same
additive contract as the BM25 index statistics,
`retrieval.py::save_bm25`).

Scoring (per token, integer micro-nats, rounded ONCE like every other
log-space operator in the repo): at 0-based position i the highest
usable order is m = min(order, i+1); Stupid Backoff starts there and
multiplies α per step down:

- S = α^(m−k) · cnt(k-gram) / cnt(its (k−1)-gram context), for the
  LARGEST k ≤ m whose k-gram was seen in training (the context count
  is structurally present: the prefix of an observed k-gram is an
  observed (k−1)-gram);
- no higher-order hit at all: S = α^(m−1) · P_uni(w).

with P_uni(w) = (cnt(w)+1)/(T+V+1) — add-one smoothing over the vocab
plus ONE out-of-vocabulary slot, so probabilities sum to exactly 1
over V ∪ {OOV} and unseen words score finitely. At order=2 this is
exactly the classical bigram chain: first token → P_uni, seen bigram
→ f(w_{i−1} w_i)/f(w_{i−1}), unseen → α·P_uni. α = 0.4 is Brants et
al.'s published constant; CCNet's operating point is order 5 and the
same count tables serve any order ≤ the trained one. α-powers are
injected as exact Python-computed double literals (never a runtime
``pow``), so the engine and the DuckDB oracle multiply bit-identical
constants.

Scale shape: training is one corpus scan feeding ONE map-side-combined
aggregation whose output is Σ_k (k-gram-vocab)-sized; scoring is the
token stream against 2·order−1 vocab-sized equi-joins (per order k:
the k-gram numerator on (ctx_k, tok) and its (k−1)-gram denominator,
which is the numerator's context looked up as a model row; plus the
unigram on tok) and one per-doc aggregation — no window over the
corpus, no Python UDF, no driver loop. At order=2 that is exactly the
classical 3-join shape (bigram on (ctx, tok), unigram on tok, unigram
on ctx). Reference parity: the reference engine (m-mizutani/swarm)
has no quality tier at all; this extends the training-data-pipeline
surface the brief asks for.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens_col

__all__ = [
    "lm_train",
    "lm_merge",
    "lm_perplexity",
    "lm_gate",
    "lm_eval",
    "save_lm",
    "load_lm",
]

# Brants et al. 2007's published backoff constant.
LM_ALPHA = 0.4


def _ws_col(text_col: str) -> Column:
    # zero-length tokens (leading/trailing/double spaces) are dropped in
    # BOTH engines — the same latent-divergence guard the TF-IDF
    # all-pairs tier carries (ops/allpairs.py::tfidf_postings)
    return F.filter(tokens_col(text_col), lambda t: F.length(t) > 0)


def lm_train(
    docs: DataFrame, text_col: str = "text", order: int = 2
) -> DataFrame:
    """Count tables of the Stupid-Backoff order-``order`` LM over
    ``docs`` — one frame of (ctx, tok, cnt) holding every k-gram count
    for k = 1..order, unigram rows at ``ctx IS NULL`` (see the module
    docstring for the model contract). Pure counts: additive across
    waves (:func:`lm_merge`), persistable (:func:`save_lm`). A model
    trained at order n scores at any order ≤ n (the lower-order tables
    are embedded)."""
    if order < 1:
        raise ValueError(f"order must be >= 1, got {order}")
    base = docs.select(_ws_col(text_col).alias("ws")).where(F.size("ws") >= 1)
    # POSITIONAL k-gram stream: explode positions, then the orders that
    # fit at each position, and build (ctx, tok) per output row with
    # slice/array_join/element_at — all whole-stage-codegen. The former
    # shape exploded a concat of transform-lambda-built struct arrays;
    # higher-order lambdas are interpreted and the generator input is
    # re-evaluated per OUTPUT row at the fused explode (O(len²)
    # interpreted work per doc; measured 2.1-5.7 s → 1.3-1.6 s for the
    # order-3 grouped train at sf0.1, bit-identical counts — guide
    # §4.1, same fix as ops/dedup.py's shingle base). Same multiset:
    # position s contributes one k-gram for every k ≤ order with
    # s + k - 1 ≤ size(ws); k = 1 rows are the unigrams (ctx NULL).
    # Still one corpus scan feeding one map-side-combined aggregation.
    pos = base.select(
        "ws", F.explode(F.sequence(F.lit(1), F.size("ws"))).alias("s")
    )
    ks = pos.select(
        "ws",
        "s",
        F.explode(
            F.sequence(
                F.lit(1),
                F.least(F.lit(order), F.size("ws") - F.col("s") + F.lit(1)),
            )
        ).alias("k"),
    )
    return (
        ks.select(
            F.when(
                F.col("k") > 1,
                F.array_join(F.slice("ws", F.col("s"), F.col("k") - 1), " "),
            ).alias("ctx"),
            F.element_at("ws", F.col("s") + F.col("k") - 1).alias("tok"),
        )
        .groupBy("ctx", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def lm_train_by(
    docs: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
    order: int = 2,
) -> DataFrame:
    """PER-GROUP count tables: (grp, ctx, tok, cnt) holding every
    k-gram count for k = 1..order within each ``group_col`` slice —
    one corpus scan and ONE map-side-combined aggregation train EVERY
    language's model simultaneously (the CCNet per-language reference
    LMs as one grouped frame, instead of |languages| filtered scans).
    Same additive-count contract as :func:`lm_train`; fold waves with
    a (grp, ctx, tok) SUM."""
    if order < 1:
        raise ValueError(f"order must be >= 1, got {order}")
    base = docs.select(
        F.col(group_col).alias("grp"), _ws_col(text_col).alias("ws")
    ).where(F.size("ws") >= 1)
    # positional k-gram stream — same shape and rationale as
    # :func:`lm_train` (guide §4.1: codegen positional explodes instead
    # of an interpreted transform-lambda generator), with the group key
    # carried through
    pos = base.select(
        "grp", "ws", F.explode(F.sequence(F.lit(1), F.size("ws"))).alias("s")
    )
    ks = pos.select(
        "grp",
        "ws",
        "s",
        F.explode(
            F.sequence(
                F.lit(1),
                F.least(F.lit(order), F.size("ws") - F.col("s") + F.lit(1)),
            )
        ).alias("k"),
    )
    return (
        ks.select(
            "grp",
            F.when(
                F.col("k") > 1,
                F.array_join(F.slice("ws", F.col("s"), F.col("k") - 1), " "),
            ).alias("ctx"),
            F.element_at("ws", F.col("s") + F.col("k") - 1).alias("tok"),
        )
        .groupBy("grp", "ctx", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def lm_perplexity_by(
    docs: DataFrame,
    model: DataFrame,
    group_col: str = "lang",
    alpha: float = LM_ALPHA,
    text_col: str = "text",
    id_col: str = "doc_id",
    order: int = 2,
) -> DataFrame:
    """:func:`lm_perplexity` against a GROUPED model
    (:func:`lm_train_by`): every doc is scored under the model of ITS
    OWN ``group_col`` value — (id, grp, n_toks, cost_micro,
    avg_micro). All count lookups add the group key to their join;
    the per-group totals (T, V) stay a vocab-sized joined frame
    instead of driver literals, so one scoring pass serves every
    language. Docs whose group has no unigram mass (or with zero
    tokens) have no likelihood and are absent — the scorer contract.

    Scale shape: identical to the ungrouped scorer — token stream →
    2·order−1 model equi-joins (now (grp, ...)-keyed) → one per-doc
    sum; nothing corpus-sized reaches the driver."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if order < 1:
        raise ValueError(f"order must be >= 1, got {order}")
    uni = model.where(F.col("ctx").isNull()).select("grp", "tok", "cnt")
    grams = model.where(F.col("ctx").isNotNull())
    tv = uni.groupBy("grp").agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).alias("__t"),
        F.count(F.lit(1)).alias("__v"),
    )

    cols = [
        F.col("id"),
        F.col("grp"),
        F.col("i"),
        F.col("tok"),
        F.when(F.col("i") == 0, F.lit(None).cast("string"))
        .otherwise(F.element_at("ws", F.col("i")))
        .alias("prev"),
    ]
    for k in range(3, order + 1):
        cols.append(
            F.when(
                F.col("i") >= k - 1,
                F.expr(f"array_join(slice(ws, i - {k - 2}, {k - 1}), ' ')"),
            ).alias(f"nctx{k}")
        )
        cols.append(
            F.when(
                F.col("i") >= k - 1,
                F.expr(f"array_join(slice(ws, i - {k - 2}, {k - 2}), ' ')"),
            ).alias(f"dctx{k}")
        )
    ent = docs.select(
        F.col(id_col).alias("id"),
        F.col(group_col).alias("grp"),
        _ws_col(text_col).alias("ws"),
    ).select(
        "id",
        "grp",
        F.posexplode("ws").alias("i", "tok"),
        F.col("ws"),
    ).select(*cols)

    scored = ent
    for k in range(2, order + 1):
        nctx = F.col("prev") if k == 2 else F.col(f"nctx{k}")
        num = grams.select(
            F.col("grp").alias(f"_n{k}g"),
            F.col("ctx").alias(f"_n{k}c"),
            F.col("tok").alias(f"_n{k}t"),
            F.col("cnt").alias(f"cnt_num_{k}"),
        )
        scored = scored.join(
            num,
            (F.col("grp") == F.col(f"_n{k}g"))
            & (nctx == F.col(f"_n{k}c"))
            & (F.col("tok") == F.col(f"_n{k}t")),
            "left",
        ).drop(f"_n{k}g", f"_n{k}c", f"_n{k}t")
        if k == 2:
            den = uni.select(
                F.col("grp").alias("_d2g"),
                F.col("tok").alias("_d2t"),
                F.col("cnt").alias("cnt_den_2"),
            )
            scored = scored.join(
                den,
                (F.col("grp") == F.col("_d2g"))
                & (F.col("prev") == F.col("_d2t")),
                "left",
            ).drop("_d2g", "_d2t")
        else:
            den = grams.select(
                F.col("grp").alias(f"_d{k}g"),
                F.col("ctx").alias(f"_d{k}c"),
                F.col("tok").alias(f"_d{k}t"),
                F.col("cnt").alias(f"cnt_den_{k}"),
            )
            scored = scored.join(
                den,
                (F.col("grp") == F.col(f"_d{k}g"))
                & (F.col(f"dctx{k}") == F.col(f"_d{k}c"))
                & (F.col("prev") == F.col(f"_d{k}t")),
                "left",
            ).drop(f"_d{k}g", f"_d{k}c", f"_d{k}t")
    scored = scored.join(
        uni.select(
            F.col("grp").alias("_ug"),
            F.col("tok").alias("_ut"),
            F.col("cnt").alias("cnt_tok"),
        ),
        (F.col("grp") == F.col("_ug")) & (F.col("tok") == F.col("_ut")),
        "left",
    ).drop("_ug", "_ut")
    # per-group totals: an inner join, so groups with no unigram mass
    # drop out (the ungrouped scorer raises instead — there the model
    # IS the group)
    scored = scored.join(tv, "grp")

    denom = (F.col("__t") + F.col("__v") + F.lit(1)).cast("double")
    p_uni = (F.coalesce(F.col("cnt_tok"), F.lit(0)) + 1) / denom
    m = F.least(F.lit(order), F.col("i") + 1)
    cost = F.round(
        F.lit(-1_000_000) * F.log(_alpha_pow(alpha, m - 1, order - 1) * p_uni)
    )
    for k in range(2, order + 1):
        hit = (
            F.col(f"cnt_num_{k}").isNotNull()
            & F.col(f"cnt_den_{k}").isNotNull()
        )
        ratio = F.col(f"cnt_num_{k}") / F.col(f"cnt_den_{k}")
        if k == order:
            cost = F.when(hit, F.round(F.lit(-1_000_000) * F.log(ratio))).otherwise(
                cost
            )
        else:
            cost = F.when(
                hit,
                F.round(
                    F.lit(-1_000_000)
                    * F.log(_alpha_pow(alpha, m - k, order - k) * ratio)
                ),
            ).otherwise(cost)
    cost = cost.cast("long")
    return (
        scored.select("id", "grp", cost.alias("c"))
        .groupBy("id", "grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_toks"),
            F.sum("c").alias("cost_micro"),
        )
        .select(
            F.col("id").alias(id_col),
            F.col("grp").alias(group_col),
            "n_toks",
            "cost_micro",
            F.round(F.col("cost_micro") / F.col("n_toks"))
            .cast("long")
            .alias("avg_micro"),
        )
    )


def lm_buckets_scored(
    labeled: DataFrame,
    group_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tercile-bucket an ALREADY-SCORED frame (``id_col``,
    ``group_col``, n_toks, avg_micro) into CCNet's head/middle/tail
    per group — the bucket-assignment half of :func:`lm_buckets`,
    reusable when the scores came from a grouped scorer
    (:func:`lm_perplexity_by`) or a persisted scored table. Nearest-
    rank histogram terciles, engine-exact on the integer score."""
    from .text import group_value_quantiles

    thr = group_value_quantiles(labeled, group_col, "avg_micro", (333, 667))
    t = thr.groupBy(group_col).agg(
        F.min(F.when(F.col("q_permille") == 333, F.col("value"))).alias("__t1"),
        F.min(F.when(F.col("q_permille") == 667, F.col("value"))).alias("__t2"),
    )
    return (
        labeled.join(F.broadcast(t), group_col)
        .select(
            id_col,
            group_col,
            "n_toks",
            "avg_micro",
            F.when(F.col("avg_micro") <= F.col("__t1"), F.lit("head"))
            .when(F.col("avg_micro") <= F.col("__t2"), F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("bucket"),
        )
    )


def lm_merge(*models: DataFrame) -> DataFrame:
    """Fold count tables from independent waves into one model —
    counts are a SUM monoid, so merge == retrain on the union corpus
    (the additive contract the oracle pins)."""
    if not models:
        raise ValueError("need at least one model frame")
    out = models[0]
    for m in models[1:]:
        out = out.unionByName(m)
    return out.groupBy("ctx", "tok").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )


def lm_merge_by(*models: DataFrame) -> DataFrame:
    """Fold GROUPED count tables (:func:`lm_train_by` frames) from
    independent waves into one grouped model — the same SUM-monoid
    contract as :func:`lm_merge`, keyed by (grp, ctx, tok), so
    merge == retrain on the union corpus for every group at once.
    This is the production CCNet maintenance shape: each wave trains
    its per-language counts in one grouped pass, the stored model is
    the running fold (persist with :func:`save_lm`), and scoring
    (:func:`lm_perplexity_by`) probes the fold without rescanning
    earlier waves."""
    if not models:
        raise ValueError("need at least one model frame")
    out = models[0]
    for m in models[1:]:
        out = out.unionByName(m)
    return out.groupBy("grp", "ctx", "tok").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )


def save_lm(model: DataFrame, path: str) -> None:
    """Persist the count tables (one parquet dir — self-contained: T
    and V derive from the unigram rows at load/score time)."""
    model.write.mode("overwrite").parquet(path)


def load_lm(spark, path: str) -> DataFrame:
    return spark.read.parquet(path)


def _alpha_pow(alpha: float, exponent: Column, max_exp: int) -> Column:
    """α^exponent as a chained-when over exact Python-computed double
    LITERALS (exponent ∈ 0..max_exp, a column). Never a runtime pow:
    the DuckDB oracles inject the repr of the SAME doubles, so both
    engines multiply bit-identical constants — runtime pow could
    differ from libm by an ulp and flip a micro-nat rounding."""
    out = F.lit(float(alpha**max_exp))
    for e in range(max_exp - 1, -1, -1):
        out = F.when(exponent == e, F.lit(float(alpha**e))).otherwise(out)
    return out


def lm_perplexity(
    docs: DataFrame,
    model: DataFrame,
    alpha: float = LM_ALPHA,
    text_col: str = "text",
    id_col: str = "doc_id",
    order: int = 2,
) -> DataFrame:
    """Per-document cross-entropy under the Stupid-Backoff order-n LM:
    (id, n_toks, cost_micro, avg_micro) where cost_micro is the summed
    per-token −ln S in integer micro-nats (each token rounded ONCE)
    and avg_micro = round(cost_micro / n_toks) — the CCNet ranking
    key; perplexity itself is exp(avg nats), monotone in avg_micro, so
    thresholds and quantile gates work on the integer column directly.
    Documents with zero tokens have no likelihood and are absent, the
    same contract as the retrieval scorers. ``order`` must not exceed
    the model's trained order (a higher-order lookup against a
    lower-order model never matches, so every token would pay one
    backoff α too many).

    Scale shape: token stream → 2·order−1 vocab-sized equi-joins (the
    order-k numerator on (ctx_k, tok), its (k−1)-gram denominator —
    the numerator's context looked up as a model row — and the
    unigram on tok) → one per-doc sum. The model frame is joined,
    never collected (only the two grand totals T and V come back to
    the driver — metadata)."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if order < 1:
        raise ValueError(f"order must be >= 1, got {order}")
    uni = model.where(F.col("ctx").isNull()).select("tok", "cnt")
    grams = model.where(F.col("ctx").isNotNull())
    tv = uni.agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).alias("t"),
        F.count(F.lit(1)).alias("v"),
    ).head()
    t, v = int(tv["t"]), int(tv["v"])
    if t == 0:
        raise ValueError("model has no unigram counts")
    denom = float(t + v + 1)

    # per-token join keys: for each k in 2..order the k-gram context
    # ending just before position i (ctx_k, a joined (k−1)-token
    # string, NULL when i < k−1 — a NULL key simply never matches) and
    # for k >= 3 the denominator context (the (k−1)-gram ending at
    # i−1, keyed as model row (den-ctx, prev)). element_at/slice are
    # 1-based; i from posexplode is 0-based.
    cols = [
        F.col("id"),
        F.col("i"),
        F.col("tok"),
        F.when(F.col("i") == 0, F.lit(None).cast("string"))
        .otherwise(F.element_at("ws", F.col("i")))
        .alias("prev"),
    ]
    for k in range(3, order + 1):
        cols.append(
            F.when(
                F.col("i") >= k - 1,
                F.expr(f"array_join(slice(ws, i - {k - 2}, {k - 1}), ' ')"),
            ).alias(f"nctx{k}")
        )
        cols.append(
            F.when(
                F.col("i") >= k - 1,
                F.expr(f"array_join(slice(ws, i - {k - 2}, {k - 2}), ' ')"),
            ).alias(f"dctx{k}")
        )
    ent = docs.select(
        F.col(id_col).alias("id"),
        _ws_col(text_col).alias("ws"),
    ).select(
        "id",
        F.posexplode("ws").alias("i", "tok"),
        F.col("ws"),
    ).select(*cols)

    scored = ent
    for k in range(2, order + 1):
        nctx = F.col("prev") if k == 2 else F.col(f"nctx{k}")
        num = grams.select(
            F.col("ctx").alias(f"_n{k}c"),
            F.col("tok").alias(f"_n{k}t"),
            F.col("cnt").alias(f"cnt_num_{k}"),
        )
        scored = scored.join(
            num,
            (nctx == F.col(f"_n{k}c")) & (F.col("tok") == F.col(f"_n{k}t")),
            "left",
        ).drop(f"_n{k}c", f"_n{k}t")
        if k == 2:
            # the bigram denominator is the unigram count of prev
            den = uni.select(
                F.col("tok").alias("_d2t"), F.col("cnt").alias("cnt_den_2")
            )
            scored = scored.join(
                den, F.col("prev") == F.col("_d2t"), "left"
            ).drop("_d2t")
        else:
            den = grams.select(
                F.col("ctx").alias(f"_d{k}c"),
                F.col("tok").alias(f"_d{k}t"),
                F.col("cnt").alias(f"cnt_den_{k}"),
            )
            scored = scored.join(
                den,
                (F.col(f"dctx{k}") == F.col(f"_d{k}c"))
                & (F.col("prev") == F.col(f"_d{k}t")),
                "left",
            ).drop(f"_d{k}c", f"_d{k}t")
    scored = scored.join(
        uni.select(F.col("tok"), F.col("cnt").alias("cnt_tok")), "tok", "left"
    )

    p_uni = (F.coalesce(F.col("cnt_tok"), F.lit(0)) + 1) / F.lit(denom)
    m = F.least(F.lit(order), F.col("i") + 1)
    # backoff chain, highest order first: the first seen k-gram wins
    # with α^(m−k); nothing seen above the unigram → α^(m−1)·P_uni
    cost = F.round(
        F.lit(-1_000_000) * F.log(_alpha_pow(alpha, m - 1, order - 1) * p_uni)
    )
    for k in range(2, order + 1):
        hit = (
            F.col(f"cnt_num_{k}").isNotNull()
            & F.col(f"cnt_den_{k}").isNotNull()
        )
        ratio = F.col(f"cnt_num_{k}") / F.col(f"cnt_den_{k}")
        if k == order:
            # m ≥ k is implied by the hit (the key needs i ≥ k−1), and
            # k = order forces m = order: exponent 0, no α factor —
            # at order 2 this reproduces the classical seen-bigram
            # branch bit for bit
            cost = F.when(hit, F.round(F.lit(-1_000_000) * F.log(ratio))).otherwise(
                cost
            )
        else:
            cost = F.when(
                hit,
                F.round(
                    F.lit(-1_000_000)
                    * F.log(_alpha_pow(alpha, m - k, order - k) * ratio)
                ),
            ).otherwise(cost)
    cost = cost.cast("long")
    return (
        scored.select("id", cost.alias("c"))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_toks"),
            F.sum("c").alias("cost_micro"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_toks",
            "cost_micro",
            F.round(F.col("cost_micro") / F.col("n_toks"))
            .cast("long")
            .alias("avg_micro"),
        )
    )


def lm_eval(
    docs: DataFrame,
    model: DataFrame,
    label: Column,
    thresholds: list[int] = (8_000_000,),
    alpha: float = LM_ALPHA,
    text_col: str = "text",
    id_col: str = "doc_id",
    order: int = 2,
) -> DataFrame:
    """Evaluate the perplexity gate on a labeled holdout: score
    ``docs``, predict GOOD where ``avg_micro <= t`` (low perplexity =
    in-domain) for each threshold in the sweep, and compare against
    ``label`` (ground truth, NULL = bad). One row PER THRESHOLD with
    exact integer confusion counts plus precision/recall/accuracy/F1
    in integer micro-units rounded once (NULL on a zero denominator) —
    the same value-oracle-able operating curve as the NB gate
    (`text.py::nb_eval_quality`), so a ``curate --lm-max-avg`` cap
    comes from a measured operating point. Docs with zero tokens have
    no score and are counted as predicted-BAD (fn when labeled good,
    tn otherwise) — exactly what :func:`lm_gate` does to them in
    deployment (its semi-join drops unscored docs), so the measured
    curve IS the gate's real operating curve on corpora with empty
    docs.

    Scale shape: one scoring pass joined to the label projection on
    the id, fanned out |thresholds|× (a literal), collapsing map-side
    into 4·|thresholds| grand counters."""
    if not thresholds:
        raise ValueError("need at least one threshold")
    scored = lm_perplexity(docs, model, alpha, text_col, id_col, order)
    labs = docs.select(
        F.col(id_col),
        F.coalesce(label.cast("boolean"), F.lit(False)).alias("y"),
    )
    pred = F.col("avg_micro").isNotNull() & (
        F.col("avg_micro") <= F.col("threshold_micro")
    )
    cnt = lambda c: F.coalesce(F.sum(c.cast("long")), F.lit(0)).cast("long")
    conf = (
        labs.join(scored, id_col, "left")
        .select(
            "avg_micro",
            "y",
            F.explode(
                F.array(*[F.lit(int(t)).cast("long") for t in thresholds])
            ).alias("threshold_micro"),
        )
        .groupBy("threshold_micro")
        .agg(
            cnt(pred & F.col("y")).alias("tp"),
            cnt(pred & ~F.col("y")).alias("fp"),
            cnt(~pred & F.col("y")).alias("fn"),
            cnt(~pred & ~F.col("y")).alias("tn"),
        )
    )
    micro = lambda num, den: F.when(
        den > 0, F.round(F.lit(1_000_000.0) * num / den).cast("long")
    )
    tp, fp, fn, tn = (F.col(c) for c in ("tp", "fp", "fn", "tn"))
    return conf.select(
        "threshold_micro",
        "tp",
        "fp",
        "fn",
        "tn",
        micro(tp, tp + fp).alias("precision_micro"),
        micro(tp, tp + fn).alias("recall_micro"),
        micro(tp + tn, tp + fp + fn + tn).alias("accuracy_micro"),
        micro(2 * tp, 2 * tp + fp + fn).alias("f1_micro"),
    ).orderBy("threshold_micro")


def lm_gate(
    docs: DataFrame,
    model: DataFrame,
    max_avg_micro: int,
    alpha: float = LM_ALPHA,
    text_col: str = "text",
    id_col: str = "doc_id",
    order: int = 2,
) -> DataFrame:
    """Keep documents whose average per-token cost under the model is
    ≤ ``max_avg_micro`` micro-nats — the CCNet head/middle cut as a
    curation gate. Returns ``docs``' columns unchanged (semi-join
    against the scored frame, so the corpus is scanned once for
    scoring and survivors pass through by id). Zero-token docs have no
    score and are DROPPED — :func:`lm_eval` counts them as
    predicted-bad, so its curve matches this behavior."""
    keep = lm_perplexity(docs, model, alpha, text_col, id_col, order).where(
        F.col("avg_micro") <= F.lit(int(max_avg_micro))
    )
    return docs.join(
        keep.select(F.col(id_col)), id_col, "left_semi"
    )


def lm_buckets(
    docs: DataFrame,
    model: DataFrame,
    alpha: float = LM_ALPHA,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "lang",
    order: int = 2,
) -> DataFrame:
    """CCNet's head/middle/tail split (Wenzek et al. 2020 §4.3): per
    ``group_col`` (language), documents are bucketed by reference-LM
    perplexity TERCILES — head = the lowest-perplexity third, the
    slice CCNet keeps outright; middle kept for diversity; tail the
    usual discard. Terciles adapt per language exactly like the
    quality-quantile gate, so a low-resource language is never judged
    against a high-resource language's perplexity scale.

    Boundaries are the repo's nearest-rank histogram quantiles over
    the integer ``avg_micro`` score (rank = (q·n + 999) div 1000), so
    bucket edges are engine-exact; docs with zero tokens are absent
    (the scorer's contract).

    Scale shape: one scoring pass + one histogram-sized quantile walk
    + a broadcast threshold join — the group_value_quantiles
    composition, with perplexity as the value.
    """
    scored = lm_perplexity(docs, model, alpha, text_col, id_col, order)
    labeled = docs.select(F.col(id_col), F.col(group_col)).join(scored, id_col)
    return lm_buckets_scored(labeled, group_col, id_col)
