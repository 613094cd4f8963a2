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
- ``ctx NOT NULL`` → bigram rows (ctx, tok, cnt)

Grand totals are NOT stored: scoring derives T (total tokens) and V
(vocabulary size) from the unigram rows in one vocab-sized
aggregation, so a persisted model parquet is fully self-contained AND
the counts stay a pure SUM monoid — waves fold into the model with a
``groupBy(ctx, tok).sum(cnt)``, never a corpus rescan (the same
additive contract as the BM25 index statistics,
`retrieval.py::save_bm25`).

Scoring (per token, integer micro-nats, rounded ONCE like every other
log-space operator in the repo):

- first token of a doc:   cost = −ln P_uni(w)
- seen bigram (ctx, w):   cost = −ln( cnt(ctx,w) / cnt(ctx) )
- unseen bigram:          cost = −ln( α · P_uni(w) ),  α = 0.4

with P_uni(w) = (cnt(w)+1)/(T+V+1) — add-one smoothing over the vocab
plus ONE out-of-vocabulary slot, so probabilities sum to exactly 1
over V ∪ {OOV} and unseen words score finitely. The bigram MLE
denominator is the context's unigram count (cnt(ctx,·) ≤ cnt(ctx)
structurally, so S ≤ 1), exactly Brants et al.'s f(w_{i−1} w_i) /
f(w_{i−1}). α = 0.4 is their published constant.

Scale shape: training is one corpus scan feeding two map-side-combined
aggregations whose outputs are vocab-sized (unigrams) and
bigram-vocab-sized; scoring is the token stream against three
vocab-sized equi-joins (bigram on (ctx, tok), unigram on tok, unigram
on ctx) and one per-doc aggregation — no window over the corpus, no
Python UDF, no driver loop. Reference parity: the reference engine
(m-mizutani/swarm) has no quality tier at all; this extends the
training-data-pipeline surface the brief asks for.
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
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Count tables of the Stupid-Backoff bigram LM over ``docs`` —
    one frame of (ctx, tok, cnt) with unigram rows at ``ctx IS NULL``
    (see the module docstring for the model contract). Pure counts:
    additive across waves (:func:`lm_merge`), persistable
    (:func:`save_lm`)."""
    base = docs.select(_ws_col(text_col).alias("ws"))
    # adjacent pairs are built ARRAY-side (transform over the token
    # list), so no per-doc window and no corpus-order shuffle ever runs
    pair_arr = F.when(
        F.size("ws") < 2,
        F.expr("cast(array() as array<struct<ctx:string,tok:string>>)"),
    ).otherwise(
        F.expr(
            "transform(slice(ws, 1, size(ws) - 1),"
            " (x, i) -> struct(x as ctx, element_at(ws, i + 2) as tok))"
        )
    )
    # unigram entries (ctx NULL) ride the SAME explode as the bigram
    # entries, so training is ONE corpus scan feeding ONE map-side-
    # combined aggregation — and every consumer of the model (uni
    # filter twice, bi filter once) references one aggregation subtree
    # Spark's exchange reuse materializes once
    uni_arr = F.transform(
        "ws",
        lambda t: F.struct(
            F.lit(None).cast("string").alias("ctx"), t.alias("tok")
        ),
    )
    return (
        base.select(F.explode(F.concat(uni_arr, pair_arr)).alias("e"))
        .select("e.ctx", "e.tok")
        .groupBy("ctx", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
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


def save_lm(model: DataFrame, path: str) -> None:
    """Persist the count tables (one parquet dir — self-contained: T
    and V derive from the unigram rows at load/score time)."""
    model.write.mode("overwrite").parquet(path)


def load_lm(spark, path: str) -> DataFrame:
    return spark.read.parquet(path)


def lm_perplexity(
    docs: DataFrame,
    model: DataFrame,
    alpha: float = LM_ALPHA,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document cross-entropy under the Stupid-Backoff bigram LM:
    (id, n_toks, cost_micro, avg_micro) where cost_micro is the summed
    per-token −ln S in integer micro-nats (each token rounded ONCE)
    and avg_micro = round(cost_micro / n_toks) — the CCNet ranking
    key; perplexity itself is exp(avg nats), monotone in avg_micro, so
    thresholds and quantile gates work on the integer column directly.
    Documents with zero tokens have no likelihood and are absent, the
    same contract as the retrieval scorers.

    Scale shape: token stream → three vocab-sized equi-joins → one
    per-doc sum. The model frame is joined, never collected (only the
    two grand totals T and V come back to the driver — metadata)."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    uni = model.where(F.col("ctx").isNull()).select("tok", "cnt")
    bi = model.where(F.col("ctx").isNotNull()).select(
        "ctx", "tok", F.col("cnt").alias("cnt_pair")
    )
    tv = uni.agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).alias("t"),
        F.count(F.lit(1)).alias("v"),
    ).head()
    t, v = int(tv["t"]), int(tv["v"])
    if t == 0:
        raise ValueError("model has no unigram counts")
    denom = float(t + v + 1)

    ent = docs.select(
        F.col(id_col).alias("id"),
        _ws_col(text_col).alias("ws"),
    ).select(
        "id",
        F.posexplode("ws").alias("i", "tok"),
        F.col("ws"),
    ).select(
        "id",
        "tok",
        # previous token: element_at is 1-based, so ws[i] at 0-based i
        F.when(F.col("i") == 0, F.lit(None).cast("string"))
        .otherwise(F.element_at("ws", F.col("i")))
        .alias("ctx"),
    )
    scored = (
        ent.join(bi, ["ctx", "tok"], "left")
        .join(uni.select(F.col("tok"), F.col("cnt").alias("cnt_tok")), "tok", "left")
        .join(
            uni.select(F.col("tok").alias("ctx"), F.col("cnt").alias("cnt_ctx")),
            "ctx",
            "left",
        )
    )
    p_uni = (F.coalesce(F.col("cnt_tok"), F.lit(0)) + 1) / F.lit(denom)
    cost = (
        F.when(
            F.col("ctx").isNull(),
            F.round(F.lit(-1_000_000) * F.log(p_uni)),
        )
        .when(
            F.col("cnt_pair").isNotNull(),
            F.round(F.lit(-1_000_000) * F.log(F.col("cnt_pair") / F.col("cnt_ctx"))),
        )
        .otherwise(
            F.round(F.lit(-1_000_000) * F.log(F.lit(alpha) * p_uni))
        )
        .cast("long")
    )
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
) -> DataFrame:
    """Evaluate the perplexity gate on a labeled holdout: score
    ``docs``, predict GOOD where ``avg_micro <= t`` (low perplexity =
    in-domain) for each threshold in the sweep, and compare against
    ``label`` (ground truth, NULL = bad). One row PER THRESHOLD with
    exact integer confusion counts plus precision/recall/accuracy/F1
    in integer micro-units rounded once (NULL on a zero denominator) —
    the same value-oracle-able operating curve as the NB gate
    (`text.py::nb_eval_quality`), so a ``curate --lm-max-avg`` cap
    comes from a measured operating point. Docs with zero tokens are
    not scored and therefore not counted (the scorer's contract).

    Scale shape: one scoring pass joined to the label projection on
    the id, fanned out |thresholds|× (a literal), collapsing map-side
    into 4·|thresholds| grand counters."""
    if not thresholds:
        raise ValueError("need at least one threshold")
    scored = lm_perplexity(docs, model, alpha, text_col, id_col)
    labs = docs.select(
        F.col(id_col),
        F.coalesce(label.cast("boolean"), F.lit(False)).alias("y"),
    )
    pred = F.col("avg_micro") <= F.col("threshold_micro")
    cnt = lambda c: F.coalesce(F.sum(c.cast("long")), F.lit(0)).cast("long")
    conf = (
        scored.join(labs, id_col)
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
) -> DataFrame:
    """Keep documents whose average per-token cost under the model is
    ≤ ``max_avg_micro`` micro-nats — the CCNet head/middle cut as a
    curation gate. Returns ``docs``' columns unchanged (semi-join
    against the scored frame, so the corpus is scanned once for
    scoring and survivors pass through by id)."""
    keep = lm_perplexity(docs, model, alpha, text_col, id_col).where(
        F.col("avg_micro") <= F.lit(int(max_avg_micro))
    )
    return docs.join(
        keep.select(F.col(id_col)), id_col, "left_semi"
    )
