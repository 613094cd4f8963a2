"""Lexical retrieval over the corpus — the tier next to the embedding
ANN operators (`ops/similarity.py` / `ops/pq.py`), so hybrid (lexical
+ semantic) search composes from the rank lists:

- :func:`bm25_topk` — Robertson/Zaragoza BM25 keyword ranking;
- :func:`lm_topk` — Zhai/Lafferty Dirichlet query likelihood over the
  SAME persisted index (cf stats fold from the postings);
- :func:`phrase_match` / :func:`phrase_match_grams` — exact-phrase
  search (positional intersection over a stored (id, tok, pos) index;
  L-gram equi-join as the short-phrase scale path);
- :func:`rrf_fuse` — reciprocal-rank fusion of any rank lists (MMR
  diversification lives with the vectors:
  :func:`swarm_spark.ops.similarity.mmr_select`).

All index tables (postings, df/cf stats, totals, positions) are
mergeable stored statistics: build once (`save_bm25` /
`save_positional`, CLI ``index --kind bm25|positional``), fold
append-only waves in with a groupBy-sum or plain union, probe with
``docs=None`` and ZERO corpus text reads (plan-test-pinned).

BM25 here is the Lucene/Robertson formulation (public: Robertson &
Zaragoza 2009, "The Probabilistic Relevance Framework: BM25 and
Beyond"):

    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
    score(q, d) = Σ_{t ∈ q∩d} idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

with each per-(query, doc, term) contribution rounded ONCE to integer
micro-nats, so the final per-pair sums are 64-bit-integer arithmetic —
order-independent and engine-exact (the registry's surprisal/DSIR
determinism contract). Query terms are DEDUPLICATED (each distinct
query term contributes once — the Lucene convention for short keyword
queries).

Scale shape (the 100-TB story):
- the postings list (id, tok, tf) and the document-frequency statistic
  (tok, df) are ONE map-side-combined shuffle each over the exploded
  corpus — both are stored statistics a warehouse materializes next to
  the corpus, and ``df``/``n_docs``/``tot_tokens`` are all additive
  across disjoint waves (mergeable, like the vocab/histogram/bitmap
  family);
- a query batch never touches the vocab-sized stats frame at
  broadcast width: query terms equi-join the stats first (output ≤
  |Q|·terms rows — metadata), and only THAT frame broadcasts into the
  postings join, guarded by the similarity-tier bounded batch probe;
- candidates are exactly the docs sharing ≥ 1 query term (the inverted
  index gate) — no all-pairs stage; the final (query, doc) aggregation
  and salted two-phase top-k bound every window task at ~k rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sampling import hash_bucket
from .text import tokens_col


def bm25_postings(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, dl, tok, tf): the inverted-index postings with per-doc
    token length — ONE explode + map-side-combined aggregation. This
    is the materialized search index; ``tf`` is additive per (id, tok)
    so append-only waves fold in with a groupBy-sum."""
    toks = df.select(
        F.col(id_col).alias("id"), tokens_col(text_col).alias("__ws")
    ).withColumn("dl", F.size("__ws").cast("long"))
    return (
        toks.select("id", "dl", F.explode("__ws").alias("tok"))
        .groupBy("id", "dl", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def bm25_stats(postings: DataFrame) -> DataFrame:
    """(tok, df) document frequencies from a postings frame — one
    map-side-combined shuffle ∝ vocab; additive across disjoint
    corpora (merge == groupBy-sum, the stored-statistic contract)."""
    return postings.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))


def bm25_totals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(n_docs, tot_tokens): the corpus grand totals BM25's idf/avgdl
    need — ONE aggregate row computed at BUILD time from the raw docs
    (so zero-token documents count toward N, which a postings-derived
    count would miss). Additive across disjoint waves: merging is
    ``union`` and probes fold multi-row frames with a sum, so the
    stored statistic follows the vocab/histogram/bitmap monoid
    contract."""
    return df.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.coalesce(F.sum(F.size(tokens_col(text_col))), F.lit(0)).alias(
            "tot_tokens"
        ),
    )


def save_bm25(
    postings: DataFrame,
    stats: DataFrame,
    totals: DataFrame,
    path: str,
) -> None:
    """Persist a BM25 lexical index: postings (corpus-sized — the only
    table that scales with the corpus), df stats (vocab-sized) and the
    grand totals (1+ rows; additive). All three are mergeable, so
    append-only waves fold in without rebuilding — mirror of
    :func:`swarm_spark.ops.pq.save_ivfpq`."""
    import os

    postings.write.mode("overwrite").parquet(os.path.join(path, "postings"))
    stats.write.mode("overwrite").parquet(os.path.join(path, "stats"))
    totals.write.mode("overwrite").parquet(os.path.join(path, "totals"))


def load_bm25(spark, path: str) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Read back a :func:`save_bm25` index as (postings, stats,
    totals). The postings keep their embedded schema (any id type
    survives the round trip); totals are pinned to the additive
    (n_docs, tot_tokens) long pair."""
    import os

    return (
        spark.read.parquet(os.path.join(path, "postings")),
        spark.read.parquet(os.path.join(path, "stats")),
        spark.read.schema("n_docs long, tot_tokens long").parquet(
            os.path.join(path, "totals")
        ),
    )


def bm25_topk(
    docs: DataFrame | None,
    queries: DataFrame,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "text",
    n_salts: int = 16,
    broadcast_max_queries: int | None = 10_000,
    postings: DataFrame | None = None,
    stats: DataFrame | None = None,
    totals: DataFrame | None = None,
) -> DataFrame:
    """BM25 top-k search: (query_id, id, score_micro, rank), rank by
    score descending, ties by id ascending. Self-matches are kept (a
    query is external text; if it happens to BE a corpus row, that row
    legitimately scores highest).

    Two entry shapes:

    - **ad-hoc**: pass ``docs``; postings, df stats and totals are
      built in-line (one corpus explode + one grand aggregate).
    - **persisted index** (build-once/probe-many, the ANN-tier
      workflow): pass ``postings``/``stats``/``totals`` from
      :func:`load_bm25` and ``docs=None`` — the probe then touches the
      INDEX tables only, never the raw text (r8 ADVICE: the old path
      re-tokenized every doc per batch, and a drifted ``docs`` could
      silently mismatch the postings). All index frames must describe
      the same corpus — they are one index, not mix-and-match inputs.
      ``totals`` may hold one row per appended wave; it is folded with
      a sum (the additive-statistic contract). With ``postings`` but
      no ``totals`` the totals are derived from the postings' distinct
      (id, dl) pairs — exact unless the corpus contains zero-token
      docs (which contribute to N/avgdl but have no postings); pass
      the stored totals when that matters.

    Corpus totals are ONE driver row however obtained; ``avgdl``
    enters the formula as the exact double ``tot/N`` both engines
    compute identically.
    """
    from .similarity import _probe_is_small

    if k < 1 or k1 <= 0 or not 0.0 <= b <= 1.0:
        raise ValueError(f"need k >= 1, k1 > 0, 0 <= b <= 1; got {k}, {k1}, {b}")
    if postings is None:
        if docs is None:
            raise ValueError("need docs or a persisted postings frame")
        post = bm25_postings(docs, text_col, id_col)
        if totals is None:
            totals = bm25_totals(docs, text_col, id_col)
    else:
        post = postings
        if totals is None:
            # derived fallback: exact except zero-token docs (no
            # postings rows), which shift N/avgdl only
            totals = post.select("id", "dl").distinct().agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.coalesce(F.sum("dl"), F.lit(0)).alias("tot_tokens"),
            )
    if stats is None:
        stats = bm25_stats(post)
    tot = totals.agg(
        F.coalesce(F.sum("n_docs"), F.lit(0)).alias("n"),
        F.coalesce(F.sum("tot_tokens"), F.lit(0)).alias("tt"),
    ).head()
    n, tt = int(tot["n"]), int(tot["tt"])
    if n == 0:
        raise ValueError("corpus is empty")
    avgdl = float(tt) / float(n)

    small = _probe_is_small(queries, broadcast_max_queries)
    qterms = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.explode(tokens_col(query_text_col)).alias("tok"),
        )
        .distinct()
    )
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n)) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    # query terms meet the vocab-sized stats in an equi-join FIRST; the
    # |Q|*terms-row result is what broadcasts into the postings join
    qidf = qterms.join(stats, "tok").select("query_id", "tok", idf.alias("idf"))
    tfnorm = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1)
        * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl))
    )
    term_micro = F.round(F.lit(1_000_000) * F.col("idf") * tfnorm).cast("long")
    joined = (
        post.join(F.broadcast(qidf) if small else qidf, "tok")
        .select("query_id", "id", term_micro.alias("__t"))
        .groupBy("query_id", "id")
        .agg(F.sum("__t").alias("score_micro"))
    )
    order = (F.col("score_micro").desc(), F.col("id"))
    salt = (hash_bucket(F.col("id").cast("string"), "swarm-bm25") % n_salts).cast("int")
    w1 = Window.partitionBy("query_id", "salt").orderBy(*order)
    survivors = (
        joined.withColumn("salt", salt)
        .withColumn("rk", F.row_number().over(w1))
        .where(F.col("rk") <= k)
        .drop("rk", "salt")
    )
    w2 = Window.partitionBy("query_id").orderBy(*order)
    return (
        survivors.withColumn("rank", F.row_number().over(w2).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "id", "score_micro", "rank")
        .orderBy("query_id", "rank")
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 5,
    rrf_k: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of N
    rank lists sharing the (query_id, id, rank) shape — the standard
    hybrid-search combiner (lexical BM25 list + semantic ANN list):

        fused(q, d) = Σ_lists round(1e6 / (rrf_k + rank(q, d)))

    in integer micro-units (missing (q, d) in a list contributes 0),
    re-ranked descending, ties by id. Rank-only fusion needs no score
    calibration between lists — exactly why it is the production
    default for hybrid retrieval.

    Scale shape: a union of k-bounded rank lists (each ≤ |Q|·k rows —
    metadata next to the searches that produced them), one
    map-side-combined sum, and a window over ≤ N_lists·k rows per
    query. Output (query_id, id, rrf_micro, rank)."""
    if not rankings:
        raise ValueError("need at least one ranking")
    if k < 1 or rrf_k < 1:
        raise ValueError(f"need k >= 1 and rrf_k >= 1; got {k}, {rrf_k}")
    contrib = F.round(F.lit(1_000_000.0) / (F.lit(rrf_k) + F.col("rank"))).cast("long")
    parts = [
        r.select("query_id", "id", contrib.alias("__c")) for r in rankings
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = u.groupBy("query_id", "id").agg(F.sum("__c").alias("rrf_micro"))
    w = Window.partitionBy("query_id").orderBy(F.col("rrf_micro").desc(), F.col("id"))
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "id", "rrf_micro", "rank")
        .orderBy("query_id", "rank")
    )


def lm_cf_stats(postings: DataFrame) -> DataFrame:
    """(tok, cf) collection frequencies (total occurrences, not
    document counts) from a postings frame — the statistic
    query-likelihood smoothing needs where BM25 needs ``df``. One
    vocab-sized map-side-combined shuffle; additive across disjoint
    corpora (merge == groupBy-sum, the stored-statistic contract), and
    derivable for free from a persisted :func:`save_bm25` index."""
    return postings.groupBy("tok").agg(F.sum("tf").cast("long").alias("cf"))


def lm_topk(
    docs: DataFrame | None,
    queries: DataFrame,
    k: int = 5,
    mu: float = 2000.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "text",
    n_salts: int = 16,
    broadcast_max_queries: int | None = 10_000,
    postings: DataFrame | None = None,
    cf_stats: DataFrame | None = None,
    totals: DataFrame | None = None,
) -> DataFrame:
    """Query-likelihood retrieval with Dirichlet smoothing (public:
    Zhai & Lafferty 2004, "A Study of Smoothing Methods for Language
    Models Applied to Ad Hoc Information Retrieval") — the other
    classical lexical ranker next to :func:`bm25_topk`, sharing its
    inverted-index gate and persisted-index shapes. Rank-preserving
    decomposition (their Eq. 6):

        score(q, d) = Σ_{t ∈ q∩d} c(t,q)·ln(1 + tf·|C| / (µ·cf(t)))
                      + |q|·ln(µ / (dl + µ))

    with cf(t) the COLLECTION frequency and |C| total corpus tokens.
    Unlike BM25's deduplicated keyword convention, query terms keep
    their multiplicity c(t,q) — the query IS a language-model sample.
    Each ln(...) is rounded ONCE to integer micro-nats and multiplied
    by the integer term count, so per-pair scores are 64-bit-integer
    sums — order-independent and engine-exact. Output (query_id, id,
    score_micro, rank); candidates are docs sharing >= 1 query term
    (the inverted-index gate — the |q|·ln(µ/(dl+µ)) length normalizer
    only reranks docs already in the candidate set).

    Same two entry shapes as :func:`bm25_topk`: ad-hoc (pass ``docs``)
    or persisted index (pass ``postings`` [+ ``totals``] from
    :func:`load_bm25`; ``cf_stats`` folds from the postings when not
    given). Scale shape is BM25's: query terms meet the vocab-sized cf
    stats in an equi-join BEFORE the guarded broadcast into the
    postings join; the salted two-phase top-k bounds every window task
    at ~k rows."""
    from .similarity import _probe_is_small

    if k < 1 or mu <= 0:
        raise ValueError(f"need k >= 1 and mu > 0; got {k}, {mu}")
    if postings is None:
        if docs is None:
            raise ValueError("need docs or a persisted postings frame")
        post = bm25_postings(docs, text_col, id_col)
        if totals is None:
            totals = bm25_totals(docs, text_col, id_col)
    else:
        post = postings
        if totals is None:
            totals = post.select("id", "dl").distinct().agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.coalesce(F.sum("dl"), F.lit(0)).alias("tot_tokens"),
            )
    if cf_stats is None:
        cf_stats = lm_cf_stats(post)
    tot = totals.agg(
        F.coalesce(F.sum("tot_tokens"), F.lit(0)).alias("tt")
    ).head()
    tt = int(tot["tt"])
    if tt == 0:
        raise ValueError("corpus has no tokens")

    small = _probe_is_small(queries, broadcast_max_queries)
    qtoks = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(tokens_col(query_text_col)).alias("tok"),
    )
    qterms = qtoks.groupBy("query_id", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("qtf")
    )
    qlen = qtoks.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("qlen")
    )
    # query terms meet the vocab-sized cf stats FIRST (<= |Q|*terms rows)
    qcf = qterms.join(cf_stats, "tok").select("query_id", "tok", "qtf", "cf")
    term_micro = F.col("qtf") * F.round(
        F.lit(1_000_000.0)
        * F.log(
            F.lit(1.0)
            + (F.col("tf") * F.lit(float(tt))) / (F.lit(mu) * F.col("cf"))
        )
    ).cast("long")
    pairs = (
        post.join(F.broadcast(qcf) if small else qcf, "tok")
        .select("query_id", "id", "dl", term_micro.alias("__t"))
        .groupBy("query_id", "id")
        .agg(F.sum("__t").alias("__s"), F.max("dl").alias("dl"))
    )
    norm_micro = F.col("qlen") * F.round(
        F.lit(1_000_000.0) * F.log(F.lit(mu) / (F.col("dl") + F.lit(mu)))
    ).cast("long")
    scored = (
        pairs.join(F.broadcast(qlen) if small else qlen, "query_id")
        .select(
            "query_id", "id", (F.col("__s") + norm_micro).alias("score_micro")
        )
    )
    order = (F.col("score_micro").desc(), F.col("id"))
    salt = (hash_bucket(F.col("id").cast("string"), "swarm-lm") % n_salts).cast("int")
    w1 = Window.partitionBy("query_id", "salt").orderBy(*order)
    survivors = (
        scored.withColumn("salt", salt)
        .withColumn("rk", F.row_number().over(w1))
        .where(F.col("rk") <= k)
        .drop("rk", "salt")
    )
    w2 = Window.partitionBy("query_id").orderBy(*order)
    return (
        survivors.withColumn("rank", F.row_number().over(w2).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "id", "score_micro", "rank")
        .orderBy("query_id", "rank")
    )


def positional_postings(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, tok, pos): the POSITIONAL inverted index — one posexplode,
    no aggregation (each occurrence is its own row, ~dl rows per doc,
    the standard ~3× postings-size cost of storing positions). Rows
    are per-doc facts, so disjoint append-only waves fold in by plain
    union — no merge arithmetic at all (the simplest member of the
    stored-index family)."""
    return df.select(
        F.col(id_col).alias("id"),
        F.posexplode(tokens_col(text_col)).alias("pos", "tok"),
    ).select("id", "tok", F.col("pos").cast("long").alias("pos"))


def phrase_match(
    docs: DataFrame | None,
    phrases: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    phrase_id_col: str = "phrase_id",
    phrase_text_col: str = "text",
    broadcast_max_queries: int | None = 10_000,
    postings: DataFrame | None = None,
) -> DataFrame:
    """Exact-phrase search over the positional index: (phrase_id, id,
    n_hits) for every document containing the phrase's token sequence
    CONTIGUOUSLY, with n_hits its number of starting positions. The
    classical positional-intersection query (Manning, Raghavan &
    Schütze, IIR §2.4): a document position p matches phrase offset i
    iff doc[p] == phrase[i]; anchoring each candidate row to its
    implied start ``base = pos − i`` turns phrase matching into a pure
    count — base is a hit iff all len(phrase) offsets matched, a
    groupBy, never a per-row scan of the document.

    Scale shape: the phrase terms (|P|·len rows — metadata, broadcast
    under the bounded batch probe) equi-join the positional postings,
    so candidates are exactly the (doc, position) pairs sharing a
    phrase token — the inverted-index gate; no doc is ever re-read or
    re-tokenized per phrase, and every aggregation key (phrase, doc,
    base) is bounded by the posting lists. Pass a persisted
    :func:`positional_postings` frame to skip tokenization entirely
    (build-once/probe-many, ``docs=None``)."""
    from .similarity import _probe_is_small

    if postings is None:
        if docs is None:
            raise ValueError("need docs or a persisted positional postings frame")
        postings = positional_postings(docs, text_col, id_col)
    small = _probe_is_small(phrases, broadcast_max_queries)
    pterms = phrases.select(
        F.col(phrase_id_col).alias("phrase_id"),
        F.posexplode(tokens_col(phrase_text_col)).alias("i", "tok"),
    ).select("phrase_id", F.col("i").cast("long").alias("i"), "tok")
    plen = pterms.groupBy("phrase_id").agg(
        F.count(F.lit(1)).cast("long").alias("plen")
    )
    # each candidate row is one (phrase offset, doc position) agreement;
    # a start position is a hit iff ALL plen offsets agreed
    cand = (
        postings.join(F.broadcast(pterms) if small else pterms, "tok")
        .select("phrase_id", "id", (F.col("pos") - F.col("i")).alias("base"))
    )
    starts = cand.groupBy("phrase_id", "id", "base").agg(
        F.count(F.lit(1)).alias("nm")
    )
    return (
        starts.join(F.broadcast(plen) if small else plen, "phrase_id")
        .where(F.col("nm") == F.col("plen"))
        .groupBy("phrase_id", "id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
        .orderBy("phrase_id", "id")
    )


def save_positional(postings: DataFrame, path: str) -> None:
    """Persist a :func:`positional_postings` index (one corpus-sized
    parquet table). Disjoint append-only waves fold in by writing with
    mode=append — rows are per-doc facts, union IS the merge."""
    import os

    postings.write.mode("overwrite").parquet(os.path.join(path, "postings"))


def load_positional(spark, path: str) -> DataFrame:
    """Read back a :func:`save_positional` index (embedded schema —
    any id type survives the round trip)."""
    import os

    return spark.read.parquet(os.path.join(path, "postings"))


def phrase_match_grams(
    docs: DataFrame,
    phrases: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    phrase_id_col: str = "phrase_id",
    phrase_text_col: str = "text",
    broadcast_max_queries: int | None = 10_000,
) -> DataFrame:
    """:func:`phrase_match` semantics via the n-gram index instead of
    positional intersection — the SCALE PATH for short phrases. Each
    length-L phrase is one L-gram key; docs explode to their contiguous
    L-grams (one row per start position) and the phrase batch
    equi-joins that key, so candidates are EXACTLY the hits — zero
    verification work, where positional intersection pays one
    candidate row per (phrase term, matching position) and degrades
    toward |P|·positions/vocab on low-entropy corpora (measured 26.7×
    wall at 10× data on the saturated scale-probe vocab vs ~linear
    here; SCALING.md). Grams are built once per DISTINCT phrase
    length — the handful of lengths in a batch is driver-visible
    metadata (a bounded ``collect``, like the PQ subspace means).
    Positional intersection remains the general path: arbitrary
    lengths over one shared persisted index.

    Same output contract as :func:`phrase_match`: (phrase_id, id,
    n_hits), n_hits = number of starting positions."""
    from .similarity import _probe_is_small

    from .text import tokens_col

    small = _probe_is_small(phrases, broadcast_max_queries)
    ptoks = tokens_col(phrase_text_col)
    p = phrases.select(
        F.col(phrase_id_col).alias("phrase_id"),
        F.concat_ws(" ", ptoks).alias("gram"),
        F.size(ptoks).alias("plen"),
    )
    lens = sorted(
        r["plen"] for r in p.select("plen").distinct().collect()
    )  # bounded: distinct phrase lengths, not phrases
    if not lens:
        return p.select(
            "phrase_id",
            F.lit(None).cast(docs.schema[id_col].dataType).alias("id"),
            F.lit(0).cast("long").alias("n_hits"),
        ).where(F.lit(False))
    toks = tokens_col(text_col)
    parts = []
    for L in lens:
        grams = F.transform(
            F.sequence(F.lit(0), F.size(toks) - F.lit(L)),
            lambda i: F.concat_ws(" ", F.slice(toks, i + F.lit(1), F.lit(L))),
        )
        d = (
            docs.where(F.size(toks) >= L)  # sequence(0, neg) would wrap
            .select(F.col(id_col).alias("id"), F.explode(grams).alias("gram"))
        )
        pl = p.where(F.col("plen") == L).select("phrase_id", "gram")
        parts.append(
            d.join(F.broadcast(pl) if small else pl, "gram")
            .groupBy("phrase_id", "id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
        )
    out = parts[0]
    for part in parts[1:]:
        out = out.unionByName(part)
    return out.orderBy("phrase_id", "id")
