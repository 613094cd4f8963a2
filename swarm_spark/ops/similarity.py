"""Approximate-nearest-neighbor search over an embedding column.

Two tiers:
- :func:`ann_topk_bruteforce` — exact top-k by cosine: broadcast the
  query set against the corpus. The baseline and the verifier for any
  approximate index. Scales as O(|Q|·N) with the corpus scan fully
  distributed; right answer for |Q| in the thousands even at 100 TB.
- :func:`ann_topk_cells` — IVF-style: corpus pre-bucketed by a cell
  column; queries probe only their own cell. One equi-join shuffle on
  the cell key instead of a full cross — the scale path. (The cell
  assignment here is the stored ``label``; a k-means assignment UDF
  plugs into the same column without changing the query shape.)

Cosine accumulation is a sequential fold (see dedup.cosine_expr), so a
DuckDB ``list_dot_product``-based oracle reproduces results bit-for-bit.

Ranking is a salted two-phase top-k (:func:`topk_per_query`) so no
window task ever holds one query's full candidate set — the per-task
bound is N/n_salts rows regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import dot_expr
from .sampling import hash_bucket


def topk_per_query(joined: DataFrame, k: int, n_salts: int) -> DataFrame:
    """Exact top-k per query over a (query_id, id, cos) candidate frame.

    Scale shape: TWO-PHASE salted top-k, not one window over query_id —
    a query's candidate set is the whole corpus (brute force) or its
    probed cells (IVF), so `row_number().over(partitionBy(query_id))`
    would serialize every candidate for a query through one
    unsplittable window task. Phase 1 ranks inside (query, salt)
    partitions (salt = deterministic hash of the candidate id, so
    per-task rows are bounded by N/n_salts); a global top-k row is
    necessarily in its salt partition's top-k, so phase 2 re-ranks only
    the ≤ n_salts·k survivors per query. Identical output, identical
    oracle, identical tie-break (cos desc, id asc).
    """
    order = (F.col("cos").desc(), F.col("id"))
    salt = (hash_bucket(F.col("id").cast("string"), "swarm-ann") % n_salts).cast("int")
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
        .select("query_id", "id", "cos", "rank")
        .orderBy("query_id", "rank")
    )


def _salts_for(
    corpus: DataFrame, n_salts: int | None, approx_rows: int | None = None
) -> int:
    # ≤ ~2M candidate rows per (query, salt) window task. The sizing
    # count() is metadata-cheap on a raw parquet source but a real scan
    # on a derived frame — pass n_salts or approx_rows (order of
    # magnitude suffices) to skip it, same contract as the samplers.
    if n_salts is not None:
        if n_salts < 1:
            raise ValueError(f"n_salts must be >= 1, got {n_salts}")
        return n_salts
    n = approx_rows if approx_rows is not None else corpus.count()
    return max(16, n // 2_000_000)


def _probe_is_small(queries: DataFrame, broadcast_max_queries: int | None) -> bool:
    """Broadcast guard for the query side of an ANN join: True iff the
    batch has at most ``broadcast_max_queries`` rows. The
    ``limit(n+1).count()`` probe caps the action's cost regardless of
    the batch's true size (at 10M queries it still scans n+1 rows), so
    a production-sized batch can never blow the broadcast limit or the
    driver heap — it falls back to a shuffle/cartesian plan that AQE
    sizes instead. ``None`` disables broadcasting outright."""
    return broadcast_max_queries is not None and (
        queries.limit(broadcast_max_queries + 1).count() <= broadcast_max_queries
    )


def _maybe_broadcast(q: DataFrame, small: bool) -> DataFrame:
    return F.broadcast(q) if small else q


def ann_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_salts: int | None = None,
    broadcast_max_queries: int | None = 10_000,
    approx_rows: int | None = None,
) -> DataFrame:
    """Exact top-k: (query_id, id, cos, rank); ties broken by id.

    Squared norms are precomputed per side (N + |Q| folds) so each of
    the |Q|·N candidate pairs costs one array fold; algebra matches
    the oracle's sqrt(ldp·ldp) exactly. Query batches over
    ``broadcast_max_queries`` rows skip the broadcast (an unguarded
    broadcast of a 10M-query batch OOMs the driver) and run the honest
    block-cartesian plan that a genuinely huge exact Q×N scan is.
    """
    n_salts = _salts_for(corpus, n_salts, approx_rows)
    small = _probe_is_small(queries, broadcast_max_queries)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        dot_expr(vec_col, vec_col).alias("qn2"),
    )
    c = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("cv"),
        dot_expr(vec_col, vec_col).alias("cn2"),
    )
    joined = c.crossJoin(_maybe_broadcast(q, small)).where(
        F.col("query_id") != F.col("id")
    ).select(
        "query_id",
        "id",
        F.round(dot_expr("qv", "cv") / F.sqrt(F.col("qn2") * F.col("cn2")), 9).alias("cos"),
    )
    return topk_per_query(joined, k, n_salts)


def ann_topk_cells(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cell_col: str = "label",
    n_salts: int | None = None,
    broadcast_max_queries: int | None = 10_000,
    approx_rows: int | None = None,
) -> DataFrame:
    """IVF-bucketed top-k: probe only the query's own cell. Oversized
    query batches fall back from the broadcast to a plain ``cell``
    equi-join (see :func:`_probe_is_small`)."""
    n_salts = _salts_for(corpus, n_salts, approx_rows)
    small = _probe_is_small(queries, broadcast_max_queries)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(cell_col).alias("cell"),
        F.col(vec_col).alias("qv"),
        dot_expr(vec_col, vec_col).alias("qn2"),
    )
    c = corpus.select(
        F.col(id_col).alias("id"),
        F.col(cell_col).alias("cell"),
        F.col(vec_col).alias("cv"),
        dot_expr(vec_col, vec_col).alias("cn2"),
    )
    joined = c.join(_maybe_broadcast(q, small), "cell").where(
        F.col("query_id") != F.col("id")
    ).select(
        "query_id",
        "id",
        F.round(dot_expr("qv", "cv") / F.sqrt(F.col("qn2") * F.col("cn2")), 9).alias("cos"),
    )
    return topk_per_query(joined, k, n_salts)


def knn_classify(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    n_salts: int | None = None,
    approx_rows: int | None = None,
) -> DataFrame:
    """k-NN label vote — the similarity-search application layer:
    predict each query's label as the majority label among its k
    nearest corpus neighbors by cosine (self excluded). Ties (equal
    votes) break toward the smaller label. Output
    (query_id, pred_label, votes).

    Scale shape: rides :func:`ann_topk_bruteforce`'s salted two-phase
    ranking, then the vote is a k-row-per-query aggregation (bounded by
    the literal k) and the argmax is a struct-max aggregation — no
    window over unbounded keys anywhere.
    """
    nn = ann_topk_bruteforce(
        corpus, queries, k, vec_col, id_col, n_salts, approx_rows=approx_rows
    )
    labels = corpus.select(
        F.col(id_col).alias("id"), F.col(label_col).cast("long").alias("nbr_label")
    )
    votes = (
        nn.join(labels, "id")
        .groupBy("query_id", "nbr_label")
        .agg(F.count(F.lit(1)).cast("long").alias("votes"))
    )
    # argmax by (votes desc, label asc) as a struct max: negate the
    # label for the comparison, keep the real value as payload
    best = votes.groupBy("query_id").agg(
        F.max(
            F.struct(
                F.col("votes"),
                (-F.col("nbr_label")).alias("neg_label"),
                F.col("nbr_label").alias("pred_label"),
            )
        ).alias("b")
    )
    return best.select(
        "query_id", F.col("b.pred_label").alias("pred_label"), F.col("b.votes").alias("votes")
    ).orderBy("query_id")


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Symmetric int8 quantization report — the embedding-compression
    pre-step for ANN at scale (4× smaller vectors, dot products in
    int arithmetic): per vector, scale = max |x_i|, q_i =
    floor(x_i · 127 / scale) ∈ [-128, 127]. Output
    (id, dim, scale_micro, sum_q, min_q, max_q) — scale in integer
    micro-units and integral q-stats, so every column is engine-exact
    (floor and round-half-up of identical doubles; no float sums).

    Scale shape: one codegen'd projection, no shuffle, no UDF — the
    transform/aggregate higher-order functions run per row over the
    array.
    """
    v = F.col(vec_col).cast("array<double>")
    scale = F.array_max(F.transform(v, lambda x: F.abs(x)))
    # zero vectors quantize to zeros (the division would be 0/0)
    q = F.transform(
        v,
        lambda x: F.when(scale == 0, F.lit(0))
        .otherwise(F.floor(x * 127 / scale))
        .cast("long"),
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.size(v).cast("long").alias("dim"),
        F.round(scale * 1_000_000).cast("long").alias("scale_micro"),
        F.aggregate(q, F.lit(0).cast("long"), lambda a, x: a + x).alias("sum_q"),
        F.array_min(q).alias("min_q"),
        F.array_max(q).alias("max_q"),
    ).orderBy("id")


def ann_topk_int8(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_salts: int | None = None,
    broadcast_max_queries: int | None = 10_000,
    approx_rows: int | None = None,
) -> DataFrame:
    """Exact top-k over symmetrically int8-QUANTIZED vectors — the
    compressed-index search path: cosine on floor(x·127/max|x|)
    components. Quantization is deterministic (floor of identical
    doubles), every dot product is a sum of integer-valued doubles
    (< 2^53, exact), so unlike float-approximate indexes this entire
    approximate path is value-oracle-checkable, not just
    recall-invariant-checkable. Zero vectors are excluded (their
    quantized norm is 0 — cosine undefined).

    Ranking: the same salted two-phase top-k as the float path.
    """
    n_salts = _salts_for(corpus, n_salts, approx_rows)

    def quantized(frame: DataFrame, out_id: str, out_vec: str) -> DataFrame:
        v = F.col(vec_col).cast("array<double>")
        scale = F.array_max(F.transform(v, lambda x: F.abs(x)))
        qv = F.transform(
            v,
            lambda x: F.when(scale == 0, F.lit(0.0)).otherwise(
                F.floor(x * 127 / scale)
            ),
        )
        return frame.select(F.col(id_col).alias(out_id), qv.alias(out_vec))

    q = quantized(queries, "query_id", "qv").select(
        "query_id", "qv", dot_expr("qv", "qv").alias("qn2")
    ).where(F.col("qn2") > 0)
    c = quantized(corpus, "id", "cv").select(
        "id", "cv", dot_expr("cv", "cv").alias("cn2")
    ).where(F.col("cn2") > 0)
    small = _probe_is_small(queries, broadcast_max_queries)
    joined = c.crossJoin(_maybe_broadcast(q, small)).where(
        F.col("query_id") != F.col("id")
    ).select(
        "query_id",
        "id",
        F.round(dot_expr("qv", "cv") / F.sqrt(F.col("qn2") * F.col("cn2")), 9).alias("cos"),
    )
    return topk_per_query(joined, k, n_salts)


def ann_topk_dot(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_salts: int | None = None,
    broadcast_max_queries: int | None = 10_000,
    approx_rows: int | None = None,
) -> DataFrame:
    """Exact maximum-inner-product search (MIPS): top-k by raw dot
    product, not cosine — the retrieval mode for recommender-style
    embeddings where magnitude carries signal. Same guarded broadcast
    scan and salted two-phase ranking as the cosine baseline; scores
    rounded to 9 digits (sequential-fold dot, engine-exact)."""
    n_salts = _salts_for(corpus, n_salts, approx_rows)
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("cv"))
    small = _probe_is_small(queries, broadcast_max_queries)
    joined = (
        c.crossJoin(_maybe_broadcast(q, small))
        .where(F.col("query_id") != F.col("id"))
        .select("query_id", "id", F.round(dot_expr("qv", "cv"), 9).alias("cos"))
    )
    out = topk_per_query(joined, k, n_salts)
    return out.withColumnRenamed("cos", "dot")


def mmr_select(
    corpus: DataFrame,
    ranked: DataFrame,
    k: int = 5,
    lam_permille: int = 700,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    rel_col: str = "cos",
    max_shortlist: int | None = 64,
) -> DataFrame:
    """Maximal-marginal-relevance diversified reranking (public:
    Carbonell & Goldstein 1998) of a per-query shortlist: greedily pick
    ``k`` results, each maximizing

        lam·relevance(c) − (1−lam)·max_{s ∈ selected} sim(c, s)

    so near-duplicate hits can't crowd a result page — the standard
    post-ANN diversity pass. ``ranked`` is a shortlist frame
    (query_id, id, ``rel_col``) — e.g. :func:`ann_topk_bruteforce` /
    the PQ rerank output — and ``corpus`` supplies the vectors for the
    pairwise similarity. Output (query_id, id, rank), rank = pick
    order; queries with fewer than k shortlist rows yield all of them.

    Determinism contract: relevance and pairwise cosines are rounded
    ONCE to integer micro-units JVM-side; the greedy loop is then pure
    64-bit-integer arithmetic (score = lam_permille·rel −
    (1000−lam_permille)·maxsim, ties by id ascending), so the
    selection reproduces exactly in an unrolled SQL oracle — no float
    accumulation ever crosses an engine boundary.

    Scale shape: the shortlist is k-bounded per query (metadata next
    to the search that produced it), so the pairwise frame is
    |Q|·shortlist² rows and the greedy loop runs per-query inside ONE
    ``applyInPandas`` over bounded groups (the per-cell-gram house
    pattern, dedup.embedding_dup_pairs) — an Arrow-batched integer
    loop, never a driver collect, never an iterative lineage of k
    joins. ``max_shortlist`` is the structural guard behind that
    bound: each query's candidates cap at the top ``max_shortlist`` by
    relevance (the salted two-phase top-k, no unsplittable window)
    BEFORE the pairwise frame is built, so an unbounded ranked frame
    cannot make the squared stage corpus-sized; lower-relevance rows
    never win an MMR pick in practice. ``None`` disables the cap."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not 0 <= lam_permille <= 1000:
        raise ValueError(f"lam_permille must be in [0, 1000], got {lam_permille}")
    rel = ranked.select(
        "query_id",
        "id",
        F.round(F.lit(1_000_000) * F.col(rel_col)).cast("long").alias("rel"),
    )
    if max_shortlist is not None:
        if max_shortlist < k:
            raise ValueError(f"max_shortlist {max_shortlist} < k {k}")
        rel = topk_per_query(
            rel.select("query_id", "id", F.col("rel").alias("cos")),
            max_shortlist,
            n_salts=16,
        ).select("query_id", "id", F.col("cos").alias("rel"))
    mem = rel.join(
        corpus.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("v"),
            dot_expr(vec_col, vec_col).alias("n2"),
        ),
        "id",
    )
    a = mem.select("query_id", F.col("id").alias("a"), F.col("rel").alias("rel_a"),
                   F.col("v").alias("av"), F.col("n2").alias("an2"))
    b = mem.select("query_id", F.col("id").alias("b"),
                   F.col("v").alias("bv"), F.col("n2").alias("bn2"))
    sim = F.round(
        F.lit(1_000_000)
        * F.round(dot_expr("av", "bv") / F.sqrt(F.col("an2") * F.col("bn2")), 9)
    ).cast("long")
    # a==b rows ride along (sim never consulted for a selected==cand)
    # so singleton shortlists still form a group
    pairs = a.join(b, "query_id").select("query_id", "a", "rel_a", "b", sim.alias("sim"))

    qtype = dict(zip(ranked.columns, (f.dataType.simpleString() for f in ranked.schema)))
    out_schema = (
        f"query_id {qtype['query_id']}, id {qtype['id']}, rank long"
    )
    lam, one_minus = int(lam_permille), 1000 - int(lam_permille)
    kk = int(k)

    def _greedy(pdf):
        import pandas as pd

        qid = pdf["query_id"].iloc[0]
        rel_of = {}
        sim_of = {}
        for row in pdf.itertuples(index=False):
            rel_of[row.a] = int(row.rel_a)
            sim_of[(row.a, row.b)] = int(row.sim)
        remaining = set(rel_of)
        picked = []
        while remaining and len(picked) < kk:
            if not picked:
                best = max(remaining, key=lambda c: (rel_of[c], _NEG(c)))
            else:
                best = max(
                    remaining,
                    key=lambda c: (
                        lam * rel_of[c]
                        - one_minus * max(sim_of[(c, s)] for s, _ in picked),
                        _NEG(c),
                    ),
                )
            picked.append((best, len(picked) + 1))
            remaining.discard(best)
        return pd.DataFrame(
            {
                "query_id": [qid] * len(picked),
                "id": [p for p, _ in picked],
                "rank": [r for _, r in picked],
            }
        )

    return (
        pairs.groupBy("query_id")
        .applyInPandas(_greedy, schema=out_schema)
        .orderBy("query_id", "rank")
    )


class _NEG:
    """Order-reversing wrapper: max(..., key=(score, _NEG(id))) breaks
    score ties by SMALLEST id for any orderable id type."""

    __slots__ = ("v",)

    def __init__(self, v):
        self.v = v

    def __lt__(self, other):
        return other.v < self.v
