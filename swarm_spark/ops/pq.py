"""Product quantization (PQ) for compressed ANN search.

Jégou/Douze/Schmid 2011 ("Product Quantization for Nearest Neighbor
Search"): split each d-dim vector into ``m`` subvectors, learn an
independent k-means codebook per subspace, and store each vector as m
small integer codes — d·4 bytes collapse to m bytes (k ≤ 256). Query
time uses ADC (asymmetric distance computation): the query stays
exact, each candidate's distance is the sum of m table lookups
||q_j − codebook_j[code_j]||². This is the storage/scan layout a
100-TB embedding corpus actually ships: the float vectors live cold,
the PQ codes (25–100× smaller) are what the fleet scans.

Spark shapes:
- **Training** mirrors :mod:`swarm_spark.ops.ivf`'s deterministic
  Lloyd contract — init from the k lowest-id vectors' slices, ties
  break by code id, every mean rounded to 9 digits at the driver,
  empty codes keep their previous centroid — but all ``m`` subspace
  k-means run TOGETHER: one exploded (id, sub, subvector) frame, one
  distributed assignment + one per-(sub, code, pos) mean job per
  iteration, regardless of m. Codebooks are m·k small vectors
  (metadata) and round-trip the driver like IVF centroids.
- **Encoding** is a broadcast codebook join + min-struct aggregation
  per (id, sub) — never a window over the corpus; codes collect into
  one array<int> per vector (bounded by m, a literal).
- **Search (ADC)** precomputes each query's m·k lookup table in-plan
  (query × broadcast codebook — metadata-sized), joins it to the
  exploded code frame, and sums per (query, id) in integral
  MICRO-units (each sub-distance rounded to micro once, so the sum is
  64-bit integer arithmetic — order-independent and oracle-exact, the
  inertia trick). Ranking is the salted two-phase top-k, so no window
  task holds one query's full candidate set.

Determinism end to end makes the whole pipeline value-oracle-checkable
against an unrolled per-subspace k-means + ADC written in DuckDB SQL
(`ops_queries.SQL_ANN_PQ`) — recall gates alone can't catch a subtly
wrong distance table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import dot_expr
from .sampling import hash_bucket


def _subvectors(df: DataFrame, vec_col: str, id_col: str, m: int, s: int) -> DataFrame:
    """(id, sub, sv, sv_n2): one row per (vector, subspace), sliced
    in-plan — a codegen explode, no UDF. Rows whose vector length
    differs from the m·s dimension probed from the first row fail the
    job in-plan (``raise_error``) instead of silently zero-padding
    short slices into garbage codes (ADVICE r8) — a ragged corpus is a
    data bug, and the guard costs nothing: no extra scan, just one
    branch inside the explode every caller already pays for."""
    entries = F.array(
        *[
            F.struct(
                F.lit(j).alias("sub"),
                F.slice(F.col("v"), j * s + 1, s).alias("sv"),
            )
            for j in range(m)
        ]
    )
    guarded = F.when(F.size("v") == m * s, entries).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"ragged {vec_col}: expected dim {m * s}, found "),
                F.size("v").cast("string"),
                F.lit(" (id="),
                F.col("id").cast("string"),
                F.lit(")"),
            )
        )
    )
    return (
        df.select(
            F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
        )
        .select("id", F.explode(guarded).alias("e"))
        .select("id", "e.sub", "e.sv")
        .withColumn("sv_n2", dot_expr("sv", "sv"))
    )


def _dim_of(df: DataFrame, vec_col: str) -> int:
    row = df.select(F.size(vec_col).alias("d")).head()
    if row is None:
        raise ValueError(f"empty frame: cannot derive {vec_col!r} dimension")
    return int(row["d"])


def _codebook_df(spark, books: dict[tuple[int, int], list[float]]) -> DataFrame:
    return spark.createDataFrame(
        [
            (j, c, v, sum(x * x for x in v))
            for (j, c), v in sorted(books.items())
        ],
        "sub int, code int, cv array<double>, cn2 double",
    )


def _assign_codes(subs: DataFrame, codebooks: DataFrame) -> DataFrame:
    """(id, sub, code): nearest code per subvector — broadcast
    codebook join + min-struct aggregation (ties break by code id),
    never a corpus-keyed window."""
    d2 = F.col("sv_n2") - 2 * dot_expr("sv", "cv") + F.col("cn2")
    return (
        subs.join(F.broadcast(codebooks), "sub")
        .select("id", "sub", F.struct(d2.alias("d2"), F.col("code")).alias("dc"))
        .groupBy("id", "sub")
        .agg(F.min("dc").alias("b"))
        .select("id", "sub", F.col("b.code").alias("code"))
    )


def pq_train(
    df: DataFrame,
    m: int = 4,
    k: int = 16,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Learn the m per-subspace codebooks; returns the codebook frame
    (sub, code, cv array<double>, cn2) — m·k rows, the persistable
    model. See the module docstring for the determinism contract."""
    if m < 1 or k < 1:
        raise ValueError(f"m and k must be >= 1, got m={m} k={k}")
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    spark = df.sparkSession
    dim = _dim_of(df, vec_col)
    if dim % m != 0:
        raise ValueError(f"vector dim {dim} not divisible by m={m}")
    s = dim // m
    subs = _subvectors(df, vec_col, id_col, m, s).persist()
    try:
        first_k = (
            df.select(
                F.col(id_col).alias("id"),
                F.col(vec_col).cast("array<double>").alias("v"),
            )
            .orderBy("id")
            .limit(k)
            .collect()
        )
        if len(first_k) < k:
            raise ValueError(f"need >= k={k} vectors to init, got {len(first_k)}")
        books = {
            (j, c): [float(x) for x in first_k[c]["v"][j * s : (j + 1) * s]]
            for j in range(m)
            for c in range(k)
        }
        for _ in range(iters):
            assigned = _assign_codes(subs, _codebook_df(spark, books))
            means = (
                assigned.join(subs, ["id", "sub"])
                .select("sub", "code", F.posexplode("sv").alias("pos", "x"))
                .groupBy("sub", "code", "pos")
                .agg(F.avg("x").alias("mu"))
                .collect()
            )
            fresh: dict[tuple[int, int], list[float]] = {}
            for r in means:
                # fixed-digit rounding: the next assignment is
                # independent of float-sum order in the distributed avg
                fresh.setdefault((r["sub"], r["code"]), [0.0] * s)[r["pos"]] = round(
                    r["mu"], 9
                )
            # empty codes keep their previous centroid (IVF contract)
            books = {jc: fresh.get(jc, v) for jc, v in books.items()}
        return _codebook_df(spark, books)
    finally:
        subs.unpersist()


def pq_encode(
    df: DataFrame,
    codebooks: DataFrame,
    m: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, codes array<int>): each vector's m nearest-code indices —
    the compressed corpus representation (m bytes/vector at k ≤ 256).
    One broadcast join + two bounded aggregations; collect_list is
    bounded by m (a literal)."""
    dim = _dim_of(df, vec_col)
    if dim % m != 0:
        raise ValueError(f"vector dim {dim} not divisible by m={m}")
    subs = _subvectors(df, vec_col, id_col, m, dim // m)
    return (
        _assign_codes(subs, codebooks)
        .groupBy("id")
        .agg(
            F.array_sort(F.collect_list(F.struct("sub", "code"))).alias("sc")
        )
        .select("id", F.transform("sc", lambda x: x["code"]).alias("codes"))
    )


def pq_topk(
    codes: DataFrame,
    queries: DataFrame,
    codebooks: DataFrame,
    k: int = 5,
    m: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_salts: int = 16,
    broadcast_max_queries: int | None = 10_000,
) -> DataFrame:
    """ADC top-k: (query_id, id, adc_micro, rank) — approximate squared
    L2 in integral micro-units, rank 1 = nearest, ties by id.
    ``codes`` is the ENCODED corpus (:func:`pq_encode`'s (id, codes)
    frame — the form a deployment materializes); ``queries`` carries
    raw ``vec_col`` vectors (ADC keeps the query side exact).

    The query's m·k lookup table is built in-plan from the broadcast
    codebook; candidates pay ONE integer lookup join per (sub, code)
    and a map-side-combined long sum — the corpus's float vectors are
    never read at query time (that is the point of PQ). Every
    sub-distance is rounded to micro-units once, so per-candidate sums
    are 64-bit-integer arithmetic: order-independent, engine-exact.

    The LUT (|Q|·m·k rows) broadcasts only when the query batch passes
    the bounded ``broadcast_max_queries`` probe (the similarity-tier
    guard): a production-sized batch falls back to a plain (sub, code)
    equi-join AQE sizes, never blowing the broadcast/driver.
    """
    from .similarity import _probe_is_small

    dim = _dim_of(queries, vec_col)
    if dim % m != 0:
        raise ValueError(f"vector dim {dim} not divisible by m={m}")
    small = _probe_is_small(queries, broadcast_max_queries)
    s = dim // m
    qsubs = _subvectors(queries, vec_col, id_col, m, s).withColumnRenamed(
        "id", "query_id"
    )
    d2 = F.col("sv_n2") - 2 * dot_expr("sv", "cv") + F.col("cn2")
    lut = (
        qsubs.join(F.broadcast(codebooks), "sub")
        .select(
            "query_id",
            "sub",
            "code",
            F.round(d2 * 1_000_000).cast("long").alias("d2_micro"),
        )
    )
    code_rows = codes.select(
        F.col("id"),
        F.posexplode("codes").alias("sub", "code"),
    )
    if small:
        matched = code_rows.join(F.broadcast(lut), ["sub", "code"])
    else:
        # Fallback shuffle join: (sub, code) has only m·k (~dozens)
        # distinct values, so hash-partitioning the corpus·m code rows
        # by it would collapse them onto a handful of tasks (ADVICE
        # r8). Salt the big side by id and replicate the LUT across
        # the salts — output identical, shuffle spread over
        # m·k·n_salts keys; the extra shuffle volume is (n_salts − 1)·
        # |LUT|, tiny next to the code-row side it de-skews.
        jsalt = (
            hash_bucket(F.col("id").cast("string"), "swarm-pq-lut") % n_salts
        ).cast("int")
        lut_r = lut.withColumn(
            "jsalt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
        )
        matched = (
            code_rows.withColumn("jsalt", jsalt)
            .join(lut_r, ["sub", "code", "jsalt"])
            .drop("jsalt")
        )
    joined = (
        matched.where(F.col("query_id") != F.col("id"))
        .groupBy("query_id", "id")
        .agg(F.sum("d2_micro").alias("adc_micro"))
    )
    return _rank_adc(joined, k, n_salts)


def _rank_adc(joined: DataFrame, k: int, n_salts: int) -> DataFrame:
    """Salted two-phase top-k over a (query_id, id, adc_micro) frame —
    the similarity.topk_per_query shape with ascending order (nearest
    = smallest ADC, ties by id)."""
    order = (F.col("adc_micro").asc(), F.col("id"))
    salt = (hash_bucket(F.col("id").cast("string"), "swarm-pq") % n_salts).cast("int")
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
        .select("query_id", "id", "adc_micro", "rank")
        .orderBy("query_id", "rank")
    )


def pq_probe_cells(
    codes: DataFrame,
    centroids_df: DataFrame,
    queries: DataFrame,
    codebooks: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    m: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_salts: int = 16,
    broadcast_max_queries: int | None = 10_000,
) -> DataFrame:
    """IVF-PQ search stage: queries rank the broadcast IVF centroids,
    probe their ``nprobe`` nearest cells, and pay ADC lookups ONLY for
    code rows in probed cells — cells cut the candidate set to
    ~nprobe/n_cells of the corpus, codes cut candidate bytes to m
    small ints (FAISS's IndexIVFPQ composition, the no-residual
    variant — codes quantize raw vectors, not cell residuals, keeping
    one codebook corpus-wide and the whole pipeline value-oracle-
    checkable). ``codes`` must carry a ``cell`` column (the persisted
    index form: PQ codes stored alongside their IVF assignment).
    Output (query_id, id, adc_micro, rank).

    The query-derived probes (|Q|·nprobe rows) and LUT (|Q|·m·k rows)
    broadcast only when the batch passes the bounded
    ``broadcast_max_queries`` probe; production-sized batches fall
    back to plain equi-joins AQE sizes (the similarity-tier guard —
    an unguarded broadcast of a 10M-query batch OOMs the driver)."""
    from .similarity import _probe_is_small

    if "cell" not in codes.columns:
        raise ValueError("codes must carry a 'cell' column (join the IVF assignment)")
    dim = _dim_of(queries, vec_col)
    if dim % m != 0:
        raise ValueError(f"vector dim {dim} not divisible by m={m}")
    small = _probe_is_small(queries, broadcast_max_queries)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
        dot_expr(vec_col, vec_col).alias("qn2"),
    )
    centroids = centroids_df.select(
        "cell", F.col("ccv").alias("ccv"), F.col("ccn2").alias("ccn2")
    )
    cd2 = F.col("qn2") - 2 * dot_expr("qv", "ccv") + F.col("ccn2")
    wq = Window.partitionBy("query_id").orderBy("cd2", "cell")
    probes = (
        q.crossJoin(F.broadcast(centroids))
        .select("query_id", "cell", cd2.alias("cd2"))
        .withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= nprobe)
        .select("query_id", "cell")
    )
    qsubs = _subvectors(queries, vec_col, id_col, m, dim // m).withColumnRenamed(
        "id", "query_id"
    )
    d2 = F.col("sv_n2") - 2 * dot_expr("sv", "cv") + F.col("cn2")
    lut = qsubs.join(F.broadcast(codebooks), "sub").select(
        "query_id",
        "sub",
        "code",
        F.round(d2 * 1_000_000).cast("long").alias("d2_micro"),
    )
    code_rows = codes.select(
        "id", "cell", F.posexplode("codes").alias("sub", "code")
    )
    joined = (
        code_rows.join(F.broadcast(probes) if small else probes, "cell")
        .join(F.broadcast(lut) if small else lut, ["query_id", "sub", "code"])
        .where(F.col("query_id") != F.col("id"))
        .groupBy("query_id", "id")
        .agg(F.sum("d2_micro").alias("adc_micro"))
    )
    return _rank_adc(joined, k, n_salts)


def ann_topk_ivfpq(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 8,
    nprobe: int = 4,
    cell_iters: int = 2,
    m: int = 4,
    pq_k: int = 8,
    pq_iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_salts: int = 16,
    broadcast_max_queries: int | None = 10_000,
) -> DataFrame:
    """End-to-end IVF-PQ: build the IVF cells and the PQ codebooks
    over the corpus (both under the deterministic Lloyd contract),
    store each vector as (cell, m codes), and search by probing
    nprobe cells with ADC lookups — the double cost cut a 100-TB
    embedding fleet actually deploys (candidate count ∝ nprobe/n_cells,
    candidate bytes ∝ m, floats never read at query time). Production
    materializes the (id, cell, codes) frame once and calls
    :func:`pq_probe_cells` per batch."""
    from .ivf import build_ivf

    assignments, centroids = build_ivf(
        corpus, vec_col, id_col, n_cells=n_cells, iters=cell_iters
    )
    books = pq_train(
        corpus, m=m, k=pq_k, iters=pq_iters, vec_col=vec_col, id_col=id_col
    )
    codes = pq_encode(corpus, books, m=m, vec_col=vec_col, id_col=id_col).join(
        assignments, "id"
    )
    return pq_probe_cells(
        codes, centroids, queries, books,
        k=k, nprobe=nprobe, m=m, vec_col=vec_col, id_col=id_col,
        n_salts=n_salts, broadcast_max_queries=broadcast_max_queries,
    )


def _residuals(
    df: DataFrame,
    assignments: DataFrame,
    centroids_df: DataFrame,
    vec_col: str,
    id_col: str,
) -> DataFrame:
    """(id, cell, rv): each vector minus its cell's 9-digit-rounded
    centroid — the FAISS-default encoding target (residuals are
    smaller and better centered than raw vectors, so the same m·k
    codebook budget quantizes them more finely). One broadcast
    centroid join + a codegen zip_with; exact IEEE subtraction, so
    residuals reproduce bit-for-bit in the SQL oracle."""
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        .join(assignments, "id")
        .join(F.broadcast(centroids_df.select("cell", "ccv")), "cell")
        .select(
            "id", "cell", F.zip_with("v", "ccv", lambda a, b: a - b).alias("rv")
        )
    )


def pq_probe_cells_residual(
    codes: DataFrame,
    centroids_df: DataFrame,
    queries: DataFrame,
    codebooks: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    m: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_salts: int = 16,
    broadcast_max_queries: int | None = 10_000,
) -> DataFrame:
    """Residual-variant IVF-PQ search: codebooks were trained on
    (vector − cell centroid) residuals, so the query side computes a
    PER-PROBED-CELL residual and the LUT is keyed (query, cell, sub,
    code) — |Q|·nprobe·m·k rows, still metadata when the batch passes
    the broadcast guard. Candidates join the LUT on (cell, sub, code):
    only ids in probed cells match, so no separate probe join rides
    the plan. Output (query_id, id, adc_micro, rank)."""
    from .similarity import _probe_is_small

    if "cell" not in codes.columns:
        raise ValueError("codes must carry a 'cell' column (join the IVF assignment)")
    dim = _dim_of(queries, vec_col)
    if dim % m != 0:
        raise ValueError(f"vector dim {dim} not divisible by m={m}")
    s = dim // m
    small = _probe_is_small(queries, broadcast_max_queries)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
        dot_expr(vec_col, vec_col).alias("qn2"),
    )
    centroids = centroids_df.select("cell", "ccv", "ccn2")
    cd2 = F.col("qn2") - 2 * dot_expr("qv", "ccv") + F.col("ccn2")
    wq = Window.partitionBy("query_id").orderBy("cd2", "cell")
    probes = (
        q.crossJoin(F.broadcast(centroids))
        .select("query_id", "qv", "cell", "ccv", cd2.alias("cd2"))
        .withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= nprobe)
        .select(
            "query_id",
            "cell",
            F.zip_with("qv", "ccv", lambda a, b: a - b).alias("rqv"),
        )
    )
    entries = F.array(
        *[
            F.struct(
                F.lit(j).alias("sub"),
                F.slice(F.col("rqv"), j * s + 1, s).alias("sv"),
            )
            for j in range(m)
        ]
    )
    qsubs = (
        probes.select("query_id", "cell", F.explode(entries).alias("e"))
        .select("query_id", "cell", "e.sub", "e.sv")
        .withColumn("sv_n2", dot_expr("sv", "sv"))
    )
    d2 = F.col("sv_n2") - 2 * dot_expr("sv", "cv") + F.col("cn2")
    lut = qsubs.join(F.broadcast(codebooks), "sub").select(
        "query_id",
        "cell",
        "sub",
        "code",
        F.round(d2 * 1_000_000).cast("long").alias("d2_micro"),
    )
    code_rows = codes.select("id", "cell", F.posexplode("codes").alias("sub", "code"))
    joined = (
        code_rows.join(F.broadcast(lut) if small else lut, ["cell", "sub", "code"])
        .where(F.col("query_id") != F.col("id"))
        .groupBy("query_id", "id")
        .agg(F.sum("d2_micro").alias("adc_micro"))
    )
    return _rank_adc(joined, k, n_salts)


def ann_topk_ivfpq_residual(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 8,
    nprobe: int = 4,
    cell_iters: int = 2,
    m: int = 4,
    pq_k: int = 8,
    pq_iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_salts: int = 16,
    broadcast_max_queries: int | None = 10_000,
) -> DataFrame:
    """End-to-end residual IVF-PQ (the FAISS ``by_residual`` default):
    PQ codebooks train on (vector − cell centroid) residuals, so the
    code budget spends itself on within-cell structure instead of
    re-encoding the coarse cell position — finer quantization at the
    same m·k. The query side pays one extra subtraction per probed
    cell. Everything stays on the deterministic Lloyd contract, so the
    full composition is value-oracled (``ann_ivfpq_residual``)."""
    from .ivf import build_ivf

    assignments, centroids = build_ivf(
        corpus, vec_col, id_col, n_cells=n_cells, iters=cell_iters
    )
    res = _residuals(corpus, assignments, centroids, vec_col, id_col)
    books = pq_train(res, m=m, k=pq_k, iters=pq_iters, vec_col="rv", id_col="id")
    codes = pq_encode(res, books, m=m, vec_col="rv", id_col="id").join(
        res.select("id", "cell"), "id"
    )
    return pq_probe_cells_residual(
        codes, centroids, queries, books,
        k=k, nprobe=nprobe, m=m, vec_col=vec_col, id_col=id_col,
        n_salts=n_salts, broadcast_max_queries=broadcast_max_queries,
    )


def save_ivfpq(
    codes: DataFrame, centroids: DataFrame, codebooks: DataFrame, path: str
) -> None:
    """Persist an IVF-PQ index: codes (corpus-sized — (id, cell,
    codes), the only table that scales with the corpus), centroids
    (n_cells rows), codebooks (m·k rows)."""
    import os

    codes.write.mode("overwrite").parquet(os.path.join(path, "codes"))
    centroids.write.mode("overwrite").parquet(os.path.join(path, "centroids"))
    codebooks.write.mode("overwrite").parquet(os.path.join(path, "codebooks"))


def load_ivfpq(spark, path: str) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Read back a :func:`save_ivfpq` index as (codes, centroids,
    codebooks). The codes table keeps its own embedded schema (any id
    type survives the round trip)."""
    import os

    return (
        spark.read.parquet(os.path.join(path, "codes")),
        spark.read.schema("cell int, ccv array<double>, ccn2 double").parquet(
            os.path.join(path, "centroids")
        ),
        spark.read.schema("sub int, code int, cv array<double>, cn2 double").parquet(
            os.path.join(path, "codebooks")
        ),
    )


def pq_topk_rerank(
    corpus: DataFrame,
    codes: DataFrame,
    queries: DataFrame,
    codebooks: DataFrame,
    k: int = 5,
    shortlist: int = 50,
    m: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_salts: int = 16,
    broadcast_max_queries: int | None = 10_000,
) -> DataFrame:
    """Two-stage production search: ADC retrieves a ``shortlist`` of
    candidates from the CODES alone, then only those ≤ |Q|·shortlist
    survivors pay an exact cosine against their raw vectors. Output
    matches :func:`~swarm_spark.ops.similarity.ann_topk_bruteforce`'s
    schema and tie-break — (query_id, id, cos, rank) — so the recall
    gate is a set comparison. Scale shape: the shortlist and query
    frames broadcast against the corpus scan only when the batch
    passes the bounded ``broadcast_max_queries`` probe (an oversized
    batch falls back to equi-joins AQE sizes); the rerank window is
    bounded by the ``shortlist`` literal."""
    from .similarity import _probe_is_small

    small = _probe_is_small(queries, broadcast_max_queries)
    short = pq_topk(
        codes, queries, codebooks, k=shortlist, m=m,
        vec_col=vec_col, id_col=id_col, n_salts=n_salts,
        broadcast_max_queries=broadcast_max_queries,
    ).select("query_id", "id")
    c = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("cv"),
        dot_expr(vec_col, vec_col).alias("cn2"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        dot_expr(vec_col, vec_col).alias("qn2"),
    )
    rer = (
        c.join(F.broadcast(short) if small else short, "id")
        .join(F.broadcast(q) if small else q, "query_id")
        .select(
            "query_id",
            "id",
            F.round(
                dot_expr("qv", "cv") / F.sqrt(F.col("qn2") * F.col("cn2")), 9
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("id"))
    return (
        rer.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "id", "cos", "rank")
        .orderBy("query_id", "rank")
    )
