"""Learned IVF (inverted-file) index for ANN search.

Lloyd's k-means over the embedding column, expressed with DataFrame
ops: assignment is a broadcast cross-join against the (tiny) centroid
set; centroid update is a posexplode + per-(cell,dim) mean. Centroids
round-trip through the driver each iteration — they are k×dim floats
(metadata-sized), which is the standard Spark k-means shape; the data
never leaves executors.

Determinism: centroids initialize from the k lowest-id vectors, ties
in assignment break by cell id, and every centroid mean is rounded to
a fixed 9 decimal digits (at the driver for the Lloyd updates, in the
plan for the probe centroids). The rounding absorbs float-sum-order
noise in the distributed avg, so the cell layout is bit-reproducible
and the whole query is oracle-hashable against an unrolled k-means in
DuckDB SQL (see ops_queries.SQL_ANN_IVF).

Search: queries probe their ``nprobe`` nearest cells — corpus scan
cost drops to ~nprobe/k of brute force while the per-cell equi-join
keeps the shuffle bounded. Brute force (similarity.ann_topk_bruteforce)
remains the recall oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import dot_expr


def _dist2(v: str, c: str):
    # squared L2 via dot products: |v|² - 2v·c + |c|² (norms precomputed)
    return F.col(f"{v}_n2") - 2 * dot_expr(v, c) + F.col(f"{c}_n2")


def kmeans_cells(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 4,
) -> DataFrame:
    """(id, cell) assignment from ``iters`` Lloyd rounds."""
    spark = df.sparkSession
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        dot_expr(vec_col, vec_col).alias("v_n2"),
    ).persist()
    try:
        centroids = [
            (i, r["v"])
            for i, r in enumerate(base.orderBy("id").limit(k).collect())
        ]
        for _ in range(iters):
            assigned = _assign(spark, base, centroids)
            dim = len(centroids[0][1])
            means = (
                assigned.join(base, "id")
                .select("cell", F.posexplode("v").alias("pos", "x"))
                .groupBy("cell", "pos")
                .agg(F.avg("x").alias("m"))
                .collect()
            )
            by_cell: dict[int, list[float]] = {}
            for r in means:
                # fixed-digit rounding makes the next assignment
                # independent of float-sum order in the distributed avg
                by_cell.setdefault(r["cell"], [0.0] * dim)[r["pos"]] = round(
                    r["m"], 9
                )
            centroids = [
                (c, by_cell.get(c, list(v)))  # empty cell keeps old centroid
                for c, v in centroids
            ]
        return _assign(spark, base, centroids)
    finally:
        base.unpersist()


def _assign(spark, base: DataFrame, centroids) -> DataFrame:
    cdf = spark.createDataFrame(
        [(c, v, sum(x * x for x in v)) for c, v in centroids],
        "cell int, c array<double>, c_n2 double",
    )
    w = Window.partitionBy("id").orderBy("d2", "cell")
    return (
        base.crossJoin(F.broadcast(cdf))
        .select("id", "cell", _dist2("v", "c").alias("d2"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("id", "cell")
    )


def cell_centroids(c: DataFrame) -> DataFrame:
    """(cell, ccv, ccn2): 9-digit-rounded per-cell means of the
    assigned vectors (``cv`` double arrays in ``c``) — the determinism
    contract shared with the DuckDB oracle; bit-reproducible across
    partitionings because every mean is rounded before reuse."""
    return (
        c.select(
            "cell", F.posexplode(F.col("cv").cast("array<double>")).alias("pos", "x")
        )
        .groupBy("cell", "pos")
        .agg(F.round(F.avg("x"), 9).alias("m"))
        .groupBy("cell")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select("cell", F.transform("pm", lambda s: s["m"]).alias("ccv"))
        .select("cell", "ccv", dot_expr("ccv", "ccv").alias("ccn2"))
    )


def ivf_cells_report(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int = 8,
    iters: int = 3,
) -> DataFrame:
    """IVF index-quality report: per final cell, member count and
    integral micro-unit inertia (Σ round(d²·1e6) to the cell's own
    centroid). Cell-size skew decides probe cost; inertia decides
    recall — the two numbers an ANN operator watches after building.

    Integral inertia keeps the sum order-independent (a raw double sum
    would hash differently per partitioning); every d² is the same
    IEEE double on both engines, so the oracle matches exactly.
    """
    cells = kmeans_cells(corpus, vec_col, id_col, k=n_cells, iters=iters)
    c = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
        dot_expr(vec_col, vec_col).alias("cn2"),
    ).join(cells, "id")
    cent = cell_centroids(c)
    d2 = F.col("cn2") - 2 * dot_expr("cv", "ccv") + F.col("ccn2")
    return (
        c.join(cent, "cell")
        .select("cell", F.round(d2 * 1_000_000).cast("long").alias("im"))
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.sum("im").cast("long").alias("inertia_micro"),
        )
        .orderBy("cell")
    )


def build_ivf(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int = 8,
    iters: int = 4,
) -> tuple[DataFrame, DataFrame]:
    """Build the IVF index: (assignments (id, cell), centroids (cell,
    ccv, ccn2)). Persist both with :func:`save_ivf` and probe many
    query batches without re-running Lloyd — the build-once/probe-many
    workflow an ANN service runs (the k-means driver round-trips
    happen once per index, not once per query batch)."""
    cells = kmeans_cells(corpus, vec_col, id_col, k=n_cells, iters=iters)
    c = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("cv"),
        dot_expr(vec_col, vec_col).alias("cn2"),
    ).join(cells, "id")
    return cells, cell_centroids(c)


def save_ivf(assignments: DataFrame, centroids: DataFrame, path: str) -> None:
    """Persist an IVF index as two parquet tables (assignments are
    corpus-sized; centroids are k rows)."""
    import os

    assignments.write.mode("overwrite").parquet(os.path.join(path, "assignments"))
    centroids.write.mode("overwrite").parquet(os.path.join(path, "centroids"))


def load_ivf(spark, path: str) -> tuple[DataFrame, DataFrame]:
    """Read back a :func:`save_ivf` index. The assignments table keeps
    its own embedded parquet schema — ``build_ivf`` accepts any id type
    (the CLI exposes ``--id-col``), so forcing ``id long`` here would
    corrupt or reject an index built over string ids."""
    import os

    return (
        spark.read.parquet(os.path.join(path, "assignments")),
        spark.read.schema(
            "cell int, ccv array<double>, ccn2 double"
        ).parquet(os.path.join(path, "centroids")),
    )


def assign_to_centroids(
    wave: DataFrame,
    centroids_df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, cell): nearest-centroid assignment of NEW vectors against a
    built index's centroids — incremental IVF maintenance. An ingest
    wave joins the index by appending these rows to the assignments
    table, with NO Lloyd re-run and no driver round-trips; rebuild only
    when :func:`ivf_drift_report` shows the cell loads skewing.

    Same argmin-d2/tie-by-cell arithmetic as the in-build ``_assign``
    (the 9-digit-rounded centroid contract keeps it oracle-exact);
    centroids are k rows, so the cross-join broadcasts and the whole
    assignment is one wave-sized codegen pass.
    """
    base = wave.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        dot_expr(vec_col, vec_col).alias("v_n2"),
    )
    cdf = centroids_df.select(
        "cell", F.col("ccv").alias("c"), F.col("ccn2").alias("c_n2")
    )
    w = Window.partitionBy("id").orderBy("d2", "cell")
    return (
        base.crossJoin(F.broadcast(cdf))
        .select("id", "cell", _dist2("v", "c").alias("d2"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("id", "cell")
    )


def ivf_drift_report(
    assignments: DataFrame, wave_assignments: DataFrame
) -> DataFrame:
    """(cell, n_base, n_wave, wave_share_micro): per-cell index load
    before vs after a wave — the rebuild trigger for incremental IVF
    maintenance (a wave that piles into few cells degrades probe cost
    and recall; rebuild when shares skew). Two metadata-sized count
    aggregations and a cells-sized outer join; share in integer
    micro-units so the report is engine-exact."""
    nb = assignments.groupBy("cell").agg(
        F.count(F.lit(1)).cast("long").alias("n_base")
    )
    nw = wave_assignments.groupBy("cell").agg(
        F.count(F.lit(1)).cast("long").alias("n_wave")
    )
    return (
        nb.join(nw, "cell", "full")
        .na.fill(0, ["n_base", "n_wave"])
        .select(
            "cell",
            "n_base",
            "n_wave",
            F.round(
                F.col("n_wave") * 1_000_000 / (F.col("n_base") + F.col("n_wave"))
            )
            .cast("long")
            .alias("wave_share_micro"),
        )
        .orderBy("cell")
    )


def ann_topk_ivf_probe(
    corpus: DataFrame,
    queries: DataFrame,
    assignments: DataFrame,
    centroids_df: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    nprobe: int = 2,
    n_salts: int | None = None,
    broadcast_max_queries: int | None = 10_000,
    approx_rows: int | None = None,
) -> DataFrame:
    """Probe a (pre)built IVF index: queries rank cells by centroid
    distance, scan their nprobe nearest, and the salted two-phase
    top-k finishes — no Lloyd iterations, no centroid round-trips.
    Same output contract as :func:`ann_topk_ivf`.

    The probes frame (queries × nprobe rows, each carrying the full
    query vector) is broadcast to the corpus-cell join only when the
    query batch is small: a bounded ``limit(n+1).count()`` probe checks
    it against ``broadcast_max_queries`` (default 10k ≈ 10 MB at
    dim=64 × nprobe=2). Larger batches — the production 10M-query shape
    that would blow the broadcast limit / driver heap — fall back to a
    plain ``cell`` equi-join and let AQE pick the physical strategy.
    Pass ``broadcast_max_queries=None`` to force the shuffle join, or a
    huge value to force the broadcast when the batch size is known."""
    from .similarity import _probe_is_small, _salts_for, topk_per_query

    n_salts = _salts_for(corpus, n_salts, approx_rows)
    c = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("cv"),
        dot_expr(vec_col, vec_col).alias("cn2"),
    ).join(assignments, "id")
    centroids = centroids_df.select(
        "cell", F.col("ccv").alias("cv"), F.col("ccn2").alias("c_n2")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
        dot_expr(vec_col, vec_col).alias("qn2"),
    )
    wq = Window.partitionBy("query_id").orderBy("cd2", "cell")
    probes = (
        q.crossJoin(F.broadcast(centroids))
        .select(
            "query_id",
            "qv",
            "qn2",
            "cell",
            (F.col("qn2") - 2 * dot_expr("qv", "cv") + F.col("c_n2")).alias("cd2"),
        )
        .withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= nprobe)
        .select("query_id", "qv", "qn2", "cell")
    )
    small_batch = _probe_is_small(queries, broadcast_max_queries)
    joined = (
        c.join(F.broadcast(probes) if small_batch else probes, "cell")
        .where(F.col("query_id") != F.col("id"))
        .select(
            "query_id",
            "id",
            F.round(dot_expr("qv", "cv") / F.sqrt(F.col("qn2") * F.col("cn2")), 9).alias("cos"),
        )
    )
    return topk_per_query(joined, k, n_salts)


def ann_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int = 8,
    nprobe: int = 2,
    iters: int = 4,
    n_salts: int | None = None,
    broadcast_max_queries: int | None = 10_000,
    approx_rows: int | None = None,
) -> DataFrame:
    """IVF ANN: build cells over the corpus, probe nprobe cells/query —
    :func:`build_ivf` + :func:`ann_topk_ivf_probe` in one call.

    Returns (query_id, id, cos, rank) like the brute-force baseline —
    swap-compatible, with recall traded for a ~nprobe/n_cells scan.
    Final ranking is the salted two-phase top-k (similarity.
    topk_per_query): even a pathologically large probed cell never
    lands one query's candidates on a single window task.
    """
    assignments, centroids = build_ivf(corpus, vec_col, id_col, n_cells, iters)
    return ann_topk_ivf_probe(
        corpus,
        queries,
        assignments,
        centroids,
        k=k,
        vec_col=vec_col,
        id_col=id_col,
        nprobe=nprobe,
        n_salts=n_salts,
        broadcast_max_queries=broadcast_max_queries,
        approx_rows=approx_rows,
    )
