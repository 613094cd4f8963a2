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
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import dot_expr


def _topk(joined: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("id"))
    return (
        joined.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "id", "cos", "rank")
        .orderBy("query_id", "rank")
    )


def ann_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k: (query_id, id, cos, rank); ties broken by id.

    Squared norms are precomputed per side (N + |Q| folds) so each of
    the |Q|·N candidate pairs costs one array fold; algebra matches
    the oracle's sqrt(ldp·ldp) exactly.
    """
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
    joined = c.crossJoin(F.broadcast(q)).where(F.col("query_id") != F.col("id")).select(
        "query_id",
        "id",
        F.round(dot_expr("qv", "cv") / F.sqrt(F.col("qn2") * F.col("cn2")), 9).alias("cos"),
    )
    return _topk(joined, k)


def ann_topk_cells(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cell_col: str = "label",
) -> DataFrame:
    """IVF-bucketed top-k: probe only the query's own cell."""
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
    joined = c.join(F.broadcast(q), "cell").where(F.col("query_id") != F.col("id")).select(
        "query_id",
        "id",
        F.round(dot_expr("qv", "cv") / F.sqrt(F.col("qn2") * F.col("cn2")), 9).alias("cos"),
    )
    return _topk(joined, k)
