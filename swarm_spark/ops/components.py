"""Duplicate-cluster resolution: connected components over dup pairs.

Pair-finding (jaccard/minhash/simhash/embedding) yields edges; keeping
one doc per duplicate *cluster* needs the transitive closure. This is
min-label propagation expressed as iterated DataFrame joins:

    label(v) ← min(label(v), min label of v's neighbors)

iterated to fixpoint. Convergence takes at most the component diameter
rounds; near-dup clusters are tiny and dense, so 3-5 rounds close them
in practice and the loop exits early on a converged count. At the 100-
TB end this is the standard iterative-join CC (or hand to GraphFrames);
each round is one shuffle on the node id.

Deterministic: labels are ids, min is exact — oracle-checkable against
a recursive-CTE reachability query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dup_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iters: int = 20,
) -> DataFrame:
    """(doc_id, component) for every doc appearing in ``pairs``;
    component = the minimum doc id reachable through pair edges."""
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
        .persist()
    )
    try:
        labels = edges.select(F.col("src").alias("id")).distinct().select(
            "id", F.col("id").alias("component")
        )
        for _ in range(max_iters):
            neighbor_min = (
                labels.join(edges, labels.id == edges.src)
                .groupBy(F.col("dst").alias("id"))
                .agg(F.min("component").alias("ncomp"))
            )
            new_labels = (
                labels.join(neighbor_min, "id", "left")
                .select(
                    "id",
                    F.least(
                        F.col("component"), F.coalesce("ncomp", F.col("component"))
                    ).alias("component"),
                )
            ).persist()
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "id")
                .where(F.col("n.component") != F.col("o.component"))
                .limit(1)
                .count()
            )
            labels.unpersist() if hasattr(labels, "unpersist") else None
            labels = new_labels
            if changed == 0:
                break
        return labels.orderBy("id")
    finally:
        edges.unpersist()


def keep_one_per_cluster(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
) -> DataFrame:
    """Drop all but the lowest-id member of every duplicate cluster —
    the end-to-end dedup: docs in no pair pass through untouched."""
    comp = dup_components(pairs, a_col, b_col)
    losers = comp.where(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")
