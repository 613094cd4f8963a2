"""Count-min frequency sketch — the FREQUENCY member of the repo's
mergeable stored-statistic family (cardinality bitmap
:func:`~swarm_spark.ops.dedup.linear_count_bitmap`, quantile histogram
:func:`~swarm_spark.ops.text.value_histogram_counts`, BM25 postings
:func:`~swarm_spark.ops.retrieval.bm25_postings`).

Public algorithm: Cormode & Muthukrishnan 2005, "An Improved Data
Stream Summary: The Count-Min Sketch and its Applications". A
depth × width grid of counters; each key increments one counter per
row (row d's column is an independent hash of the key); a key's
frequency estimate is the MIN over its depth counters. Guarantees:

    estimate >= true count            (always — collisions only ADD)
    estimate <= true + e*TOTAL        with prob 1 - (1/2)^depth-ish
                                      at width ~ 2/e

The sketch answers "how often did X occur?" over a corpus too large to
keep exact per-key counts for — heavy-hitter mining, per-domain /
per-token frequency caps, join-skew detection — in depth·width
counters regardless of key cardinality.

Determinism/mergeability contract (the family's):
- counters are md5-derived integer arithmetic — the sketch AND every
  estimate reproduce exactly in DuckDB (unlike engine-private sketch
  bytes, this is value-oracle-checkable);
- cells are a SUM monoid: :func:`cms_merge` of two waves' sketches
  equals the full-recompute sketch exactly, so append-only ledgers
  (write each micro-batch's sketch, sum at read) are crash-safe with
  no read-modify-write — pinned by the ``streaming_cms_e2e`` query.

Scale shape (the 100-TB story): building is ONE codegen projection
(depth hashes per row, a literal) + ONE map-side-combined shuffle of
<= depth·width rows — the corpus is never shuffled by key and the
driver never sees a corpus-sized result. Lookups broadcast the SKETCH
(literal-bounded: depth·width cells) into the probe batch, so a
billion-key probe frame stays a distributed map-side join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sampling import hash_bucket


def _check_grid(width: int, depth: int) -> None:
    if width < 1 or depth < 1:
        raise ValueError(f"need width >= 1 and depth >= 1; got {width}, {depth}")


def _probe_structs(key: Column, width: int, depth: int, seed: str) -> Column:
    """array<struct<row,col>>: the key's one cell per sketch row —
    row d hashes with an independent seed (md5 keyed ``seed-d``)."""
    return F.array(
        *[
            F.struct(
                F.lit(d).cast("int").alias("row"),
                (hash_bucket(key, f"{seed}-{d}") % width).cast("int").alias("col"),
            )
            for d in range(depth)
        ]
    )


def cms_sketch(
    df: DataFrame,
    key_col: str,
    width: int = 1024,
    depth: int = 4,
    seed: str = "swarm-cms",
) -> DataFrame:
    """(row, col, cnt): the count-min sketch of ``key_col``'s
    occurrences (a MULTISET count — pre-aggregate or `.distinct()`
    upstream to sketch distinct keys instead). <= depth·width rows,
    the materializable stored statistic; cells are additive, so waves
    fold in via :func:`cms_merge` without rescanning history."""
    _check_grid(width, depth)
    return (
        df.select(
            F.explode(_probe_structs(F.col(key_col), width, depth, seed)).alias("rc")
        )
        .select(F.col("rc.row").alias("row"), F.col("rc.col").alias("col"))
        .groupBy("row", "col")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cms_merge(stored: DataFrame, delta: DataFrame) -> DataFrame:
    """Fold a wave's sketch into a stored sketch — union + per-cell sum
    over <= 2·depth·width rows (metadata-sized). Merge == recompute
    exactly (the sum monoid), the same incremental contract as
    :func:`~swarm_spark.ops.dedup.merge_count_bitmaps`."""
    return (
        stored.select("row", "col", "cnt")
        .unionByName(delta.select("row", "col", "cnt"))
        .groupBy("row", "col")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_lookup(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    width: int = 1024,
    depth: int = 4,
    seed: str = "swarm-cms",
) -> DataFrame:
    """(key_col, est): each key's count-min estimate — min over its
    depth counters, 0 for never-seen keys (an absent cell IS a zero
    counter). ``width``/``depth``/``seed`` must match the build.

    The SKETCH broadcasts (literal-bounded <= depth·width cells); the
    probe frame stays distributed, so estimating every key of a
    corpus-sized frame is one map-side join + one groupBy over
    depth·|keys| rows."""
    _check_grid(width, depth)
    probes = keys.select(
        F.col(key_col),
        F.explode(_probe_structs(F.col(key_col), width, depth, seed)).alias("rc"),
    ).select(key_col, F.col("rc.row").alias("row"), F.col("rc.col").alias("col"))
    return (
        probes.join(F.broadcast(sketch.select("row", "col", "cnt")), ["row", "col"], "left")
        .select(key_col, F.coalesce(F.col("cnt"), F.lit(0)).alias("__c"))
        .groupBy(key_col)
        .agg(F.min("__c").cast("long").alias("est"))
    )


def cms_heavy_hitters(
    df: DataFrame,
    key_col: str,
    threshold: int,
    width: int = 1024,
    depth: int = 4,
    seed: str = "swarm-cms",
) -> DataFrame:
    """(key_col, est): the distinct keys whose count-min estimate is
    >= ``threshold``. One-sided by construction: every key with TRUE
    count >= threshold survives (estimates never undercount); some
    below-threshold keys may ride along on collisions — size ``width``
    ~ 2·TOTAL/threshold to bound them. Build + probe in one call: the
    corpus is scanned twice (once to sketch, once for the distinct
    probe keys), never shuffled by key beyond the distinct."""
    if threshold < 1:
        raise ValueError(f"threshold must be >= 1, got {threshold}")
    sk = cms_sketch(df, key_col, width, depth, seed)
    est = cms_lookup(sk, df.select(key_col).distinct(), key_col, width, depth, seed)
    return est.where(F.col("est") >= threshold)
