"""Multi-dimensional data layout: Z-order (Morton) clustering.

A 100-TB table is pruned, not scanned: engines skip files whose
min/max column ranges exclude the predicate (parquet row-group stats,
Delta/Iceberg file stats). Range-partitioning by ONE column makes that
column's file ranges tight and every other column's ranges full-width;
a query filtering the second column reads everything. Interleaving the
bits of two (or more) bucketized columns into a single sort key — the
Z-order / Morton curve (public technique: G.M. Morton 1966; used by
Delta Lake ``OPTIMIZE ZORDER BY``, Apache Hudi and Iceberg clustering)
— makes a contiguous key range an axis-aligned TILE of the value
space, so file-level min/max stay tight on BOTH columns and either
predicate prunes.

The operators here are pure integer bit arithmetic (codegen'd
shift/and/or — no UDF), so the keys, buckets, and the per-bucket
min/max spans that prove the locality claim all reproduce exactly in
SQL and are value-oracled (the ``layout_zorder`` registry query).

Scale shape: computing the key is a projection; laying data out is ONE
``repartitionByRange`` on the key (a range shuffle — the same cost as
any sort-based write) and the benefit is paid back on every subsequent
scan. Nothing here collects to the driver.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _check_bits(bits: int) -> None:
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")


def zorder_key2(x: Column | str, y: Column | str, bits: int = 16) -> Column:
    """The Morton interleave of two ``bits``-bit non-negative integer
    columns: bit i of x lands at position 2i, bit i of y at 2i+1, so
    the 2·``bits``-bit key enumerates the value grid along the Z curve
    and any aligned key range is an axis-aligned tile. Inputs must
    already be bucketized into [0, 2^bits) — callers own the bucketing
    (width buckets, hash buckets, quantile ids); values outside the
    domain raise downstream of a cheap codegen'd guard column.

    Pure shift/and/or arithmetic — whole-stage codegen, no UDF, and an
    exact SQL mirror for the value oracle."""
    _check_bits(bits)
    xc = F.col(x) if isinstance(x, str) else x
    yc = F.col(y) if isinstance(y, str) else y
    lim = 1 << bits
    # NULL must be listed explicitly: (NULL < 0) evaluates to NULL, the
    # WHEN falls through to otherwise(0), and the key would silently be
    # NULL instead of raising per the domain contract
    guard = F.when(
        xc.isNull() | yc.isNull() | (xc < 0) | (xc >= lim) | (yc < 0) | (yc >= lim),
        F.raise_error(
            F.format_string(
                f"zorder_key2: value out of [0, {lim}) domain: x=%s y=%s",
                F.coalesce(xc.cast("string"), F.lit("NULL")),
                F.coalesce(yc.cast("string"), F.lit("NULL")),
            )
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    xb = xc.cast("long")
    yb = yc.cast("long")
    terms = [
        F.shiftleft(F.shiftright(xb, i).bitwiseAND(F.lit(1)), 2 * i)
        for i in range(bits)
    ] + [
        F.shiftleft(F.shiftright(yb, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        for i in range(bits)
    ]
    # guard on the LEFT of the add: binary-op codegen skips the right
    # operand when the left is NULL, so terms + guard would never
    # evaluate (hence never raise) the guard on NULL inputs
    return (guard + reduce(lambda a, b: a.bitwiseOR(b), terms)).cast("long")


def zorder_key(
    cols: list[Column | str], bits: int = 16
) -> Column:
    """The k-column Morton interleave (Delta's ``OPTIMIZE ZORDER BY``
    shape): bit i of column j lands at position k·i + j, so the
    k·``bits``-bit key's aligned ranges are axis-aligned k-D tiles.
    Same contract as :func:`zorder_key2` (which it generalizes —
    identical keys for k = 2): inputs bucketized into [0, 2^bits),
    guarded; pure shift/and/or arithmetic, whole-stage codegen.
    k·bits must fit a long (<= 62)."""
    _check_bits(bits)
    k = len(cols)
    if k < 2:
        raise ValueError(f"need >= 2 columns, got {k}")
    if k * bits > 62:
        raise ValueError(f"k*bits must be <= 62, got {k * bits}")
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    lim = 1 << bits
    guard = F.lit(0).cast("long")
    for c in cs:
        guard = (
            F.when(
                c.isNull() | (c < 0) | (c >= lim),
                F.raise_error(
                    F.format_string(
                        f"zorder_key: value out of [0, {lim}) domain: %s",
                        F.coalesce(c.cast("string"), F.lit("NULL")),
                    )
                ).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
            + guard
        )
    terms = [
        F.shiftleft(F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1)), k * i + j)
        for j, c in enumerate(cs)
        for i in range(bits)
    ]
    # guard first — see zorder_key2: NULL terms would short-circuit the
    # add before a right-hand guard is evaluated
    return (guard + reduce(lambda a, b: a.bitwiseOR(b), terms)).cast("long")


def zorder_repartition(
    df: DataFrame,
    x: str,
    y: str,
    bits: int = 16,
    n_files: int = 200,
    key_name: str = "zkey",
) -> DataFrame:
    """Range-partition ``df`` by the Morton key of (x, y) — the write-
    side layout step. Each output partition (→ file) covers a compact
    key range, i.e. a union of few aligned tiles, so file min/max stats
    stay tight on BOTH columns and either-column predicates prune.
    ``repartitionByRange`` samples the key for balanced boundaries
    (AQE-compatible); the key column is kept for the writer to emit
    file-level stats over."""
    if n_files < 1:
        raise ValueError(f"n_files must be >= 1, got {n_files}")
    keyed = df.withColumn(key_name, zorder_key2(x, y, bits))
    return keyed.repartitionByRange(n_files, F.col(key_name))


def zorder_bucket_stats(
    df: DataFrame, x: str, y: str, bits: int, bucket_bits: int
) -> DataFrame:
    """Per-Z-bucket locality report: cut the key space into
    4^``bucket_bits`` aligned buckets (the top 2·``bucket_bits`` key
    bits — each bucket is EXACTLY one 2^(bits-bucket_bits)-wide square
    tile) and report each bucket's row count and x/y min/max/span.
    The structural claim a test or oracle can pin: every span is
    < 2^(bits-bucket_bits), regardless of data distribution — the
    bound a single-column sort cannot give the second column."""
    _check_bits(bits)
    if not 1 <= bucket_bits <= bits:
        raise ValueError(f"bucket_bits must be in [1, {bits}], got {bucket_bits}")
    zkey = zorder_key2(x, y, bits)
    zbucket = F.shiftright(zkey, 2 * (bits - bucket_bits)).cast("long")
    return (
        df.select(
            zbucket.alias("zbucket"),
            F.col(x).cast("long").alias("__x"),
            F.col(y).cast("long").alias("__y"),
        )
        .groupBy("zbucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("__x").alias("x_min"),
            F.max("__x").alias("x_max"),
            F.min("__y").alias("y_min"),
            F.max("__y").alias("y_max"),
        )
        .select(
            "zbucket",
            "n",
            "x_min",
            "x_max",
            "y_min",
            "y_max",
            (F.col("x_max") - F.col("x_min")).alias("x_span"),
            (F.col("y_max") - F.col("y_min")).alias("y_span"),
        )
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    n_buckets: int,
    key: str = "doc_id",
    sort: bool = True,
) -> None:
    """Persist ``df`` as a hash-BUCKETED parquet table: rows land in
    ``n_buckets`` files per write-task group by murmur3(key), and the
    catalog records the bucket spec (public Spark bucketing — SPARK-
    12394; the Hive-bucketing idea applied to datasource tables).

    Why at 100 TB: every by-id join the pipeline repeats — gate
    application semi-joins, dedup keep-one, decontamination,
    incremental wave folds — shuffles BOTH sides on the id each time.
    Two tables bucketed the same way already satisfy the join's
    distribution requirement, so the exchange disappears from the
    plan (pinned in ``tests/test_layout.py``): the join runs scan →
    sort → merge with ZERO network movement, every run, forever. The
    one-time cost is the bucketed write's own shuffle — the same
    price as any partitioned write — amortized across every
    subsequent join. ``sort=True`` additionally records the sort
    order; with one file per bucket Spark elides the sort too.
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    # one shuffle by the bucket hash so each bucket is ONE file: the
    # sorted-bucket metadata then lets the join skip its sort as well
    w = (
        df.repartition(n_buckets, F.col(key))
        .write.format("parquet")
        .mode("overwrite")
        .bucketBy(n_buckets, key)
    )
    if sort:
        w = w.sortBy(key)
    w.option("path", path).saveAsTable(table)


def bucketed_join(
    spark,  # SparkSession
    left_table: str,
    right_table: str,
    key: str = "doc_id",
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key with
    the shuffle-free plan shape: sort-merge (hinted, so a small side
    is never broadcast back into an exchange-bearing plan when the
    POINT is exchange elimination), bucket distribution satisfied on
    both sides."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.hint("merge").join(rt.hint("merge"), key, how)
