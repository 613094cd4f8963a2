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


# ---------------------------------------------------------------- HyperLogLog
#
# Public algorithm: Flajolet, Fusy, Gandouet & Meunier 2007,
# "HyperLogLog: the analysis of a near-optimal cardinality estimation
# algorithm". m = 2^p registers; each key hashes to one register
# (first p bits) and contributes rho = 1 + leading-zero-count of the
# next 48 bits; the register keeps the MAX rho; the estimate is the
# bias-corrected harmonic mean alpha_m * m^2 / sum(2^-M[j]), with
# Flajolet's linear-counting fallback for the small range.
#
# Unlike engine-private HLL sketches (Spark's approx_count_distinct,
# DuckDB's approx_distinct), these registers are md5-derived integer
# arithmetic, so the sketch AND the estimate reproduce exactly in SQL:
# rho is pure bit-length arithmetic (`49 - length(bin(v))` — both
# engines print minimal-width binary), and the harmonic sum is kept as
# the EXACT integer sum(2^(49-rho)) (order-independent — no float
# accumulation), so the single final division is deterministic.
#
# Registers are a MAX monoid: hll_merge(waves) == full recompute
# exactly, the same append-only-ledger contract as the other stored
# statistics in this module's family.

_HLL_RHO_BITS = 48  # hex chars p/4+1 .. p/4+12 of the md5


def _hll_check_p(p: int) -> None:
    if p not in (8, 12, 16):
        raise ValueError(f"p must be 8, 12 or 16 (whole hex digits), got {p}")


def hll_registers(
    df: DataFrame, key_col: str, p: int = 12, seed: str = "swarm-hll"
) -> DataFrame:
    """(bucket, rho): the HyperLogLog register file of ``key_col``'s
    DISTINCT values — <= 2^p rows, the materializable stored statistic.
    Duplicate keys are free (max of equal rhos), so the input needn't
    be de-duplicated. Build is one codegen projection + one
    map-side-combined shuffle of <= 2^p rows; the corpus is never
    shuffled by key and the driver never sees a corpus-sized result."""
    _hll_check_p(p)
    nb = p // 4
    h = F.md5(F.concat_ws("|", F.lit(seed), F.col(key_col).cast("string")))
    bucket = F.conv(F.substring(h, 1, nb), 16, 10).cast("long")
    v = F.conv(F.substring(h, nb + 1, _HLL_RHO_BITS // 4), 16, 10).cast("long")
    rho = (
        F.when(v == 0, F.lit(_HLL_RHO_BITS + 1))
        .otherwise(F.lit(_HLL_RHO_BITS + 1) - F.length(F.bin(v)))
        .cast("int")
    )
    return (
        df.select(bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(stored: DataFrame, delta: DataFrame) -> DataFrame:
    """Fold a wave's register file into a stored one — union + per-
    bucket MAX over <= 2^(p+1) rows (metadata-sized). Merge == full
    recompute exactly (the max monoid)."""
    return (
        stored.select("bucket", "rho")
        .unionByName(delta.select("bucket", "rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(regs: DataFrame, p: int = 12) -> DataFrame:
    """One row (m_regs, nonzero_regs, sum_scaled, estimate) from a
    register file. ``sum_scaled`` is the EXACT integer
    sum_j 2^(49 - M[j]) (absent registers count 2^49 — M[j] = 0), so
    the harmonic mean needs exactly ONE float division; the small-range
    branch is Flajolet's linear-counting correction m*ln(m/V).

    The harmonic sum is accumulated as decimal(38,0): at p = 16 it
    reaches 2^65 (65536 registers x 2^49 each), past int64 — a bigint
    sum would silently wrap under non-ANSI Spark and corrupt the
    estimate. ``sum_scaled`` is emitted as bigint where it provably
    fits (p <= 12, max 2^61) and decimal(38,0) at p = 16."""
    _hll_check_p(p)
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    big_a = alpha * m * m * float(1 << (_HLL_RHO_BITS + 1))
    agg = regs.agg(
        F.count(F.lit(1)).cast("long").alias("nonzero_regs"),
        F.coalesce(
            F.sum(
                F.expr(
                    f"cast(shiftleft(cast(1 as bigint), {_HLL_RHO_BITS + 1} - rho)"
                    " as decimal(38,0))"
                )
            ),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("present_scaled"),
    )
    zero = (F.lit(m) - F.col("nonzero_regs")).cast("decimal(38,0)")
    sum_scaled = (
        F.col("present_scaled") + zero * F.lit(1 << (_HLL_RHO_BITS + 1))
    ).cast("long" if p <= 12 else "decimal(38,0)")
    raw = F.lit(big_a) / F.col("sum_scaled")
    return (
        agg.select(
            F.lit(m).cast("long").alias("m_regs"),
            "nonzero_regs",
            sum_scaled.alias("sum_scaled"),
        )
        .select(
            "m_regs",
            "nonzero_regs",
            "sum_scaled",
            F.when(
                (raw <= F.lit(2.5 * m)) & (F.col("nonzero_regs") < m),
                F.round(
                    F.lit(float(m))
                    * F.log(F.lit(float(m)) / (F.lit(m) - F.col("nonzero_regs")))
                ),
            )
            .otherwise(F.round(raw))
            .cast("long")
            .alias("estimate"),
        )
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
