"""Deterministic hash-based sampling and dataset splits.

``df.sample()`` is seed-dependent per partition layout — repartition
the input and the sample changes, which is unacceptable for training
corpora (the split must be a pure function of the RECORD, not of the
physical plan). These operators hash a key column instead:

    bucket(key) = first 8 hex digits of md5(seed | key)  ∈ [0, 2^32)

so membership is reproducible across runs, engines, partitionings, and
cluster sizes, and composable (a 10% sample of a 50% split is stable).
All arithmetic is integral and expressible in any SQL dialect — the
DuckDB oracles mirror it digit for digit.

Scale shape: pure codegen'd projection + filter, no shuffle, no RNG
state; sampling pushes through scans like any other filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SPACE = 1 << 32


def hash_bucket(key: Column | str, seed: str = "swarm") -> Column:
    """Deterministic uniform bucket in [0, 2^32) from md5(seed|key)."""
    c = F.col(key) if isinstance(key, str) else key
    h = F.md5(F.concat_ws("|", F.lit(seed), c.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long")


def hash_sample(
    df: DataFrame, fraction: float, key: str, seed: str = "swarm"
) -> DataFrame:
    """Keep ~``fraction`` of rows, deterministically by key hash."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.where(hash_bucket(key, seed) < int(fraction * _SPACE))


def stratified_hash_sample(
    df: DataFrame,
    strata: str,
    fractions: dict[str, float],
    key: str,
    default: float = 0.0,
    seed: str = "swarm",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample boilerplate
    docs, keep all rare-language docs)."""
    cut: Column = F.lit(int(default * _SPACE))
    for value, frac in sorted(fractions.items()):
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {value!r} must be in [0, 1]")
        cut = F.when(F.col(strata) == value, F.lit(int(frac * _SPACE))).otherwise(cut)
    return df.where(hash_bucket(key, seed) < cut)


def stratified_cap(
    df: DataFrame,
    strata: str,
    cap: int | None,
    key: str,
    seed: str = "swarm-strat",
    n_salts: int | None = None,
) -> DataFrame:
    """Keep at most ``cap`` rows per stratum — EXACT counts, chosen
    deterministically by hash order (so the kept set is a pure function
    of the records, stable under growth of OTHER strata and under any
    partitioning). ``cap=None`` balances every stratum down to the
    smallest stratum's count (domain/language rebalancing).

    Rate-based :func:`stratified_hash_sample` keeps *approximately*
    fraction·n per stratum; this keeps *exactly* min(cap, n) — the
    shape training-mix specs ("at most N docs per language") need.

    Scale shape: TWO-PHASE salted rank, not one window per stratum — a
    hot stratum (half the corpus in `en`) would otherwise land on one
    unsplittable window task. Phase 1 ranks inside (stratum, salt)
    partitions; a stratum's global hash-order top-cap rows are each in
    their salt partition's top-cap, so phase 2 re-ranks only the
    ≤ n_salts·cap survivors. Adds a ``rk`` column (1-based hash-order
    rank within the stratum).
    """
    from pyspark.sql import Window

    if cap is None:
        # metadata-sized: one row per stratum to the driver
        counts = df.groupBy(strata).count().collect()
        if not counts:
            return df.withColumn("rk", F.lit(1).cast("long")).limit(0)
        cap = min(r["count"] for r in counts)
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    if n_salts is None:
        n_salts = max(16, df.count() // 2_000_000)
    order = (hash_bucket(key, seed).asc(), F.col(key).asc())
    salt = (hash_bucket(key, seed + "-salt") % n_salts).cast("int")
    w1 = Window.partitionBy(strata, "__salt").orderBy(*order)
    survivors = (
        df.withColumn("__salt", salt)
        .withColumn("__rk", F.row_number().over(w1))
        .where(F.col("__rk") <= cap)
        .drop("__rk", "__salt")
    )
    w2 = Window.partitionBy(strata).orderBy(*order)
    return (
        survivors.withColumn("rk", F.row_number().over(w2).cast("long"))
        .where(F.col("rk") <= cap)
    )


def split_column(
    key: str,
    test_fraction: float = 0.1,
    val_fraction: float = 0.1,
    seed: str = "swarm-split",
) -> Column:
    """'train' / 'val' / 'test' label, a pure function of the key —
    records never migrate between splits as the corpus grows."""
    b = hash_bucket(key, seed)
    test_cut = int(test_fraction * _SPACE)
    val_cut = test_cut + int(val_fraction * _SPACE)
    return (
        F.when(b < test_cut, F.lit("test"))
        .when(b < val_cut, F.lit("val"))
        .otherwise(F.lit("train"))
    )
