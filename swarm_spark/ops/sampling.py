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
