"""Timestamp build (T3) and time-partition derivation (Q5).

Reference: rule ``timestamp`` is a float64 of unix seconds converted to
a timestamp preserving the fractional part
(/root/reference/pkg/usecase/load.go:233-241); destination partitioning
maps ``hour|day|month|year`` onto time-partitioning of the ``timestamp``
column (pkg/usecase/utils.go:170-194), rejecting other units.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..model import ModelError, TimeUnit

# Partition value formats: lexicographically sortable, hive-friendly.
_PARTITION_FMT = {
    TimeUnit.HOUR.value: "yyyy-MM-dd-HH",
    TimeUnit.DAY.value: "yyyy-MM-dd",
    TimeUnit.MONTH.value: "yyyy-MM",
    TimeUnit.YEAR.value: "yyyy",
}

PARTITION_COL = "__swarm_part"


def timestamp_from_unix(col: Column | str) -> Column:
    """Float unix-seconds → TimestampType, fractional seconds kept.

    ``timestamp_seconds`` accepts fractional doubles and keeps
    microsecond precision — the JVM-side equivalent of the reference's
    ``math.Mod(ts,1)*1e9`` nanosecond build.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_seconds(c)


def partition_value(ts_col: Column | str, unit: str) -> Column:
    """Derive the partition string for a time unit; error on bad unit."""
    if unit not in _PARTITION_FMT:
        raise ModelError(f"unsupported time unit: {unit!r}")
    c = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    return F.date_format(c, _PARTITION_FMT[unit])


def validate_partition_unit(unit: str) -> str:
    if unit == TimeUnit.NONE.value:
        return unit
    if unit not in _PARTITION_FMT:
        raise ModelError(f"unsupported time unit: {unit!r}")
    return unit
