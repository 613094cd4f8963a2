"""As-of join: attach to each left row the most recent right row at or
before its timestamp, per key.

Spark has no ASOF JOIN operator (DuckDB/Pandas do), and the naive
formulations are scale-killers: a range-condition join degenerates to
a broadcast-nested-loop, and a per-row max-subquery shuffles twice.
The scalable shape is the union + ordered-window forward-fill:

1. union left and right rows on the key, right rows carrying their
   payload as one struct column;
2. one window per key, ordered by (time, side) — right sorts before
   left at equal timestamps so "at or before" is inclusive — and
   ``last(payload, ignorenulls=true)`` forward-fills the latest right
   payload onto every row;
3. keep the left rows.

Cost: ONE shuffle on the key + an in-partition sort — the same plan
a sort-merge join would pay, with no quadratic candidate expansion.
Skewed keys behave like any windowed aggregation (AQE/salting apply).

Determinism: ties among right rows at the same (key, time) resolve by
a SLIM tie-break — ``tie_break`` (a right column, e.g. an id) when
given, else an 8-byte ``xxhash64`` of the payload — so the in-partition
sort never compares full payload structs (a wide right side would
otherwise pay its whole row width per comparison). Pre-aggregate the
right side to one row per (key, time) when you need engine-portable
output; with unique (key, time) right rows the tie-break never fires
and the result is identical under any choice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SIDE, _T, _PAYLOAD = "__asof_side", "__asof_t", "__asof_payload"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    tolerance: Column | None = None,
    tie_break: str | None = None,
) -> DataFrame:
    """Backward as-of left join.

    Returns the left columns plus every non-key right column (the
    matched row's), null when no right row is at or before the left
    timestamp (or outside ``tolerance``, a Column interval/duration in
    the same units as the time columns' difference). ``tie_break``
    names a right column used to order right rows tying at the same
    (key, time) — keep it slim (an id); omitted, a payload hash is
    used so the sort key stays 8 bytes regardless of payload width.
    """
    rcols = [c for c in right.columns if c not in (on, right_time)]
    overlap = set(rcols) & set(left.columns)
    if overlap:
        raise ValueError(f"right columns collide with left: {sorted(overlap)}")

    l = left.withColumn(_SIDE, F.lit(1)).withColumn(_T, F.col(left_time))
    r = right.select(
        F.col(on),
        F.lit(0).alias(_SIDE),
        F.col(right_time).alias(_T),
        F.struct(F.col(right_time).alias("__rt"), *rcols).alias(_PAYLOAD),
    )
    u = l.unionByName(r, allowMissingColumns=True)

    if tie_break is not None:
        if tie_break not in rcols:
            raise ValueError(f"tie_break {tie_break!r} is not a right column")
        tb = F.col(f"{_PAYLOAD}.{tie_break}")
    else:
        tb = F.xxhash64(_PAYLOAD)
    w = (
        Window.partitionBy(on)
        .orderBy(_T, _SIDE, tb)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.withColumn(_PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w))
    out = filled.where(F.col(_SIDE) == 1)
    if tolerance is not None:
        ok = F.col(_T) - F.col(f"{_PAYLOAD}.__rt") <= tolerance
        out = out.withColumn(_PAYLOAD, F.when(ok, F.col(_PAYLOAD)))
    return out.select(
        *left.columns,
        *[F.col(f"{_PAYLOAD}.{c}").alias(c) for c in rcols],
    )
