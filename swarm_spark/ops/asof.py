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
    direction: str = "backward",
) -> DataFrame:
    """As-of left join (pandas ``merge_asof`` directions).

    - ``backward`` (default): most recent right row at or before the
      left timestamp;
    - ``forward``: earliest right row at or after it (the mirrored
      window, ordered descending);
    - ``nearest``: whichever of the two is closer in time, ties toward
      backward — both fills share ONE key shuffle (same window
      partitioning; only a second in-partition sort is added).

    Returns the left columns plus every non-key right column (the
    matched row's), null when no right row is on the required side (or
    outside ``tolerance``, a Column interval/duration in the same units
    as the time columns' difference — applied per direction before the
    nearest choice). ``tie_break`` names a right column used to order
    right rows tying at the same (key, time) — keep it slim (an id);
    omitted, a payload hash is used so the sort key stays 8 bytes
    regardless of payload width.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward/forward/nearest, got {direction!r}")
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

    def _fill(forward: bool) -> Column:
        # right rows sort before left at equal time on BOTH sides, so
        # "at or before"/"at or after" stay inclusive
        order = (
            (F.col(_T).desc(), F.col(_SIDE), tb) if forward else (_T, _SIDE, tb)
        )
        w = (
            Window.partitionBy(on)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        return F.last(_PAYLOAD, ignorenulls=True).over(w)

    def _gate(payload: Column, forward: bool) -> Column:
        if tolerance is None:
            return payload
        delta = (
            payload["__rt"] - F.col(_T) if forward else F.col(_T) - payload["__rt"]
        )
        return F.when(delta <= tolerance, payload)

    if direction == "nearest":
        filled = u.withColumn("__b", _fill(False)).withColumn("__f", _fill(True))
        back, fwd = _gate(F.col("__b"), False), _gate(F.col("__f"), True)
        chosen = (
            F.when(back.isNull(), fwd)
            .when(fwd.isNull(), back)
            .when(fwd["__rt"] - F.col(_T) < F.col(_T) - back["__rt"], fwd)
            .otherwise(back)  # equidistant -> backward, merge_asof-style
        )
        out = (
            filled.where(F.col(_SIDE) == 1)
            .withColumn(_PAYLOAD, chosen)
            .drop("__b", "__f")
        )
    else:
        filled = u.withColumn(_PAYLOAD, _fill(direction == "forward"))
        out = filled.where(F.col(_SIDE) == 1).withColumn(
            _PAYLOAD, _gate(F.col(_PAYLOAD), direction == "forward")
        )
    return out.select(
        *left.columns,
        *[F.col(f"{_PAYLOAD}.{c}").alias(c) for c in rcols],
    )
