"""Range (interval) join: match left timestamps into right intervals.

Spark plans a raw ``l.t BETWEEN r.start AND r.end`` join as a
broadcast-nested-loop or cartesian product — quadratic and
cluster-killing at scale. The scalable formulation grids time:

1. pick a ``grid`` (seconds) ≥ the typical interval length;
2. each left row maps to ONE grid cell (``floor(t / grid)``);
3. each right interval explodes to the cells it covers
   (``sequence(floor(start/grid), floor(end/grid))`` — ≤
   interval/grid + 1 rows);
4. equi-join on (key, cell) — a plain shuffled hash join — then filter
   the exact predicate.

Candidate volume is |left| + Σ interval/grid instead of |left|·|right|;
choosing grid ≈ max interval keeps the right-side blow-up ≤ 2×. This
is the standard time-bucketing trick (e.g. Databricks' range-join bin
optimization; F.sequence keeps it pure Catalyst here).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_CELL = "__range_cell"


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_time: str,
    right_start: str,
    right_end: str,
    grid_s: int,
    on: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join left rows into right ``[start, end)`` intervals (optionally
    also equi-keyed on ``on``). Times are timestamp columns; ``grid_s``
    is the bucketing granularity in seconds.
    """
    if how not in ("inner", "left_semi"):
        raise ValueError(f"range_join supports inner/left_semi, got {how!r}")
    overlap = set(right.columns) & set(left.columns) - ({on} if on else set())
    if overlap:
        raise ValueError(f"right columns collide with left: {sorted(overlap)}")

    def cell(col: Column) -> Column:
        return F.floor(F.unix_timestamp(col) / grid_s).cast("long")

    l = left.withColumn(_CELL, cell(F.col(left_time)))
    r = right.withColumn(
        _CELL,
        F.explode(F.sequence(cell(F.col(right_start)), cell(F.col(right_end)))),
    )
    keys = [_CELL] if on is None else [on, _CELL]
    exact = (F.col(left_time) >= F.col(right_start)) & (
        F.col(left_time) < F.col(right_end)
    )
    if how == "left_semi":
        return (
            l.join(r.select(*keys, right_start, right_end), keys)
            .where(exact)
            .select(*left.columns)
            .distinct()
        )
    return l.join(r, keys).where(exact).drop(_CELL)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    grid: int,
    on: str | None = None,
) -> DataFrame:
    """Interval × interval overlap join: every (left, right) pair whose
    half-open ``[start, end)`` ranges intersect (optionally also
    equi-keyed on ``on``). Start/end are LONG columns in one unit
    (e.g. epoch micros); ``grid`` is the cell width in the same unit.

    Scale shape: both sides explode to the grid cells they cover and
    equi-join on (key, cell) — candidate volume is Σ length/grid per
    side, never |L|·|R|. A pair overlapping k shared cells would match
    k times; instead of a distinct (a full shuffle of the matched
    pairs), each pair is kept only in its CANONICAL cell — the cell of
    ``max(starts)``, which every overlapping pair covers on both sides
    by definition — so dedup is a codegen'd filter, not an exchange.

    Empty intervals (end <= start) are dropped: they cannot overlap
    anything, and their cell sequence would be descending.
    """
    overlap_cols = set(right.columns) & set(left.columns) - ({on} if on else set())
    if overlap_cols:
        raise ValueError(f"right columns collide with left: {sorted(overlap_cols)}")

    def cells(s: str, e: str) -> Column:
        return F.explode(
            F.sequence(
                F.floor(F.col(s) / grid).cast("long"),
                F.floor((F.col(e) - 1) / grid).cast("long"),
            )
        )

    l = left.where(F.col(left_end) > F.col(left_start)).withColumn(
        _CELL, cells(left_start, left_end)
    )
    r = right.where(F.col(right_end) > F.col(right_start)).withColumn(
        _CELL, cells(right_start, right_end)
    )
    keys = [_CELL] if on is None else [on, _CELL]
    exact = (F.col(left_start) < F.col(right_end)) & (
        F.col(right_start) < F.col(left_end)
    )
    canonical = F.col(_CELL) == F.floor(
        F.greatest(F.col(left_start), F.col(right_start)) / grid
    ).cast("long")
    return l.join(r, keys).where(exact & canonical).drop(_CELL)
