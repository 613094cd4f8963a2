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

Skew bound: the default fill is one window partition PER KEY, so a
key's entire row count must fit one task — AQE can split skewed JOIN
partitions but NOT window partitions, and salting would break the
forward-fill's cross-row dependency. That bound is fine for the usual
user/order/instrument keys; for a pathological hot key (one key owning
a large fraction of 100 TB) pass ``time_chunks=C``: rows are bucketed
into C equal time ranges, filled per (key, chunk), and chunk-boundary
carries (per-chunk edge payloads, a keys×C-row frame) are forward-
filled and joined back — identical output, per-task bound cut to
~rows(key)/C at the cost of one extra aggregation + join on the
already-shuffled frame.

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
    time_chunks: int | None = None,
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

    ``time_chunks``: hot-key escape hatch (see module docstring). With
    ``time_chunks=C`` each fill runs per (key, time-range chunk) —
    per-task rows bounded by ~rows(key)/C instead of rows(key) — and a
    chunk-boundary carry pass (a keys×C summary frame) restores the
    cross-chunk fills. Output is identical to the default path.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward/forward/nearest, got {direction!r}")
    if time_chunks is not None and time_chunks < 1:
        raise ValueError(f"time_chunks must be >= 1, got {time_chunks}")
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

    chunked = time_chunks is not None and time_chunks > 1
    if chunked:
        u = _with_time_chunks(u, time_chunks)

    def _order(forward: bool):
        # right rows sort before left at equal time on BOTH sides, so
        # "at or before"/"at or after" stay inclusive
        return (
            (F.col(_T).desc(), F.col(_SIDE), tb)
            if forward
            else (F.col(_T).asc(), F.col(_SIDE), tb)
        )

    def _filled(frame: DataFrame, fills: list[tuple[str, bool]]) -> DataFrame:
        """Attach one forward-fill column per (out_name, forward) pair."""
        if chunked:
            return _chunked_fills(frame, on, tb, fills, _order)
        for name, fwd in fills:
            w = (
                Window.partitionBy(on)
                .orderBy(*_order(fwd))
                .rowsBetween(Window.unboundedPreceding, 0)
            )
            frame = frame.withColumn(name, F.last(_PAYLOAD, ignorenulls=True).over(w))
        return frame

    def _gate(payload: Column, forward: bool) -> Column:
        if tolerance is None:
            return payload
        delta = (
            payload["__rt"] - F.col(_T) if forward else F.col(_T) - payload["__rt"]
        )
        return F.when(delta <= tolerance, payload)

    if direction == "nearest":
        filled = _filled(u, [("__b", False), ("__f", True)])
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
        is_fwd = direction == "forward"
        filled = _filled(u, [("__fill", is_fwd)])
        out = (
            filled.where(F.col(_SIDE) == 1)
            .withColumn(_PAYLOAD, _gate(F.col("__fill"), is_fwd))
            .drop("__fill")
        )
    return out.select(
        *left.columns,
        *[F.col(f"{_PAYLOAD}.{c}").alias(c) for c in rcols],
    )


_CHUNK = "__asof_chunk"


def _with_time_chunks(u: DataFrame, n_chunks: int) -> DataFrame:
    """Bucket rows into ``n_chunks`` equal time ranges over the union's
    global [min, max] — one metadata-sized aggregate (two scalars to
    the driver). Chunk ids are a pure function of the time value, so
    rows tying on time always share a chunk and the fill order within a
    chunk matches the unchunked sort order."""
    dt = dict(u.dtypes)[_T]
    tnum = (
        F.unix_micros(F.col(_T).cast("timestamp")).cast("double")
        if dt.startswith("timestamp") or dt == "date"
        else F.col(_T).cast("double")
    )
    lo, hi = u.agg(F.min(tnum), F.max(tnum)).first()
    if lo is None or hi is None or hi <= lo:
        return u.withColumn(_CHUNK, F.lit(0))
    span = (hi - lo) / n_chunks
    chunk = F.least(
        F.lit(n_chunks - 1), F.floor((tnum - F.lit(float(lo))) / F.lit(span))
    ).cast("int")
    return u.withColumn(_CHUNK, chunk)


def _chunked_fills(
    u: DataFrame, on: str, tb: Column, fills: list[tuple[str, bool]], order_fn
) -> DataFrame:
    """Two-phase forward fill bounded per (key, chunk).

    Phase 1 aggregates each (key, chunk)'s EDGE right payload (last for
    backward fills, first for forward) — a keys×chunks summary frame —
    and forward-fills it ACROSS chunks with a window whose partitions
    hold at most ``n_chunks`` rows per key. Phase 2 joins the carry back
    and coalesces it under the per-(key, chunk) local fill. Same answer
    as the single-window fill, per-task rows cut to ~rows(key)/chunks.
    """
    # the unchunked window resolves right rows tying at (key, time) to
    # the MAX tie-break for BOTH directions (last() over tb-ascending
    # order), so the chunk edge must too: backward = max(t) then
    # max(tb) — a plain struct max — while forward = MIN(t) then
    # max(tb), expressed as a struct max over the NEGATED numeric time
    # (ADVICE r7: min(struct(t, tb, p)) picked the MIN tie-break)
    dt = dict(u.dtypes)[_T]
    if dt.startswith("timestamp"):
        tnum = F.unix_micros(F.col(_T))
    elif dt == "date":
        tnum = F.unix_micros(F.col(_T).cast("timestamp"))
    else:
        tnum = F.col(_T)
    edge_aggs = []
    for name, fwd in fills:
        # struct max ignores null inputs; the leading fields order the
        # comparison so the payload tail only breaks exact ties
        lead = (-tnum).alias("nt") if fwd else F.col(_T).alias("t")
        edge = F.when(
            F.col(_SIDE) == 0,
            F.struct(lead, tb.alias("k"), F.col(_PAYLOAD).alias("p")),
        )
        edge_aggs.append(F.max(edge).alias(f"__edge{name}"))
    summary = u.groupBy(on, _CHUNK).agg(*edge_aggs)
    for name, fwd in fills:
        w = (
            Window.partitionBy(on)
            .orderBy(F.col(_CHUNK).desc() if fwd else F.col(_CHUNK).asc())
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        summary = summary.withColumn(
            f"__carry{name}",
            F.last(F.col(f"__edge{name}.p"), ignorenulls=True).over(w),
        )
    carries = summary.select(on, _CHUNK, *[f"__carry{n}" for n, _ in fills])
    joined = u.join(carries, [on, _CHUNK], "left")
    for name, fwd in fills:
        w = (
            Window.partitionBy(on, _CHUNK)
            .orderBy(*order_fn(fwd))
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        local = F.last(_PAYLOAD, ignorenulls=True).over(w)
        joined = joined.withColumn(name, F.coalesce(local, F.col(f"__carry{name}"))).drop(
            f"__carry{name}"
        )
    return joined
