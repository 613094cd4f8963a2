"""Custom stateful streaming operators (applyInPandasWithState).

The reference gates message processing through a Firestore state
transaction keyed on message id (X1 —
/root/reference/pkg/usecase/state.go:12-66,
pkg/domain/model/state.go:19-31): the first acquirer proceeds, repeat
deliveries are skipped, and an expired state can be re-acquired. The
:class:`~swarm_spark.streaming.state.StateStore` ledger reproduces that
on the driver; this module is the *distributed* form — the state lives
in Spark's streaming state store, partitioned by key, checkpointed with
the query, and reclaimed by timeout. No external store, no driver
round-trip per message: the idiomatic shape for 100-TB streams where
the id space itself is too large for a single ledger.

- :func:`first_seen_gate` — arbitrary-stateful exactly-once gate:
  emits only the first row ever seen per id (per state TTL window);
  duplicate deliveries — in the same microbatch or any later one —
  yield nothing. The lease deadline is stored IN the state value and
  compared against processing time on every delivery, because Spark
  only fires the timeout callback for keys with no data in the batch:
  an expired id that is redelivered before the reaper runs must still
  be re-acquirable (the reference's expired-state takeover). The
  timeout callback is only the garbage collector for ids that never
  recur.

  Caveat: a query with ``ProcessingTimeTimeout`` never terminates
  under ``trigger(availableNow=True)`` — the engine keeps scheduling
  empty microbatches to fire pending timeouts. Use a continuous
  trigger in production; in bounded tests drive with
  ``query.processAllAvailable()`` then ``query.stop()``.
- :func:`dedup_within_watermark` — the built-in, event-time-bounded
  variant (``dropDuplicatesWithinWatermark``) for when dedup only
  needs to span the late-data horizon rather than a TTL: state is
  dropped as the watermark passes, so it is the cheaper choice when
  the id space is unbounded but duplicates arrive close together.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout

DEFAULT_TTL_MS = 7 * 24 * 3600 * 1000  # reference defaultStateTTL (7 d)


def first_seen_gate(
    stream: DataFrame,
    id_col: str = "msg_id",
    ttl_ms: int = DEFAULT_TTL_MS,
) -> DataFrame:
    """Exactly-once admission: pass each ``id_col`` group's first-ever
    row, drop every redelivery until the state's TTL elapses.

    Output schema == input schema. State per key: (lease expiry in
    epoch-millis,) — one long, so state size is bounded by live-key
    count, not row count. Works in append mode.

    The worker function is nested so cloudpickle ships it by value
    (workers don't have swarm_spark on their path in bare sessions).
    """
    out_schema = stream.schema
    state_schema = "expires_at long"

    def gate(key, pdf_iter, state):
        if state.hasTimedOut:
            # TTL passed with no redelivery — reclaim (pure GC path;
            # redelivery-time takeover is handled below, because Spark
            # never calls this for a key that has data in the batch)
            state.remove()
            return
        now_ms = int(time.time() * 1000)
        held = state.exists and state.get[0] > now_ms
        if not held:
            # unseen id, or lease expired before the reaper ran —
            # acquire (reference expired-state takeover) and emit
            state.update((now_ms + ttl_ms,))
            state.setTimeoutDuration(ttl_ms)
            emitted = False
            for pdf in pdf_iter:
                if not emitted and len(pdf):
                    yield pdf.iloc[[0]]
                    emitted = True
        else:
            # live lease: drop the redelivery WITHOUT extending it (the
            # original acquisition's TTL stands, as in the reference);
            # re-arm the reaper for the remaining lease — timeouts are
            # cleared every time the function runs for a key
            state.setTimeoutDuration(max(1, state.get[0] - now_ms))
            for _ in pdf_iter:
                pass

    return stream.groupBy(id_col).applyInPandasWithState(
        gate,
        out_schema,
        state_schema,
        "append",
        GroupStateTimeout.ProcessingTimeTimeout,
    )


def sessionize_stream(
    stream: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_s: int = 1800,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming gap sessionization — the canonical custom stateful
    operator: per key, events closer than ``gap_s`` merge into one
    session; a session CLOSES (and emits one row) when the event-time
    watermark passes its last event + gap, i.e. no on-time event can
    extend it any more. The batch analogue is
    ``classical_queries.q_sessionize`` / native ``session_window`` —
    this is the form that runs forever on an unbounded stream with
    bounded state.

    Output: (``user_col``, session_start, session_end, n_events).
    State per key: every session NOT YET CLOSED BY THE WATERMARK, as
    parallel (start, last, n) arrays. Sessions are NOT emitted eagerly
    when an in-batch event jumps past the gap — an out-of-order event
    arriving in a LATER micro-batch (but inside the watermark) may
    still belong to, bridge, or backward-extend any candidate — so a
    session leaves state and emits exactly once, when the watermark
    passes its last event + gap and no on-time event can touch it.
    Candidates span at most watermark+gap of event time, so per-key
    state is bounded by ~(watermark/gap)+2 sessions regardless of
    stream length; closed sessions leave state at once.

    Scale shape: state is partitioned by key in Spark's streaming
    state store, checkpointed with the query; the timeout is
    EventTimeTimeout, so closure is driven by the data's own clock —
    no wall-clock coupling, deterministic replay.
    """
    import pandas as pd

    gap_us = int(gap_s) * 1_000_000
    gap_ms = int(gap_s) * 1000
    key_type = dict(stream.dtypes)[user_col]
    out_schema = (
        f"{user_col} {key_type}, session_start timestamp, "
        "session_end timestamp, n_events long"
    )
    # open candidate sessions as parallel arrays (epoch micros)
    state_schema = "starts array<long>, lasts array<long>, ns array<long>"

    def fn(key, pdf_iter, state):
        def rows(sessions):
            return pd.DataFrame(
                {
                    user_col: [key[0]] * len(sessions),
                    "session_start": [pd.Timestamp(s[0], unit="us") for s in sessions],
                    "session_end": [pd.Timestamp(s[1], unit="us") for s in sessions],
                    "n_events": [int(s[2]) for s in sessions],
                }
            )

        wm_ms = state.getCurrentWatermarkMs()
        items = []
        if state.exists:
            starts, lasts, ns = state.get
            items = [[s, e, n] for s, e, n in zip(starts, lasts, ns)]
        if not state.hasTimedOut:
            for pdf in pdf_iter:
                items.extend(
                    [int(t.value // 1000), int(t.value // 1000), 1]
                    for t in pd.to_datetime(pdf[ts_col])
                )
        # gap-merge sweep: items (existing candidates + new events)
        # sorted by start; anything within gap of the running session's
        # end merges — bridging events collapse two candidates into one
        items.sort(key=lambda s: (s[0], s[1]))
        sessions: list[list[int]] = []
        for it in items:
            if sessions and it[0] <= sessions[-1][1] + gap_us:
                cur = sessions[-1]
                cur[1] = max(cur[1], it[1])
                cur[2] += it[2]
            else:
                sessions.append(list(it))
        # close STRICTLY: an on-time event at exactly last+gap (the
        # watermark filter only drops ts < wm) must still be able to
        # merge, and the µs→ms conversion must CEIL so a session can't
        # close up to 999µs early (ADVICE r7)
        def close_ms(s):
            return (s[1] + 999) // 1000 + gap_ms

        closed = [s for s in sessions if close_ms(s) < wm_ms]
        still_open = [s for s in sessions if close_ms(s) >= wm_ms]
        if still_open:
            state.update(
                (
                    [s[0] for s in still_open],
                    [s[1] for s in still_open],
                    [s[2] for s in still_open],
                )
            )
            # wake when the WATERMARK passes the earliest open
            # session's close point (>= wm_ms by construction; clamp
            # past wm_ms — Spark rejects a timeout at/behind the
            # current watermark, and the close test re-runs then)
            state.setTimeoutTimestamp(
                max(wm_ms + 1, min(close_ms(s) for s in still_open))
            )
        elif state.exists:
            state.remove()
        if closed:
            yield rows(closed)

    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            fn,
            out_schema,
            state_schema,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def dedup_within_watermark(
    stream: DataFrame,
    id_cols: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Event-time-bounded duplicate drop: ids recur only within the
    late-data horizon, so state is reclaimed as the watermark advances
    (finite state at any input scale, unlike keyed TTL state whose size
    tracks the live-id count)."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        id_cols or ["msg_id"]
    )
