"""Distributed exactly-once gate (applyInPandasWithState) semantics:
first delivery passes, redeliveries (same batch or later batches
against the same checkpoint) are dropped, TTL-expired ids become
re-acquirable — the Spark-state-store form of the reference's
Firestore message-state transaction (pkg/usecase/state.go:12-66)."""

from __future__ import annotations

import json

from pyspark.sql import types as T

from swarm_spark.streaming import dedup_within_watermark, first_seen_gate

SCHEMA = T.StructType(
    [
        T.StructField("msg_id", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("payload", T.StringType()),
    ]
)


def _write_batch(d, name, rows):
    with open(d / name, "w") as f:
        for msg_id, ts, payload in rows:
            f.write(json.dumps({"msg_id": msg_id, "ts": ts, "payload": payload}) + "\n")


def _run(spark, src_dir, ckpt, transform):
    collected = []

    def sink(batch_df, _epoch):
        collected.extend(batch_df.collect())

    stream = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", "1").json(
        str(src_dir)
    )
    # the stateful operator opens one state store per shuffle partition
    # per microbatch — pin partitions low or tiny tests pay 32× state
    # store + Python-worker startup (the conf is captured into the
    # checkpoint at first run and reused on restarts)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    prev_ndmb = spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    # with ProcessingTimeTimeout registered, FlatMapGroupsWithStateExec
    # unconditionally asks for another batch, so availableNow never
    # terminates (and processAllAvailable livelocks) while empty
    # timeout-firing microbatches spin at full CPU. Disabling no-data
    # microbatches restores bounded-drain termination; the timeout
    # reaper then only runs piggybacked on data batches, which the
    # takeover-at-delivery semantics don't depend on.
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    try:
        q = (
            transform(stream)
            .writeStream.outputMode("append")
            .foreachBatch(sink)
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "bounded drain did not terminate"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", prev_ndmb)
    return collected


class TestFirstSeenGate:
    def test_first_delivery_passes_duplicates_drop(self, spark, tmp_path):
        src = tmp_path / "src"
        src.mkdir()
        # m1 twice in one batch; m2 once
        _write_batch(
            src,
            "b1.ndjson",
            [
                ("m1", "2024-01-01 10:00:00", "first"),
                ("m1", "2024-01-01 10:00:01", "dup-same-batch"),
                ("m2", "2024-01-01 10:00:02", "other"),
            ],
        )
        # second microbatch redelivers m1 and m2, adds m3
        _write_batch(
            src,
            "b2.ndjson",
            [
                ("m1", "2024-01-01 10:05:00", "dup-next-batch"),
                ("m2", "2024-01-01 10:05:01", "dup-next-batch"),
                ("m3", "2024-01-01 10:05:02", "new"),
            ],
        )
        rows = _run(spark, src, tmp_path / "c1", first_seen_gate)
        got = {r["msg_id"]: r["payload"] for r in rows}
        assert len(rows) == 3  # exactly one row per id across both batches
        assert got == {"m1": "first", "m2": "other", "m3": "new"}

    def test_state_survives_query_restart(self, spark, tmp_path):
        src = tmp_path / "src2"
        src.mkdir()
        ck = tmp_path / "c2"
        _write_batch(src, "b1.ndjson", [("m1", "2024-01-01 10:00:00", "first")])
        rows1 = _run(spark, src, ck, first_seen_gate)
        assert [r["payload"] for r in rows1] == ["first"]
        # a NEW query run against the same checkpoint still remembers m1
        _write_batch(
            src,
            "b2.ndjson",
            [
                ("m1", "2024-01-01 11:00:00", "redelivery"),
                ("m4", "2024-01-01 11:00:01", "fresh"),
            ],
        )
        rows2 = _run(spark, src, ck, first_seen_gate)
        assert [r["payload"] for r in rows2] == ["fresh"]

    def test_ttl_expiry_reacquires(self, spark, tmp_path):
        src = tmp_path / "src3"
        src.mkdir()
        ck = tmp_path / "c3"
        _write_batch(src, "b1.ndjson", [("m1", "2024-01-01 10:00:00", "first")])
        rows1 = _run(
            spark, src, ck, lambda s: first_seen_gate(s, ttl_ms=1)
        )
        assert len(rows1) == 1
        # 1 ms TTL has long passed by the next run: the timed-out state
        # was reclaimed, so a redelivery acquires again
        import time

        time.sleep(0.1)
        _write_batch(src, "b2.ndjson", [("m1", "2024-01-01 12:00:00", "again")])
        rows2 = _run(
            spark, src, ck, lambda s: first_seen_gate(s, ttl_ms=1)
        )
        assert [r["payload"] for r in rows2] == ["again"]


class TestDedupWithinWatermark:
    def test_duplicate_inside_horizon_dropped(self, spark, tmp_path):
        src = tmp_path / "src4"
        src.mkdir()
        _write_batch(
            src,
            "b1.ndjson",
            [
                ("m1", "2024-01-01 10:00:00", "a"),
                ("m1", "2024-01-01 10:10:00", "dup"),
                ("m2", "2024-01-01 10:20:00", "b"),
            ],
        )
        rows = _run(
            spark,
            src,
            tmp_path / "c4",
            lambda s: dedup_within_watermark(s, ["msg_id"], "ts", "1 hour"),
        )
        assert sorted(r["payload"] for r in rows) == ["a", "b"]


class TestSessionizeStream:
    def test_sessions_close_on_watermark_and_merge_in_gap(self, spark, tmp_path):
        from swarm_spark.streaming import sessionize_stream

        src = tmp_path / "sess-src"
        src.mkdir()
        # u1: two events 10 min apart (one session), then a 2-hour jump
        # (closes it, opens another); u2: one event
        _write_batch(
            src,
            "b1.ndjson",
            [
                ("u1", "2024-01-01 10:00:00", "a"),
                ("u1", "2024-01-01 10:10:00", "b"),
                ("u2", "2024-01-01 10:05:00", "c"),
            ],
        )
        _write_batch(
            src,
            "b2.ndjson",
            [
                ("u1", "2024-01-01 12:30:00", "d"),
                # late-but-in-gap event extends u1's FIRST session
                # backwards? no — that session is long past; this one
                # belongs to the open 12:30 session
                ("u1", "2024-01-01 12:40:00", "e"),
            ],
        )
        # far-future batch advances the watermark past everything; the
        # harness disables no-data microbatches, so a further DATA
        # batch is needed for the engine to fire pending event-time
        # timeouts (in production the no-data microbatch does this)
        _write_batch(src, "b3.ndjson", [("u9", "2024-01-02 09:00:00", "z")])
        _write_batch(src, "b4.ndjson", [("u9", "2024-01-02 09:00:30", "z2")])

        rows = _run(
            spark,
            src,
            tmp_path / "sess-ck",
            lambda s: sessionize_stream(
                s.withColumnRenamed("msg_id", "user_id").select("user_id", "ts"),
                gap_s=1800,
                watermark="1 minute",
            ),
        )
        got = sorted(
            (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n_events"])
            for r in rows
        )
        assert ("u1", "2024-01-01 10:00:00", "2024-01-01 10:10:00", 2) in got
        assert ("u1", "2024-01-01 12:30:00", "2024-01-01 12:40:00", 2) in got
        assert ("u2", "2024-01-01 10:05:00", "2024-01-01 10:05:00", 1) in got
        # u9's session is still OPEN (nothing advanced the watermark
        # past it) — withheld, exactly the append-mode contract
        assert not any(u == "u9" for (u, *_rest) in got)

    def test_late_event_after_gap_jump_merges_not_fragments(self, spark, tmp_path):
        """ADVICE r6 (medium): an event may jump past the gap in batch
        N while a LATE event belonging to the earlier session is still
        inside the watermark and arrives in batch N+1. Eager
        close-on-gap emitted the earlier session at batch N and the
        late event became a spurious extra session; candidates must
        stay in state until the WATERMARK passes last+gap."""
        from swarm_spark.streaming import sessionize_stream

        src = tmp_path / "sess3-src"
        src.mkdir()
        # batch 1: 10:00 then a >gap jump to 13:00 — two candidates
        _write_batch(
            src,
            "b1.ndjson",
            [
                ("u1", "2024-01-01 10:00:00", "a"),
                ("u1", "2024-01-01 13:00:00", "b"),
            ],
        )
        # batch 2: late event 10:10 (wm after b1 = 13:00-6h, so it is
        # on time) must merge into the 10:00 candidate, NOT fragment
        _write_batch(src, "b2.ndjson", [("u1", "2024-01-01 10:10:00", "late")])
        # advance the watermark past everything, then one more data
        # batch so the engine fires the pending event-time timeouts
        _write_batch(src, "b3.ndjson", [("u9", "2024-01-03 09:00:00", "z")])
        _write_batch(src, "b4.ndjson", [("u9", "2024-01-03 09:00:30", "z2")])
        rows = _run(
            spark,
            src,
            tmp_path / "sess3-ck",
            lambda s: sessionize_stream(
                s.withColumnRenamed("msg_id", "user_id").select("user_id", "ts"),
                gap_s=1800,
                watermark="6 hours",
            ),
        )
        got = sorted(
            (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n_events"])
            for r in rows
            if r["user_id"] == "u1"
        )
        assert got == [
            ("u1", "2024-01-01 10:00:00", "2024-01-01 10:10:00", 2),
            ("u1", "2024-01-01 13:00:00", "2024-01-01 13:00:00", 1),
        ], f"late event fragmented: {got}"

    def test_late_event_bridges_two_candidates(self, spark, tmp_path):
        """A late event landing between two open candidates within gap
        of both must collapse them into ONE session."""
        from swarm_spark.streaming import sessionize_stream

        src = tmp_path / "sess4-src"
        src.mkdir()
        _write_batch(
            src,
            "b1.ndjson",
            [
                ("u1", "2024-01-01 10:00:00", "a"),
                ("u1", "2024-01-01 10:50:00", "b"),  # 50 min > 30 min gap
            ],
        )
        _write_batch(src, "b2.ndjson", [("u1", "2024-01-01 10:25:00", "bridge")])
        _write_batch(src, "b3.ndjson", [("u9", "2024-01-03 09:00:00", "z")])
        _write_batch(src, "b4.ndjson", [("u9", "2024-01-03 09:00:30", "z2")])
        rows = _run(
            spark,
            src,
            tmp_path / "sess4-ck",
            lambda s: sessionize_stream(
                s.withColumnRenamed("msg_id", "user_id").select("user_id", "ts"),
                gap_s=1800,
                watermark="6 hours",
            ),
        )
        got = [
            (str(r["session_start"]), str(r["session_end"]), r["n_events"])
            for r in rows
            if r["user_id"] == "u1"
        ]
        assert got == [("2024-01-01 10:00:00", "2024-01-01 10:50:00", 3)], got

    def test_same_batch_multi_session_split(self, spark, tmp_path):
        from swarm_spark.streaming import sessionize_stream

        src = tmp_path / "sess2-src"
        src.mkdir()
        _write_batch(
            src,
            "b1.ndjson",
            [
                ("u1", "2024-01-01 10:00:00", "a"),
                ("u1", "2024-01-01 13:00:00", "b"),  # > gap: splits in-batch
                ("u1", "2024-01-01 13:05:00", "c"),
            ],
        )
        _write_batch(src, "b2.ndjson", [("u9", "2024-01-02 09:00:00", "z")])
        _write_batch(src, "b3.ndjson", [("u9", "2024-01-02 09:00:30", "z2")])
        rows = _run(
            spark,
            src,
            tmp_path / "sess2-ck",
            lambda s: sessionize_stream(
                s.withColumnRenamed("msg_id", "user_id").select("user_id", "ts"),
                gap_s=1800,
                watermark="1 minute",
            ),
        )
        got = sorted(
            (r["user_id"], str(r["session_start"]), r["n_events"]) for r in rows
        )
        assert ("u1", "2024-01-01 10:00:00", 1) in got
        assert ("u1", "2024-01-01 13:00:00", 2) in got
