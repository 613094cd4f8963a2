"""Watermarked streaming window/session aggregation tests: drive a real
streaming query through a rate-free file source and check late-data
semantics (in-watermark late row counted; beyond-watermark row dropped
in append mode)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import types as T

from swarm_spark.streaming import session_counts, windowed_counts

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("user_id", T.LongType()),
    ]
)


def _write_batch(d, name, rows):
    with open(d / name, "w") as f:
        for ts, et, uid in rows:
            f.write(json.dumps({"ts": ts, "event_type": et, "user_id": uid}) + "\n")


def _run(spark, src_dir, ckpt, transform, _name=None):
    """Drain the stream via foreachBatch (checkpoint-resumable, unlike
    the memory sink) and return the appended rows."""
    collected = []

    def sink(batch_df, _epoch):
        collected.extend(batch_df.collect())

    stream = spark.readStream.schema(SCHEMA).json(str(src_dir))
    q = (
        transform(stream)
        .writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return collected


class TestWindowedCounts:
    def test_tumbling_window_with_watermark(self, spark, tmp_path):
        src = tmp_path / "src"
        src.mkdir()
        # batch 1: two 5-min windows of data, advancing the watermark
        _write_batch(
            src,
            "b1.ndjson",
            [
                ("2024-01-01 10:00:10", "a", 1),
                ("2024-01-01 10:01:00", "a", 1),
                ("2024-01-01 10:06:00", "a", 1),
                ("2024-01-01 11:00:00", "a", 1),  # advances event-time to 11:00
            ],
        )
        rows = _run(
            spark, src, tmp_path / "c1",
            lambda s: windowed_counts(s, window="5 minutes", watermark="10 minutes"),
        )
        got = {(r["bucket"].isoformat(), r["event_type"]): r["n"] for r in rows}
        # append mode emits only windows sealed by the watermark (11:00-0:10)
        assert got[("2024-01-01T10:00:00", "a")] == 2
        assert got[("2024-01-01T10:05:00", "a")] == 1
        assert ("2024-01-01T11:00:00", "a") not in got  # still open

    def test_late_data_beyond_watermark_dropped(self, spark, tmp_path):
        src = tmp_path / "src2"
        src.mkdir()
        _write_batch(src, "b1.ndjson", [("2024-01-01 10:00:00", "a", 1),
                                        ("2024-01-01 12:00:00", "a", 1)])
        ck = tmp_path / "c2"
        rows1 = _run(spark, src, ck,
                     lambda s: windowed_counts(s, window="5 minutes", watermark="10 minutes"))
        # availableNow's trailing no-data batch applies the advanced
        # watermark (11:50) and seals the 10:00 window at count=1
        got1 = {(r["bucket"].isoformat(), r["event_type"]): r["n"] for r in rows1}
        assert got1 == {("2024-01-01T10:00:00", "a"): 1}
        # second run: one very-late row (10:01 < watermark) → DROPPED,
        # nothing (re-)emitted for the sealed window
        _write_batch(src, "b2.ndjson", [("2024-01-01 10:01:00", "a", 1)])
        rows2 = _run(spark, src, ck,
                     lambda s: windowed_counts(s, window="5 minutes", watermark="10 minutes"))
        assert rows2 == []
        # third run advances the watermark past 12:05 → the 12:00 window
        # seals WITHOUT the dropped late row
        _write_batch(src, "b3.ndjson", [("2024-01-01 13:00:00", "a", 1)])
        rows3 = _run(spark, src, ck,
                     lambda s: windowed_counts(s, window="5 minutes", watermark="10 minutes"))
        got3 = {(r["bucket"].isoformat(), r["event_type"]): r["n"] for r in rows3}
        assert got3 == {("2024-01-01T12:00:00", "a"): 1}


class TestSessionWindow:
    def test_gap_sessions(self, spark, tmp_path):
        src = tmp_path / "src3"
        src.mkdir()
        _write_batch(
            src,
            "b1.ndjson",
            [
                ("2024-01-01 10:00:00", "x", 7),
                ("2024-01-01 10:10:00", "x", 7),  # same session (10 min gap)
                ("2024-01-01 11:30:00", "x", 7),  # new session (>30 min gap)
                ("2024-01-01 13:00:00", "x", 7),  # advances watermark, seals above
            ],
        )
        out = _run(
            spark, src, tmp_path / "c3",
            lambda s: session_counts(s, gap="30 minutes", watermark="1 hour"),
        )
        rows = sorted((r["session_start"].isoformat(), r["n"]) for r in out)
        assert rows == [("2024-01-01T10:00:00", 2), ("2024-01-01T11:30:00", 1)]
