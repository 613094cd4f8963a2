"""Streaming windowed aggregation with watermarked late-data handling.

The reference appends every record regardless of event time (no
watermarks — SURVEY §2.2); this module supplies the Spark-native
streaming analytics the reference lacks, for pipelines that aggregate
the landed stream instead of just storing it:

- :func:`windowed_counts` — tumbling/sliding event-time windows with a
  watermark bounding state: late rows inside the watermark still
  update their window, rows later than the watermark are dropped and
  their state reclaimed (the property that makes 100-TB streaming
  aggregation's state finite);
- :func:`session_counts` — native ``session_window`` gap sessions.

Both return transformed *streaming* DataFrames — callers pick the sink
(memory for tests, foreachBatch → TableSink for landing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    win = (
        F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    )
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(win.alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w").start.alias("bucket"), key_col, "n")
    )


def session_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("s"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("s").start.alias("session_start"),
            F.col("s").end.alias("session_end"),
            key_col,
            "n",
        )
    )
