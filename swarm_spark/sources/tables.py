"""Loaders for the driver's synthetic TPC-H-ish tables (TESTDATA.md).

One place that knows the physical quirks of the test tables so every
query/operator sees clean, typed DataFrames:

- ``events.parquet`` has stored ``ts`` as parquet TIMESTAMP(NANOS)
  (read as long via ``spark.sql.legacy.parquet.nanosAsLong`` and
  converted nanos → µs here) and, in newer generations, as
  TIMESTAMP(MICROS, isAdjustedToUTC=false) which Spark reads as
  TIMESTAMP_NTZ. Both are normalized to microsecond TimestampType —
  the session timezone is pinned UTC, so the NTZ→TZ cast is
  offset-free and every downstream ``unix_micros``/window query sees
  one timestamp type.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # runtime-settable; required even when the session wasn't built
        # by our factory (e.g. the grading driver's own session)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # integer division: `/` is double division, and ns epoch values
        # (~1.7e18) exceed double's 2^53 exact-integer range — float
        # rounding shifts ~12% of timestamps by 1 µs.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    ntz = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, T.TimestampNTZType)
    ]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast(T.TimestampType()))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
