"""Loaders for the driver's synthetic TPC-H-ish tables (TESTDATA.md).

One place that knows the physical quirks of the test tables so every
query/operator sees clean, typed DataFrames:

- ``events.parquet`` stores ``ts`` as parquet TIMESTAMP(NANOS); Spark
  has no nanosecond timestamp, so the session reads it as long
  (``spark.sql.legacy.parquet.nanosAsLong``) and this loader converts
  nanos → microsecond TimestampType.
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
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
