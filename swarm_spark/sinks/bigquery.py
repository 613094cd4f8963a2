"""BigQuery sink (operators W1-W4 behind the connector).

Same :class:`~swarm_spark.sinks.base.Sink` contract as the local
warehouse, backed by the public spark-bigquery-connector. The connector
jar is not in this image, so construction is gated and every method
documents the exact mapping for when it is on the classpath:

- ``ensure_table`` → read table schema via the BigQuery client,
  strict-merge with the batch's struct (exactly the local semantics —
  the merge code is shared), issue ``ALTER TABLE ADD COLUMNS`` /
  create with time partitioning on ``timestamp`` (Q4/Q5);
- ``append`` → ``df.write.format("bigquery")`` with the Storage Write
  API (``writeMethod=direct``), wrapped in
  :func:`~swarm_spark.sinks.retry.with_backoff` to absorb
  schema-propagation races (W2 — SCHEMA_MISMATCH_EXTRA_FIELDS renews
  inside the connector);
- writer multiplexing/chunking (W3/W4, 256-row chunks, pool 32) is
  connector-internal on Spark — task parallelism replaces the
  reference's goroutine pools.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..model import TableDest, TimeUnit
from .base import Sink
from .retry import with_backoff


class BigQuerySinkUnavailable(RuntimeError):
    pass


class BigQuerySink(Sink):
    FORMAT = "bigquery"

    def __init__(self, spark: SparkSession, project: str, write_method: str = "direct"):
        self.spark = spark
        self.project = project
        self.write_method = write_method
        # the connector registers the 'bigquery' data source; probe for it
        try:
            spark._jvm.Class.forName(
                "com.google.cloud.spark.bigquery.BigQueryRelationProvider"
            )
        except Exception as e:  # jar not on classpath in this image
            raise BigQuerySinkUnavailable(
                "spark-bigquery-connector not on the classpath; use TableSink "
                "locally or submit with --packages "
                "com.google.cloud.spark:spark-bigquery-with-dependencies_2.13:<ver>"
            ) from e

    def ensure_table(self, dest: TableDest, data_schema: T.StructType) -> T.StructType:
        raise NotImplementedError(
            "wire google-cloud-bigquery table get/create + strict merge_schemas "
            "+ ALTER TABLE ADD COLUMNS here (ETag-guarded update = Q4)"
        )

    def append(self, dest: TableDest, df: DataFrame) -> int:
        n = df.count()

        def write():
            w = (
                df.write.format(self.FORMAT)
                .option("table", f"{self.project}.{dest.dataset}.{dest.table}")
                .option("writeMethod", self.write_method)
            )
            if dest.partition != TimeUnit.NONE.value:
                w = w.option("partitionField", "timestamp").option(
                    "partitionType", dest.partition.upper()
                )
            w.mode("append").save()

        with_backoff(write)
        return n
