"""Evolving local table sink (operators Q4/Q5/W1 in parquet-warehouse form).

Physical layout per destination::

    {warehouse}/{dataset}/{table}/
        _swarm_schema.json      # full row schema (envelope + data), JSON
        part-*.parquet          # appended batches (partitioned subdirs
                                #   __swarm_part=... when unit != "")

Schema evolution = strict merge of the stored ``data`` struct with the
incoming batch's struct (union, stable order, error on conflict —
reference pkg/usecase/bigquery.go:15-45), then an atomic schema-file
swap guarded by an exclusive lock file — the single-writer analogue of
the reference's ETag compare-and-swap (pkg/infra/bq/client.go:197-213).
Reading uses the stored merged schema; parquet's nested-column pruning
fills fields missing from older files with nulls, so old batches never
need rewriting (same monotonic-evolution property BigQuery gives the
reference).

On a cluster this sink maps 1:1 onto Delta/Iceberg (transactional
commit replaces the lock file) or the BigQuery connector.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.timeutils import PARTITION_COL, partition_value
from ..model import ENVELOPE_FIELDS, ModelError, TableDest, TimeUnit
from ..schema.merge import merge_schemas, schemas_equal
from .base import Sink

SCHEMA_FILE = "_swarm_schema.json"
LOCK_FILE = "_swarm_schema.lock"


def envelope_schema(data_schema: T.StructType) -> T.StructType:
    return T.StructType(ENVELOPE_FIELDS + [T.StructField("data", data_schema, True)])


class TableSink(Sink):
    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.warehouse = warehouse
        os.makedirs(warehouse, exist_ok=True)

    def _dir(self, dest: TableDest) -> str:
        return os.path.join(self.warehouse, dest.dataset, dest.table)

    def _read_schema(self, dest: TableDest) -> T.StructType | None:
        p = os.path.join(self._dir(dest), SCHEMA_FILE)
        if not os.path.exists(p):
            return None
        with open(p, encoding="utf-8") as f:
            return T.StructType.fromJson(json.load(f))

    def _lock(self, dest: TableDest, timeout_s: float = 30.0):
        path = os.path.join(self._dir(dest), LOCK_FILE)
        deadline = time.monotonic() + timeout_s
        while True:
            try:
                fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.close(fd)
                return path
            except FileExistsError:
                if time.monotonic() > deadline:
                    raise ModelError(f"schema lock timeout for {dest}")
                time.sleep(0.05)

    def ensure_table(self, dest: TableDest, data_schema: T.StructType) -> T.StructType:
        dest.validate()
        d = self._dir(dest)
        os.makedirs(d, exist_ok=True)
        lock = self._lock(dest)
        try:
            current = self._read_schema(dest)
            if current is None:
                merged_data = data_schema
            else:
                current_data = current["data"].dataType
                merged_data = merge_schemas(current_data, data_schema)
                if schemas_equal(current_data, merged_data):
                    return current_data  # Q3 no-op detection: skip update
            target = envelope_schema(merged_data)
            tmp = os.path.join(d, SCHEMA_FILE + f".tmp-{uuid.uuid4().hex}")
            with open(tmp, "w", encoding="utf-8") as f:
                json.dump(target.jsonValue(), f)
            os.replace(tmp, os.path.join(d, SCHEMA_FILE))
            return merged_data
        finally:
            os.remove(lock)

    def append(self, dest: TableDest, df: DataFrame) -> int:
        d = self._dir(dest)
        n = df.count()
        if n == 0:
            return 0
        writer = df
        if dest.partition != TimeUnit.NONE.value:
            writer = df.withColumn(
                PARTITION_COL, partition_value(F.col("timestamp"), dest.partition)
            )
            writer.write.mode("append").partitionBy(PARTITION_COL).parquet(d)
        else:
            writer.write.mode("append").parquet(d)
        return n

    def read_table(self, dest: TableDest) -> DataFrame:
        schema = self._read_schema(dest)
        if schema is None:
            raise ModelError(f"no such table: {dest.dataset}.{dest.table}")
        if dest.partition != TimeUnit.NONE.value:
            schema = T.StructType(
                list(schema.fields) + [T.StructField(PARTITION_COL, T.StringType(), True)]
            )
        df = self.spark.read.schema(schema).parquet(self._dir(dest))
        return df.drop(PARTITION_COL)

    def list_tables(self) -> list[TableDest]:
        out = []
        for ds in sorted(os.listdir(self.warehouse)):
            dsp = os.path.join(self.warehouse, ds)
            if not os.path.isdir(dsp):
                continue
            for tb in sorted(os.listdir(dsp)):
                if os.path.exists(os.path.join(dsp, tb, SCHEMA_FILE)):
                    out.append(TableDest(ds, tb))
        return out
