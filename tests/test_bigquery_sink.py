"""BigQuery ensure_table (Q4) against a mock client: create with
envelope + partitioning, strict-merge evolution, no-op detection, and
conflict errors — the same semantics the local TableSink pins, through
the BigQuery client surface."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from swarm_spark.model import ModelError, TableDest
from swarm_spark.schema.merge import SchemaConflictError
from swarm_spark.sinks.bigquery import (
    BigQuerySink,
    api_field_to_spark,
    spark_field_to_api,
)


class NotFound(Exception):
    code = 404


class FakeTable:
    def __init__(self, schema):
        self.schema = schema  # list of api-repr dicts


class FakeClient:
    def __init__(self):
        self.tables: dict[str, FakeTable] = {}
        self.created: list = []
        self.updated: list = []

    def get_table(self, table_id):
        if table_id not in self.tables:
            raise NotFound(table_id)
        return self.tables[table_id]

    def create_table(self, spec):
        self.created.append(spec)
        self.tables[spec["table_id"]] = FakeTable(spec["schema"])

    def update_table(self, table, fields):
        assert fields == ["schema"]
        self.updated.append(table)


def _sink(spark_like=None):
    client = FakeClient()
    return BigQuerySink(spark_like, project="p", client=client), client


DATA_V1 = T.StructType([T.StructField("kind", T.StringType(), True)])
DATA_V2 = T.StructType(
    [T.StructField("kind", T.StringType(), True), T.StructField("v", T.LongType(), True)]
)


class TestEnsureTable:
    def test_creates_with_envelope_and_partitioning(self):
        sink, client = _sink()
        out = sink.ensure_table(TableDest("ds", "t", "month"), DATA_V1)
        assert out == DATA_V1
        (spec,) = client.created
        assert spec["table_id"] == "p.ds.t"
        names = [f["name"] for f in spec["schema"]]
        assert names == ["id", "ingest_id", "timestamp", "ingested_at", "data"]
        assert spec["schema"][4]["type"] == "RECORD"
        assert spec["time_partitioning"] == {"type": "MONTH", "field": "timestamp"}

    def test_evolves_existing_with_strict_merge(self):
        sink, client = _sink()
        sink.ensure_table(TableDest("ds", "t"), DATA_V1)
        merged = sink.ensure_table(TableDest("ds", "t"), DATA_V2)
        assert [f.name for f in merged.fields] == ["kind", "v"]
        (table,) = client.updated
        data_field = next(f for f in table.schema if f["name"] == "data")
        assert [f["name"] for f in data_field["fields"]] == ["kind", "v"]

    def test_same_schema_is_noop(self):
        sink, client = _sink()
        sink.ensure_table(TableDest("ds", "t"), DATA_V1)
        out = sink.ensure_table(TableDest("ds", "t"), DATA_V1)
        assert out == DATA_V1
        assert client.updated == []  # Q3: no-op detection skips update

    def test_type_conflict_raises(self):
        sink, client = _sink()
        sink.ensure_table(TableDest("ds", "t"), DATA_V1)
        bad = T.StructType([T.StructField("kind", T.LongType(), True)])
        with pytest.raises(SchemaConflictError):
            sink.ensure_table(TableDest("ds", "t"), bad)


class TestSchemaConversion:
    def test_round_trip_nested(self):
        schema = T.StructType(
            [
                T.StructField("s", T.StringType(), True),
                T.StructField("n", T.LongType(), True),
                T.StructField("f", T.DoubleType(), True),
                T.StructField("b", T.BooleanType(), True),
                T.StructField("ts", T.TimestampType(), True),
                T.StructField("tags", T.ArrayType(T.StringType(), True), True),
                T.StructField(
                    "rec",
                    T.StructType(
                        [
                            T.StructField("x", T.LongType(), True),
                            T.StructField("ys", T.ArrayType(T.DoubleType(), True), True),
                        ]
                    ),
                    True,
                ),
            ]
        )
        api = [spark_field_to_api(f) for f in schema.fields]
        back = T.StructType([api_field_to_spark(f) for f in api])
        assert back == schema

    def test_unmappable_type_raises(self):
        with pytest.raises(ModelError):
            spark_field_to_api(
                T.StructField("m", T.MapType(T.StringType(), T.StringType()), True)
            )
