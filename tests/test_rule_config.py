"""Declarative rule-config loader tests (C1 analogue)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from swarm_spark.model import ModelError, ObjectMeta, TableDest, parse_object_url
from swarm_spark.pipeline import IngestPipeline
from swarm_spark.rules.config import compile_predicate, load_rules, load_rules_file
from swarm_spark.sinks import TableSink

CONFIG = {
    "event_rules": [
        {
            "name": "ct",
            "when": {"bucket": "my-bucket", "name_suffix": ".json", "min_size": 1},
            "sources": [{"schema": "cloudtrail"}],
        }
    ],
    "schema_rules": [
        {
            "name": "cloudtrail",
            "fanout": "Records",
            "dataset": "ds",
            "table": {"from_field": "eventType", "prefix": "t_"},
            "partition": "month",
            "id": "eventID",
            "timestamp": {"field": "eventTime"},
            "data": "record",
            "drop": ["internal"],
        }
    ],
}


class TestPredicates:
    def test_and_semantics(self):
        p = compile_predicate({"bucket": "b", "name_prefix": "logs/", "min_size": 10})
        assert p(ObjectMeta(bucket="b", name="logs/x", size=10))
        assert not p(ObjectMeta(bucket="b", name="other/x", size=10))
        assert not p(ObjectMeta(bucket="b", name="logs/x", size=9))

    def test_any_of(self):
        p = compile_predicate({"any_of": [{"name_suffix": ".gz"}, {"name_suffix": ".json"}]})
        assert p(ObjectMeta(bucket="b", name="a.gz"))
        assert p(ObjectMeta(bucket="b", name="a.json"))
        assert not p(ObjectMeta(bucket="b", name="a.txt"))

    def test_unknown_key_rejected(self):
        with pytest.raises(ModelError):
            compile_predicate({"colour": "blue"})


class TestConfigE2E:
    def test_yaml_file_roundtrip(self, spark, tmp_path):
        import yaml

        cfg_path = tmp_path / "rules.yaml"
        cfg_path.write_text(yaml.safe_dump(CONFIG))
        events, schemas = load_rules_file(str(cfg_path))
        assert schemas.names() == ["cloudtrail"]

        doc = {
            "Records": [
                {
                    "eventID": f"id-{i}",
                    "eventType": "ApiCall" if i % 2 else "Login",
                    "eventTime": f"2024-05-01T10:00:0{i}.250Z",
                    "user": f"u{i}",
                    "internal": "scrub-me",
                }
                for i in range(4)
            ]
        }
        p = tmp_path / "obj.json"
        p.write_text(json.dumps(doc))

        sink = TableSink(spark, str(tmp_path / "wh"))
        pipe = IngestPipeline(spark, events, schemas, sink, json_mode="whole")
        stats = pipe.load_objects(
            [ObjectMeta(bucket="my-bucket", name="obj.json", size=p.stat().st_size, path=str(p))]
        )
        assert stats.rows_by_dest == {
            ("ds", "t_ApiCall", "month"): 2,
            ("ds", "t_Login", "month"): 2,
        }
        df = sink.read_table(TableDest("ds", "t_Login", "month"))
        rows = df.orderBy("id").collect()
        assert [r["id"] for r in rows] == ["id-0", "id-2"]
        # json.patch-style drop applied
        assert "internal" not in [f.name for f in df.schema["data"].dataType.fields]
        # fractional seconds preserved through the rfc3339 path
        assert rows[0]["timestamp"].microsecond == 250000

    def test_unmatched_object_not_routed(self, spark, tmp_path):
        events, schemas = load_rules(CONFIG)
        assert events.match(ObjectMeta(bucket="other", name="x.json", size=5), strict=False) == []


class TestObjectUrl:
    def test_parse_ok(self):
        ref = parse_object_url("gs://bucket/path/to/obj.json.gz")
        assert ref.bucket == "bucket" and ref.name == "path/to/obj.json.gz"
        assert ref.url == "gs://bucket/path/to/obj.json.gz"

    @pytest.mark.parametrize("bad", ["s3://b/o", "gs://", "gs://bucket", "gs://bucket/"])
    def test_parse_rejects(self, bad):
        with pytest.raises(ModelError):
            parse_object_url(bad)
