"""Scale-path tests: distributed routing over listing frames, retry
envelope, concatenated-JSON decode, and plan-shape assertions."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from swarm_spark.model import ObjectMeta, Source
from swarm_spark.rules import (
    EventRule,
    EventRuleSet,
    NameGlob,
    NamePrefix,
    NameSuffix,
    SizeAtLeast,
    bucket,
)
from swarm_spark.sinks.retry import RetryDeadlineExceeded, with_backoff
from swarm_spark.sources.jsonsrc import _split_concatenated, read_json_objects


class TestDistributedRouting:
    @pytest.fixture(scope="class")
    def listing(self, spark):
        rows = [
            ("logs", f"cloudtrail/{i:04d}.json.gz", 1000 + i, 1700000000 + i)
            for i in range(500)
        ] + [
            ("logs", f"alb/{i:04d}.log", 50, 1700000000) for i in range(300)
        ] + [
            ("other", "cloudtrail/x.json.gz", 10, 0),
            ("logs", "cloudtrail/tiny.json.gz", 1, 0),  # below size floor
        ]
        return spark.createDataFrame(rows, "bucket string, name string, size long, created_at long")

    def test_route_listing_fans_out(self, listing):
        rules = EventRuleSet(
            [
                EventRule(
                    "ct",
                    bucket("logs") & NamePrefix("cloudtrail/") & SizeAtLeast(100),
                    (Source(schema="cloudtrail", compress="gzip"),),
                ),
                EventRule(
                    "alb",
                    bucket("logs") & NameGlob("alb/*.log"),
                    (Source(schema="alb"),),
                ),
            ]
        )
        routed = rules.route_listing(listing)
        counts = {
            r["schema"]: r["n"]
            for r in routed.groupBy("schema").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        assert counts == {"cloudtrail": 500, "alb": 300}
        # predicate evaluation is Catalyst-side: filters appear in the plan
        plan = routed._jdf.queryExecution().optimizedPlan().toString()
        assert "startswith" in plan.lower() or "StartsWith" in plan

    def test_python_and_column_paths_agree(self, listing):
        pred = bucket("logs") & (NameSuffix(".json.gz") | NameGlob("alb/*.log")) & SizeAtLeast(100)
        col_count = listing.where(pred.column()).count()
        py_count = sum(
            1
            for r in listing.collect()
            if pred(ObjectMeta(bucket=r["bucket"], name=r["name"], size=r["size"]))
        )
        assert col_count == py_count > 0


class TestRetry:
    def test_retries_until_success(self):
        calls = {"n": 0}

        def flaky():
            calls["n"] += 1
            if calls["n"] < 4:
                raise OSError("transient")
            return "ok"

        slept = []
        assert (
            with_backoff(flaky, sleep=slept.append, deadline_s=10, initial_s=0.01)
            == "ok"
        )
        assert slept == [0.01, 0.02, 0.04]  # exponential

    def test_non_retryable_raises_immediately(self):
        def bad():
            raise ValueError("permanent")

        with pytest.raises(ValueError):
            with_backoff(bad, retryable=lambda e: isinstance(e, OSError))

    def test_deadline(self):
        t = {"now": 0.0}

        def clock():
            return t["now"]

        def sleep(s):
            t["now"] += s

        def always_fails():
            raise OSError("down")

        with pytest.raises(RetryDeadlineExceeded):
            with_backoff(always_fails, deadline_s=5.0, sleep=sleep, clock=clock)

    def test_backoff_caps_at_max(self):
        slept = []

        def always_fails():
            raise OSError("down")

        t = {"now": 0.0}

        def sleep(s):
            slept.append(s)
            t["now"] += s

        with pytest.raises(RetryDeadlineExceeded):
            with_backoff(
                always_fails, deadline_s=100, initial_s=10, max_s=30,
                sleep=sleep, clock=lambda: t["now"],
            )
        assert max(slept) == 30


class TestConcatenatedJson:
    def test_split_concatenated(self):
        text = '{"a":1} {"b":[1,2]}\n\n"str" 42 {"c":{"d":null}}'
        vals = _split_concatenated(text)
        assert [json.loads(v) for v in vals] == [
            {"a": 1},
            {"b": [1, 2]},
            "str",
            42,
            {"c": {"d": None}},
        ]

    def test_whole_mode_reads_concatenated_objects(self, spark, tmp_path):
        # two concatenated JSON docs in ONE file — NDJSON can't express this
        p = tmp_path / "concat.json"
        p.write_text('{"x": 1, "y": "a"}\n{"x": 2, "y": "b"} {"x": 3, "y": "c"}')
        df = read_json_objects(spark, [str(p)], mode="whole")
        assert df.count() == 3
        assert sorted(r["x"] for r in df.collect()) == [1, 2, 3]

    def test_whole_mode_uses_jvm_dataset_bridge(self, spark, tmp_path):
        """The split pass must be the ONLY Python hop: the value strings
        go to the JVM json reader as Dataset[String], not back through
        values.rdd.map. Pin the bridge so a py4j regression can't
        silently degrade to the double-Python-pass fallback."""
        from pyspark.sql import DataFrame as _DF

        from swarm_spark.sources.jsonsrc import _make_explode_values

        p = tmp_path / "bridge.json"
        p.write_text('{"x": 1} {"x": 2}')
        texts = spark.read.text([str(p)], wholetext=True)
        values = texts.mapInPandas(_make_explode_values(), schema="value string")
        jds = getattr(values._jdf, "as")(
            spark._jvm.org.apache.spark.sql.Encoders.STRING()
        )
        reader = spark.read.option("multiLine", "false")
        out = _DF(reader._jreader.json(jds), spark)
        assert sorted(r["x"] for r in out.collect()) == [1, 2]


class TestSourceFormats:
    def test_csv_parquet_orc_objects_ingest(self, spark, tmp_path):
        import json as _json

        from swarm_spark.model import ObjectMeta, Source, TableDest
        from swarm_spark.pipeline import IngestPipeline
        from swarm_spark.rules import (
            EventRule,
            EventRuleSet,
            SchemaRuleRegistry,
            name_suffix,
            rule_output,
        )
        from swarm_spark.sinks import TableSink

        csv_p = tmp_path / "a.csv"
        csv_p.write_text("k,v,ts\nx,1,1700000000\ny,2,1700000001\n")
        pq_p = str(tmp_path / "b.parquet")
        spark.createDataFrame(
            [("z", 3, 1700000002)], "k string, v long, ts long"
        ).coalesce(1).write.parquet(pq_p)
        orc_p = str(tmp_path / "c.orc")
        spark.createDataFrame(
            [("w", 4, 1700000003)], "k string, v long, ts long"
        ).coalesce(1).write.orc(orc_p)

        rules = SchemaRuleRegistry()

        @rules.rule("kv")
        def kv(df):
            return rule_output(
                df,
                dataset="fmt",
                table="t",
                timestamp=F.col("ts").cast("double"),
                data=F.struct(F.col("k"), F.col("v").cast("long").alias("v")),
            )

        events = EventRuleSet(
            [
                EventRule("csv", name_suffix(".csv"), (Source(parser="csv", schema="kv"),)),
                EventRule("pq", name_suffix(".parquet"), (Source(parser="parquet", schema="kv"),)),
                EventRule("orc", name_suffix(".orc"), (Source(parser="orc", schema="kv"),)),
            ]
        )
        sink = TableSink(spark, str(tmp_path / "wh"))
        pipe = IngestPipeline(spark, events, rules, sink)
        stats = pipe.load_objects(
            [
                ObjectMeta(bucket="b", name="a.csv", path=str(csv_p)),
                ObjectMeta(bucket="b", name="b.parquet", path=pq_p),
                ObjectMeta(bucket="b", name="c.orc", path=orc_p),
            ]
        )
        assert stats.total_rows == 4
        df = sink.read_table(TableDest("fmt", "t"))
        assert sorted((r["data"]["k"], r["data"]["v"]) for r in df.collect()) == [
            ("w", 4),
            ("x", 1),
            ("y", 2),
            ("z", 3),
        ]

    def test_unknown_parser_rejected(self):
        from swarm_spark.model import ModelError, Source

        with pytest.raises(ModelError):
            Source(parser="avro", schema="s").validate()
