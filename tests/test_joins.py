"""Bucketed co-located join and salted skew join tests (plan-verified)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from swarm_spark.functions.joins import bucketed_join, salted_join, write_bucketed


class TestBucketedJoin:
    def test_join_on_bucketed_tables_has_no_shuffle(self, spark, tmp_path):
        # warehouse dir is a static conf — the session default applies
        left = spark.range(10000).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("v")
        )
        right = spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") % 3).alias("w")
        )
        write_bucketed(left, "bt_left", "k", num_buckets=8, sort_by="k")
        write_bucketed(right, "bt_right", "k", num_buckets=8, sort_by="k")
        old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            spark.conf.set("spark.sql.adaptive.enabled", "false")
            joined = bucketed_join(spark, "bt_left", "bt_right", "k", "k")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan  # co-located buckets: NO shuffle
            assert joined.count() == 1000
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
            spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
            spark.sql("DROP TABLE IF EXISTS bt_left")
            spark.sql("DROP TABLE IF EXISTS bt_right")


class TestSaltedJoin:
    def test_result_equals_plain_join_under_skew(self, spark):
        # 90% of left rows share one hot key
        left = spark.range(5000).select(
            F.when(F.col("id") % 10 < 9, F.lit(1)).otherwise(F.col("id")).alias("k"),
            F.col("id").alias("payload"),
        )
        right = spark.createDataFrame(
            [(1, "hot"), (17, "cold"), (23, "cold2")], "k long, label string"
        )
        plain = {(r["k"], r["payload"], r["label"]) for r in left.join(right, "k").collect()}
        salted = {
            (r["k"], r["payload"], r["label"])
            for r in salted_join(left, right, "k", salt_n=8).collect()
        }
        assert salted == plain
        assert len(plain) > 4000  # the hot key really is hot

    def test_left_join_preserved(self, spark):
        left = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
        right = spark.createDataFrame([(1, "x")], "k long, w string")
        out = {(r["k"], r["w"]) for r in salted_join(left, right, "k", salt_n=4, how="left").collect()}
        assert out == {(1, "x"), (2, None)}

    def test_outer_modes_rejected(self, spark):
        left = spark.createDataFrame([(1, "a")], "k long, v string")
        right = spark.createDataFrame([(1, "x")], "k long, w string")
        for how in ("right", "full", "outer", "full_outer", "cross"):
            with pytest.raises(ValueError, match="salted_join supports"):
                salted_join(left, right, "k", how=how)
