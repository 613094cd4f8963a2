"""As-of join: backward-match semantics, inclusive timestamps, ties,
tolerance, and the no-quadratic-plan property."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from swarm_spark.ops import asof_join


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "a", 5), (4, "b", 100), (5, "c", 50)],
        "lid long, k string, t long",
    )
    right = spark.createDataFrame(
        [("a", 10, "r10"), ("a", 15, "r15"), ("b", 99, "r99"), ("b", 101, "r101")],
        "k string, rt long, tag string",
    )
    return left, right


class TestAsofJoin:
    def test_backward_inclusive(self, frames):
        left, right = frames
        out = {
            r["lid"]: r["tag"]
            for r in asof_join(left, right, on="k", left_time="t", right_time="rt").collect()
        }
        assert out == {
            1: "r10",  # equal timestamp matches (inclusive)
            2: "r15",  # latest at-or-before wins
            3: None,   # nothing at or before t=5
            4: "r99",  # 101 is in the future
            5: None,   # key with no right rows
        }

    def test_tolerance(self, frames):
        left, right = frames
        out = {
            r["lid"]: r["tag"]
            for r in asof_join(
                left, right, on="k", left_time="t", right_time="rt", tolerance=F.lit(1)
            ).collect()
        }
        assert out == {1: "r10", 2: None, 3: None, 4: "r99", 5: None}

    def test_tie_is_greatest_payload(self, spark):
        left = spark.createDataFrame([(1, "a", 10)], "lid long, k string, t long")
        right = spark.createDataFrame(
            [("a", 10, "x"), ("a", 10, "z"), ("a", 10, "y")], "k string, rt long, tag string"
        )
        (row,) = asof_join(left, right, on="k", left_time="t", right_time="rt").collect()
        assert row["tag"] == "z"  # lexicographically greatest payload

    def test_column_collision_rejected(self, frames):
        left, right = frames
        bad = right.withColumnRenamed("tag", "t")
        with pytest.raises(ValueError, match="collide"):
            asof_join(left, bad, on="k", left_time="t", right_time="rt")

    def test_single_shuffle_no_nested_loop(self, frames):
        left, right = frames
        plan = asof_join(
            left, right, on="k", left_time="t", right_time="rt"
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
