"""Deterministic hash sampling: partition-layout invariance,
composability, split stability, and fraction accuracy."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from swarm_spark.ops import hash_sample, split_column, stratified_hash_sample


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 5000).select(F.col("id"))


class TestHashSample:
    def test_partition_layout_invariant(self, ids):
        a = {r["id"] for r in hash_sample(ids, 0.2, "id").collect()}
        b = {
            r["id"]
            for r in hash_sample(ids.repartition(17), 0.2, "id").collect()
        }
        assert a == b  # df.sample() would differ here

    def test_fraction_approximate_and_nested(self, ids):
        s50 = hash_sample(ids, 0.5, "id")
        n50 = s50.count()
        assert abs(n50 / 5000 - 0.5) < 0.05
        # a narrower sample with the same seed is a subset (composable)
        s10 = {r["id"] for r in hash_sample(ids, 0.1, "id").collect()}
        assert s10 <= {r["id"] for r in s50.collect()}

    def test_bad_fraction_rejected(self, ids):
        with pytest.raises(ValueError):
            hash_sample(ids, 1.5, "id")


class TestSplit:
    def test_partitions_are_total_and_disjoint(self, ids):
        lab = ids.withColumn("split", split_column("id"))
        counts = {r["split"]: r["n"] for r in
                  lab.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
        assert set(counts) == {"train", "val", "test"}
        assert sum(counts.values()) == 5000
        assert abs(counts["test"] / 5000 - 0.1) < 0.03
        assert abs(counts["val"] / 5000 - 0.1) < 0.03

    def test_membership_stable_as_corpus_grows(self, spark, ids):
        small = ids.where(F.col("id") < 1000).withColumn("split", split_column("id"))
        grown = ids.withColumn("split", split_column("id")).where(F.col("id") < 1000)
        assert sorted(map(tuple, small.collect())) == sorted(map(tuple, grown.collect()))


class TestStratified:
    def test_per_stratum_fractions(self, spark):
        df = spark.range(0, 3000).select(
            F.col("id"),
            F.element_at(
                F.array(F.lit("a"), F.lit("b"), F.lit("c")),
                (F.col("id") % 3 + 1).cast("int"),
            ).alias("s"),
        )
        out = stratified_hash_sample(
            df, strata="s", fractions={"a": 1.0, "b": 0.5}, key="id", default=0.0
        )
        counts = {r["s"]: r["n"] for r in
                  out.groupBy("s").agg(F.count(F.lit(1)).alias("n")).collect()}
        assert counts.get("a") == 1000          # keep all
        assert abs(counts.get("b", 0) / 1000 - 0.5) < 0.1
        assert "c" not in counts                # default 0
