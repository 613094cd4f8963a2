"""Z-order (Morton) layout: key arithmetic, locality bounds, and the
pruning advantage over a single-column sort."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from swarm_spark.ops.layout import (
    zorder_bucket_stats,
    zorder_key2,
    zorder_repartition,
)


def _morton_ref(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


class TestZorderKey:
    def test_matches_reference_interleave(self, spark):
        pts = [(x, y) for x in (0, 1, 5, 170, 255) for y in (0, 2, 128, 255)]
        df = spark.createDataFrame(pts, "x long, y long")
        rows = df.select("x", "y", zorder_key2("x", "y", 8).alias("z")).collect()
        for r in rows:
            assert r["z"] == _morton_ref(r["x"], r["y"], 8), (r["x"], r["y"])

    def test_z_curve_locality_property(self, spark):
        # aligned key quadrants ARE value quadrants: keys [0, 64) of an
        # 8x8 grid (bits=3) cover exactly x<8, y<8 at bits=4... use a
        # direct check: all 16x16 points, keys < 256 <=> x<16 and y<16
        pts = [(x, y) for x in range(32) for y in range(32)]
        df = spark.createDataFrame(pts, "x long, y long")
        inside = df.where(zorder_key2("x", "y", 5) < 256).collect()
        assert {(r["x"], r["y"]) for r in inside} == {
            (x, y) for x in range(16) for y in range(16)
        }

    def test_bijective_on_full_grid(self, spark):
        # every (x, y) of the 32x32 grid -> a distinct key matching the
        # reference interleave, covering exactly [0, 1024)
        pts = [(x, y) for x in range(32) for y in range(32)]
        df = spark.createDataFrame(pts, "x long, y long")
        rows = df.select("x", "y", zorder_key2("x", "y", 5).alias("z")).collect()
        zs = {r["z"] for r in rows}
        assert zs == set(range(1024))
        assert all(r["z"] == _morton_ref(r["x"], r["y"], 5) for r in rows)

    def test_out_of_domain_raises(self, spark):
        df = spark.createDataFrame([(300, 1)], "x long, y long")
        with pytest.raises(Exception, match="out of"):
            df.select(zorder_key2("x", "y", 8)).collect()
        neg = spark.createDataFrame([(1, -1)], "x long, y long")
        with pytest.raises(Exception, match="out of"):
            neg.select(zorder_key2("x", "y", 8)).collect()

    def test_null_input_raises(self, spark):
        # NULL is out-of-domain too: (NULL < 0) is NULL, so without the
        # explicit isNull() term the guard would fall through and the
        # key would silently be NULL instead of raising
        df = spark.createDataFrame([(None, 1)], "x long, y long")
        with pytest.raises(Exception, match="out of"):
            df.select(zorder_key2("x", "y", 8)).collect()
        from swarm_spark.ops.layout import zorder_key

        df3 = spark.createDataFrame([(1, None, 2)], "x long, y long, z long")
        with pytest.raises(Exception, match="out of"):
            df3.select(zorder_key(["x", "y", "z"], 4)).collect()

    def test_validation(self, spark):
        df = spark.createDataFrame([(1, 1)], "x long, y long")
        with pytest.raises(ValueError):
            zorder_key2("x", "y", 0)
        with pytest.raises(ValueError):
            zorder_bucket_stats(df, "x", "y", bits=8, bucket_bits=9)
        with pytest.raises(ValueError):
            zorder_repartition(df, "x", "y", n_files=0)


class TestZorderLayout:
    def _grid(self, spark, n=4096, side=256):
        # a deterministic scatter over the [0, side)^2 grid
        return (
            spark.range(n)
            .select(
                ((F.col("id") * 2654435761) % side).alias("x"),
                ((F.col("id") * 40503) % side).alias("y"),
            )
        )

    def test_bucket_spans_bounded_by_tile(self, spark):
        df = self._grid(spark)
        stats = zorder_bucket_stats(df, "x", "y", bits=8, bucket_bits=3).collect()
        tile = 1 << (8 - 3)
        assert stats
        for r in stats:
            assert 0 <= r["x_span"] < tile and 0 <= r["y_span"] < tile, tuple(r)

    def test_beats_single_column_sort_on_second_dim(self, spark):
        # files from a z-order layout bound BOTH dims; an x-sorted
        # layout leaves y unbounded -> y-predicates can't prune
        df = self._grid(spark)
        z = zorder_repartition(df, "x", "y", bits=8, n_files=16).withColumn(
            "p", F.spark_partition_id()
        )
        zspans = (
            z.groupBy("p")
            .agg((F.max("y") - F.min("y")).alias("ys"), (F.max("x") - F.min("x")).alias("xs"))
            .collect()
        )
        xsorted = df.repartitionByRange(16, "x").withColumn("p", F.spark_partition_id())
        sspans = (
            xsorted.groupBy("p").agg((F.max("y") - F.min("y")).alias("ys")).collect()
        )
        # z-order: average y-span well under the full 0..255 width
        zavg = sum(r["ys"] for r in zspans) / len(zspans)
        savg = sum(r["ys"] for r in sspans) / len(sspans)
        assert zavg < savg / 2, (zavg, savg)
        # and x stays bounded too (the curve trades a little x for y)
        assert max(r["xs"] for r in zspans) < 256

    def test_key_survives_for_writer_stats(self, spark):
        out = zorder_repartition(self._grid(spark), "x", "y", bits=8, n_files=4)
        assert "zkey" in out.columns
        assert out.count() == 4096

    def test_file_skipping_on_written_parquet(self, spark, tmp_path):
        """The user-facing payoff, measured on REAL written files (r9
        VERDICT task #6): write the same table z-ordered vs
        single-column-sorted, read back each parquet FILE's y min/max
        (what footer stats hold), and count the files a 16-wide
        y-predicate could skip. Z-order must skip a majority; the
        x-sort leaves y full-width in every file so it skips ~none."""
        df = self._grid(spark, n=16384)
        zdir, sdir = str(tmp_path / "z"), str(tmp_path / "s")
        zorder_repartition(df, "x", "y", bits=8, n_files=32).write.parquet(zdir)
        df.repartitionByRange(32, "x").write.parquet(sdir)

        def skip_fraction(path):
            per_file = (
                spark.read.parquet(path)
                .groupBy(F.input_file_name().alias("f"))
                .agg(F.min("y").alias("lo"), F.max("y").alias("hi"))
                .collect()
            )
            assert len(per_file) >= 16  # one file per non-empty partition
            skipped = sum(1 for r in per_file if r["hi"] < 100 or r["lo"] > 115)
            return skipped / len(per_file)

        z_skip, s_skip = skip_fraction(zdir), skip_fraction(sdir)
        assert z_skip >= 0.5, (z_skip, s_skip)
        assert s_skip <= 0.1, (z_skip, s_skip)


class TestZorderKeyN:
    def test_matches_two_column_form(self, spark):
        from swarm_spark.ops.layout import zorder_key

        pts = [(x, y) for x in (0, 3, 17, 255) for y in (0, 9, 255)]
        df = spark.createDataFrame(pts, "x long, y long")
        rows = df.select(
            zorder_key2("x", "y", 8).alias("a"),
            zorder_key(["x", "y"], 8).alias("b"),
        ).collect()
        assert all(r["a"] == r["b"] for r in rows)

    def test_three_columns_bijective_on_grid(self, spark):
        from swarm_spark.ops.layout import zorder_key

        pts = [(x, y, z) for x in range(8) for y in range(8) for z in range(8)]
        df = spark.createDataFrame(pts, "x long, y long, z long")
        rows = df.select("x", "y", "z", zorder_key(["x", "y", "z"], 3).alias("k")).collect()
        assert {r["k"] for r in rows} == set(range(512))

        def ref(x, y, z):
            out = 0
            for i in range(3):
                out |= ((x >> i) & 1) << (3 * i)
                out |= ((y >> i) & 1) << (3 * i + 1)
                out |= ((z >> i) & 1) << (3 * i + 2)
            return out

        assert all(r["k"] == ref(r["x"], r["y"], r["z"]) for r in rows)

    def test_prefix_ranges_are_tiles(self, spark):
        # the top 3 bits (one per column) split the cube into octants
        from swarm_spark.ops.layout import zorder_key

        pts = [(x, y, z) for x in range(8) for y in range(8) for z in range(8)]
        df = spark.createDataFrame(pts, "x long, y long, z long")
        first = df.where(zorder_key(["x", "y", "z"], 3) < 64).collect()
        assert {(r["x"], r["y"], r["z"]) for r in first} == {
            (x, y, z) for x in range(4) for y in range(4) for z in range(4)
        }

    def test_validation_and_guard(self, spark):
        from swarm_spark.ops.layout import zorder_key

        df = spark.createDataFrame([(1, 1, 300)], "x long, y long, z long")
        with pytest.raises(ValueError):
            zorder_key(["x"], 8)
        with pytest.raises(ValueError):
            zorder_key(["x", "y", "z"], 21)  # 63 bits
        with pytest.raises(Exception, match="out of"):
            df.select(zorder_key(["x", "y", "z"], 8)).collect()


class TestBucketedLayout:
    def _final_plan(self, df):
        df.collect()
        return (
            df._jdf.queryExecution()
            .executedPlan()
            .toString()
            .split("+- == Initial Plan ==")[0]
        )

    def test_bucketed_join_has_no_exchange(self, spark, tmp_path):
        from swarm_spark.ops.layout import bucketed_join, write_bucketed

        docs = spark.createDataFrame(
            [(i, f"w{i % 7} body {i}", i % 3) for i in range(400)],
            "doc_id long, text string, grp long",
        )
        stats = docs.selectExpr(
            "doc_id", "size(split(text, ' +')) as n_tokens"
        )
        write_bucketed(docs, "bkt_docs_t", str(tmp_path / "d"), 8)
        write_bucketed(stats, "bkt_stats_t", str(tmp_path / "s"), 8)
        joined = bucketed_join(spark, "bkt_docs_t", "bkt_stats_t").select(
            "doc_id", "grp", "n_tokens"
        )
        plan = self._final_plan(joined)
        assert "SortMergeJoin" in plan
        # the whole point: co-bucketed sides satisfy the join's
        # distribution requirement, so NO shuffle anywhere in the plan
        assert "Exchange" not in plan, plan
        # correctness: identical to the plain join
        want = sorted(
            map(tuple, docs.join(stats, "doc_id").select(
                "doc_id", "grp", "n_tokens").collect())
        )
        assert sorted(map(tuple, joined.collect())) == want

    def test_mismatched_buckets_fall_back_to_shuffle(self, spark, tmp_path):
        from swarm_spark.ops.layout import bucketed_join, write_bucketed

        a = spark.createDataFrame([(i, i) for i in range(50)], "doc_id long, v long")
        b = spark.createDataFrame([(i, -i) for i in range(50)], "doc_id long, w long")
        write_bucketed(a, "bkt_a_t", str(tmp_path / "a"), 8)
        write_bucketed(b, "bkt_b_t", str(tmp_path / "b"), 4)
        joined = bucketed_join(spark, "bkt_a_t", "bkt_b_t")
        plan = self._final_plan(joined)
        # differing bucket counts can't align; Spark must exchange at
        # least one side — the guard documents the contract boundary
        assert "Exchange" in plan
        assert joined.count() == 50
