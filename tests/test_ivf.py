"""Learned-IVF ANN tests: cell assignment sanity + recall vs the exact
brute-force baseline."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from swarm_spark.ops.ivf import ann_topk_ivf, kmeans_cells
from swarm_spark.ops.similarity import ann_topk_bruteforce
from swarm_spark.sources.tables import load_table


class TestKmeans:
    def test_clustered_data_separates(self, spark):
        # two tight clusters → k=2 must split them exactly
        rows = [(i, [10.0 + (i % 3) * 0.01, 0.0]) for i in range(6)] + [
            (10 + i, [0.0, 10.0 + (i % 3) * 0.01]) for i in range(6)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        cells = {r["id"]: r["cell"] for r in kmeans_cells(df, k=2, iters=3).collect()}
        a = {cells[i] for i in range(6)}
        b = {cells[10 + i] for i in range(6)}
        assert len(a) == 1 and len(b) == 1 and a != b

    def test_every_point_assigned_once(self, spark, sf_dir):
        emb = load_table(spark, sf_dir, "embeddings")
        cells = kmeans_cells(emb, k=8, iters=2)
        assert cells.count() == emb.count()
        assert cells.select("id").distinct().count() == emb.count()


class TestIvfAnn:
    def test_recall_vs_bruteforce(self, spark, sf_dir):
        emb = load_table(spark, sf_dir, "embeddings")
        queries = emb.where(F.col("vec_id") % 100 == 0)
        exact = ann_topk_bruteforce(emb, queries, k=5)
        approx = ann_topk_ivf(emb, queries, k=5, n_cells=8, nprobe=4, iters=3)
        e = {(r["query_id"], r["id"]) for r in exact.collect()}
        a = {(r["query_id"], r["id"]) for r in approx.collect()}
        recall = len(e & a) / len(e)
        # random embeddings have weak cluster structure; probing half the
        # cells must still recover a solid fraction of true neighbors
        # and the output contract must match the baseline's
        assert recall >= 0.3, f"recall {recall}"
        assert approx.columns == exact.columns

    def test_probed_subset_is_smaller(self, spark, sf_dir):
        emb = load_table(spark, sf_dir, "embeddings")
        queries = emb.where(F.col("vec_id") % 100 == 0).limit(2)
        approx = ann_topk_ivf(emb, queries, k=3, n_cells=8, nprobe=1, iters=2)
        rows = approx.collect()
        assert len(rows) > 0
        assert all(r["rank"] <= 3 for r in rows)


class TestIvfPersistence:
    def test_saved_index_probe_matches_inline(self, spark, sf_dir, tmp_path):
        """Build-once/probe-many: a saved+loaded index must probe to
        exactly the inline ann_topk_ivf results (same rounded
        centroids, same assignments, same ranking)."""
        from pyspark.sql import functions as F

        from swarm_spark.ops.ivf import (
            ann_topk_ivf,
            ann_topk_ivf_probe,
            build_ivf,
            load_ivf,
            save_ivf,
        )
        from swarm_spark.sources.tables import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        queries = emb.where(F.col("vec_id") % 100 == 0)
        inline = ann_topk_ivf(emb, queries, k=5, n_cells=8, nprobe=4, iters=3)
        a, c = build_ivf(emb, n_cells=8, iters=3)
        path = str(tmp_path / "ivf_idx")
        save_ivf(a, c, path)
        a2, c2 = load_ivf(spark, path)
        probed = ann_topk_ivf_probe(emb, queries, a2, c2, k=5, nprobe=4)
        key = lambda df: sorted(
            (r["query_id"], r["id"], r["cos"], r["rank"]) for r in df.collect()
        )
        assert key(probed) == key(inline)
        # the index is two tables: corpus-sized assignments + k centroids
        assert a2.count() == emb.count() and c2.count() == 8

    def test_string_id_index_roundtrips(self, spark, sf_dir, tmp_path):
        """build_ivf accepts any id type (CLI --id-col); load_ivf must
        read the assignments with their embedded schema, not force
        'id long' (ADVICE r6: a string-id index saved fine and then
        failed at probe time)."""
        from swarm_spark.ops.ivf import ann_topk_ivf_probe, build_ivf, load_ivf, save_ivf

        emb = load_table(spark, sf_dir, "embeddings").withColumn(
            "vec_id", F.concat(F.lit("doc-"), F.col("vec_id").cast("string"))
        )
        queries = emb.where(F.col("vec_id").endswith("00")).limit(3)
        a, c = build_ivf(emb, n_cells=4, iters=2)
        path = str(tmp_path / "ivf_str")
        save_ivf(a, c, path)
        a2, c2 = load_ivf(spark, path)
        assert dict(a2.dtypes)["id"] == "string"
        rows = ann_topk_ivf_probe(emb, queries, a2, c2, k=3, nprobe=2).collect()
        assert rows and all(isinstance(r["id"], str) for r in rows)


class TestIncrementalAssign:
    def test_wave_matches_rebuilt_assignment_arithmetic(self, spark, sf_dir):
        """A wave vector must land in the same cell whether assigned
        incrementally (frozen centroids) or by re-running the argmin
        over the same centroids — and a base vector re-assigned to the
        final centroids lands where the final assignment put it
        (pc = centroids from the final assignment)."""
        from swarm_spark.ops.ivf import assign_to_centroids, build_ivf

        emb = load_table(spark, sf_dir, "embeddings")
        base = emb.where(F.col("vec_id") % 2 == 0)
        wave = emb.where(F.col("vec_id") % 2 == 1)
        assignments, centroids = build_ivf(base, n_cells=4, iters=2)
        wa = assign_to_centroids(wave, centroids)
        assert wa.count() == wave.count()
        assert wa.select("id").distinct().count() == wave.count()
        # deterministic: same call, same result
        a = sorted(map(tuple, wa.collect()))
        b = sorted(map(tuple, assign_to_centroids(wave, centroids).collect()))
        assert a == b
        cells = {r["cell"] for r in centroids.select("cell").collect()}
        assert {c for _, c in a} <= cells

    def test_drift_report_counts_and_share(self, spark):
        from swarm_spark.ops.ivf import ivf_drift_report

        base = spark.createDataFrame(
            [(1, 0), (2, 0), (3, 1)], "id long, cell int"
        )
        wave = spark.createDataFrame([(10, 0), (11, 2)], "id long, cell int")
        rows = {r["cell"]: r for r in ivf_drift_report(base, wave).collect()}
        assert rows[0]["n_base"] == 2 and rows[0]["n_wave"] == 1
        assert rows[0]["wave_share_micro"] == 333333
        assert rows[1]["n_base"] == 1 and rows[1]["n_wave"] == 0
        assert rows[1]["wave_share_micro"] == 0
        # wave-only cell still reported (the skew signal)
        assert rows[2]["n_base"] == 0 and rows[2]["wave_share_micro"] == 1000000


class TestProbeBroadcastGuard:
    """VERDICT r6 #3: the probes frame (queries × nprobe full vectors)
    must be broadcast only for small query batches; big batches fall
    back to the plain cell equi-join so a production 10M-query batch
    can't blow the broadcast limit or driver heap."""

    def _plans(self, df):
        df.collect()
        return df._jdf.queryExecution().executedPlan().toString()

    def test_small_batch_broadcasts_and_big_batch_shuffles(self, spark, sf_dir):
        from swarm_spark.ops.ivf import ann_topk_ivf_probe, build_ivf

        emb = load_table(spark, sf_dir, "embeddings")
        queries = emb.where(F.col("vec_id") % 100 == 0)
        a, c = build_ivf(emb, n_cells=8, iters=2)
        bcast = ann_topk_ivf_probe(emb, queries, a, c, k=5, nprobe=4)
        fallback = ann_topk_ivf_probe(
            emb, queries, a, c, k=5, nprobe=4, broadcast_max_queries=0
        )
        key = lambda df: sorted(
            (r["query_id"], r["id"], r["cos"], r["rank"]) for r in df.collect()
        )
        assert key(bcast) == key(fallback), "guard changed the results"
        p_small, p_big = self._plans(bcast), self._plans(fallback)
        assert "BroadcastHashJoin" in p_small
        # the corpus-probe join specifically must not broadcast in the
        # fallback plan: every BroadcastHashJoin left is the tiny
        # centroid/cell-ranking side, so assert the cell join shuffles
        assert ("SortMergeJoin" in p_big) or ("ShuffledHashJoin" in p_big), (
            "fallback plan still broadcasts the probes"
        )

    def test_bruteforce_guard_preserves_results(self, spark, sf_dir):
        from swarm_spark.ops.similarity import ann_topk_bruteforce

        emb = load_table(spark, sf_dir, "embeddings")
        queries = emb.where(F.col("vec_id") % 200 == 0)
        bcast = ann_topk_bruteforce(emb, queries, k=3)
        plain = ann_topk_bruteforce(emb, queries, k=3, broadcast_max_queries=0)
        key = lambda df: sorted(
            (r["query_id"], r["id"], r["cos"], r["rank"]) for r in df.collect()
        )
        assert key(bcast) == key(plain)


class TestMmrSelect:
    def _emb(self, spark):
        rows = [
            (0, [1.0, 0.0, 0.0]),   # query
            (1, [0.99, 0.1, 0.0]),  # near query
            (2, [0.98, 0.12, 0.0]), # near-duplicate of 1
            (3, [0.6, 0.0, 0.8]),   # different direction, lower rel
        ]
        return spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def test_diversity_demotes_near_duplicate(self, spark):
        from swarm_spark.ops.similarity import ann_topk_bruteforce, mmr_select

        emb = self._emb(spark)
        short = ann_topk_bruteforce(emb, emb.where("vec_id = 0"), k=3)
        got = [
            (r["id"], r["rank"])
            for r in mmr_select(emb, short, k=3, lam_permille=500).collect()
        ]
        # pure relevance would give 1, 2, 3; MMR at λ=0.5 demotes the
        # near-duplicate 2 below the diverse 3
        assert got == [(1, 1), (3, 2), (2, 3)]

    def test_lambda_1000_is_pure_relevance(self, spark):
        from swarm_spark.ops.similarity import ann_topk_bruteforce, mmr_select

        emb = self._emb(spark)
        short = ann_topk_bruteforce(emb, emb.where("vec_id = 0"), k=3)
        got = [
            (r["id"], r["rank"])
            for r in mmr_select(emb, short, k=3, lam_permille=1000).collect()
        ]
        assert got == [(1, 1), (2, 2), (3, 3)]

    def test_k_exceeding_shortlist_returns_all(self, spark):
        from swarm_spark.ops.similarity import ann_topk_bruteforce, mmr_select

        emb = self._emb(spark)
        short = ann_topk_bruteforce(emb, emb.where("vec_id = 0"), k=2)
        got = mmr_select(emb, short, k=10).collect()
        assert len(got) == 2 and [r["rank"] for r in got] == [1, 2]

    def test_multi_query_groups_are_independent(self, spark):
        from swarm_spark.ops.similarity import ann_topk_bruteforce, mmr_select

        emb = self._emb(spark)
        q = emb.where("vec_id IN (0, 3)")
        short = ann_topk_bruteforce(emb, q, k=3)
        out = mmr_select(emb, short, k=2, lam_permille=500).collect()
        by_q = {}
        for r in out:
            by_q.setdefault(r["query_id"], []).append((r["id"], r["rank"]))
        assert set(by_q) == {0, 3} and all(len(v) == 2 for v in by_q.values())
        assert by_q[0][0] == (1, 1)

    def test_bad_args(self, spark):
        import pytest as _pytest

        from swarm_spark.ops.similarity import ann_topk_bruteforce, mmr_select

        emb = self._emb(spark)
        short = ann_topk_bruteforce(emb, emb.where("vec_id = 0"), k=2)
        with _pytest.raises(ValueError):
            mmr_select(emb, short, k=0)
        with _pytest.raises(ValueError):
            mmr_select(emb, short, lam_permille=1001)


class TestMmrShortlistGuard:
    def test_cap_prunes_low_relevance_candidates(self, spark):
        from swarm_spark.ops.similarity import ann_topk_bruteforce, mmr_select

        rows = [(i, [1.0 - 0.01 * i, 0.01 * i, 0.0]) for i in range(20)]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        short = ann_topk_bruteforce(emb, emb.where("vec_id = 0"), k=15)
        capped = mmr_select(emb, short, k=3, max_shortlist=5).collect()
        full = mmr_select(emb, short, k=3, max_shortlist=None).collect()
        # picks must come from the top-5 relevance candidates
        top5 = {r["id"] for r in short.where("rank <= 5").collect()}
        assert {r["id"] for r in capped} <= top5
        assert len(capped) == 3 and len(full) == 3

    def test_cap_below_k_rejected(self, spark):
        import pytest as _pytest

        from swarm_spark.ops.similarity import ann_topk_bruteforce, mmr_select

        emb = spark.createDataFrame(
            [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.8, 0.2])],
            "vec_id long, embedding array<double>",
        )
        short = ann_topk_bruteforce(emb, emb.where("vec_id = 0"), k=2)
        with _pytest.raises(ValueError):
            mmr_select(emb, short, k=5, max_shortlist=3)
