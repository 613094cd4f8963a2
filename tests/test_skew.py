"""Adversarial-skew evidence for the 100-TB candidate-bound claims.

SCALING.md asserts that DF-pruning bounds the shared-shingle and
MinHash-band candidate joins on skewed corpora, and that sign-LSH is
the cell-free embedding path. These tests build the worst cases —
(a) a boilerplate corpus where one template makes EVERY doc pair a
shingle-join candidate, and (b) an embedding corpus whose cell column
puts ~all vectors in one cell — and pin the candidate CARDINALITY
(counted frames, not wall time) with and without the mitigation.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from swarm_spark.ops.dedup import (
    doc_shingles,
    embedding_dup_pairs,
    embedding_signlsh_pairs,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    prune_by_df,
)

N_DOCS = 300
N_CLONES = 3  # 3 clone pairs planted


@pytest.fixture(scope="module")
def boilerplate_docs(spark):
    """Every doc = a 20-token shared template + 3 unique tokens, so
    every template-interior shingle has DF = N_DOCS and every doc pair
    shares ~18 shingles. Clone pairs additionally share their unique
    suffix (the only rare shingles two docs can share)."""
    template = " ".join(f"tmpl{t}" for t in range(20))
    rows = []
    for i in range(N_DOCS):
        u = i - N_CLONES if i < 2 * N_CLONES and i >= N_CLONES else i
        rows.append((i, f"{template} uniq{u}a uniq{u}b uniq{u}c"))
    return spark.createDataFrame(rows, "doc_id long, text string").coalesce(4)


def _candidate_pairs(shingles):
    """Distinct (doc_a, doc_b) sharing >=1 shingle — the exact shape of
    the ngram-jaccard candidate join."""
    a = shingles.alias("a")
    b = shingles.alias("b")
    return (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


class TestShingleSkew:
    def test_template_shingle_df_is_corpus_sized(self, boilerplate_docs):
        s = doc_shingles(boilerplate_docs)
        hot = (
            s.groupBy("sh")
            .agg(F.count(F.lit(1)).alias("df"))
            .agg(F.max("df").alias("mx"))
            .first()["mx"]
        )
        assert hot == N_DOCS

    def test_unpruned_candidates_are_quadratic(self, boilerplate_docs):
        n = _candidate_pairs(doc_shingles(boilerplate_docs)).count()
        assert n >= N_DOCS * (N_DOCS - 1) // 2  # every pair collides

    def test_prune_by_df_bounds_candidates_to_clone_pairs(self, boilerplate_docs):
        pruned = prune_by_df(doc_shingles(boilerplate_docs), max_df=5)
        # the cap survives: no shingle above max_df remains
        mx = (
            pruned.groupBy("sh")
            .agg(F.count(F.lit(1)).alias("df"))
            .agg(F.max("df").alias("mx"))
            .first()["mx"]
        )
        assert mx <= 5
        # candidate volume collapses from ~N²/2 to exactly the planted
        # clone pairs (only clones share a rare boundary/unique shingle)
        assert _candidate_pairs(pruned).count() == N_CLONES

    def test_prune_has_no_hot_key_window_partition(self, boilerplate_docs):
        """The DF cap must not be computed as count().over(partitionBy
        (sh)) — a window partition cannot be split by AQE, so the hot
        shingle's rows would all land on ONE task before the filter.
        Pin (a) no Window node in the plan at all, and (b) no task-level
        row concentration: the pruned frame keeps the input partitioning
        (anti-join is map-side), so per-partition counts stay balanced
        even when one shingle covers the corpus."""
        src = boilerplate_docs.repartition(8, "doc_id")
        pruned = prune_by_df(doc_shingles(src), max_df=5)
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan
        per_part = (
            pruned.withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        total = sum(r["n"] for r in per_part)
        assert max(r["n"] for r in per_part) <= total / 8 * 3  # balanced, no hot task

    def test_strip_segments_has_no_hot_key_window(self, boilerplate_docs):
        """Boilerplate segments appear in ~every doc — the NORMAL
        workload for strip_repeated_segments — so its frequency count
        must be the two-phase agg + broadcast anti-join, never a window
        over the segment key."""
        from swarm_spark.ops.text import strip_repeated_segments

        out = strip_repeated_segments(boilerplate_docs, delim=" ", max_df=5)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan
        assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
        # semantics spot-check: template tokens (DF=N_DOCS) stripped,
        # unique suffixes (DF<=2) survive in order
        row = out.where(F.col("doc_id") == 0).first()
        assert row["text"] == "uniq0a uniq0b uniq0c"

    def test_fallback_shuffle_antijoin_matches_broadcast(self, boilerplate_docs):
        """broadcast_overcap=False (the AQE-skew-splittable fallback for
        a pathological over-cap set) must produce the identical pruned
        frame — only the join strategy differs."""
        s = doc_shingles(boilerplate_docs)
        a = sorted(tuple(r) for r in prune_by_df(s, max_df=5).collect())
        b = sorted(
            tuple(r)
            for r in prune_by_df(s, max_df=5, broadcast_overcap=False).collect()
        )
        assert a == b
        from swarm_spark.ops.text import strip_repeated_segments

        x = sorted(
            tuple(r)
            for r in strip_repeated_segments(
                boilerplate_docs, delim=" ", max_df=5
            ).collect()
        )
        y = sorted(
            tuple(r)
            for r in strip_repeated_segments(
                boilerplate_docs, delim=" ", max_df=5, broadcast_overcap=False
            ).collect()
        )
        assert x == y

    def test_ngram_jaccard_end_to_end_under_skew(self, boilerplate_docs):
        out = ngram_jaccard_pairs(
            boilerplate_docs, threshold=0.99, max_df=5
        ).collect()
        assert {(r["doc_a"], r["doc_b"]) for r in out} == {
            (i, i + N_CLONES) for i in range(N_CLONES)
        }
        assert all(r["jaccard"] == 1.0 for r in out)


class TestHotGroupTopK:
    def test_topk_first_window_is_salted(self, spark):
        """topk_per_group must never window the raw table over the
        3-value group key alone: the first Window's partition spec must
        include the salt so per-task rows stay bounded; the group-only
        window may see only the bounded survivor set."""
        from swarm_spark.classical_queries import q_topk_per_group

        df = q_topk_per_group(spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
        windows = [l for l in plan.splitlines() if "Window [" in l or "Window(" in l]
        assert len(windows) == 2
        # the window that scans the full table carries the salt key
        assert any("salt" in w for w in windows), windows

    def test_topk_output_matches_unsalted_reference(self, spark):
        """Salting must not change the answer: identical to the plain
        one-window formulation on the same data."""
        from pyspark.sql import Window as W

        from swarm_spark.classical_queries import q_topk_per_group
        from swarm_spark.sources.tables import load_table

        sf = "/root/testdata/sf0.001"
        got = [tuple(r) for r in q_topk_per_group(spark, sf).collect()]
        li = load_table(spark, sf, "lineitem")
        cents = F.round(F.col("l_extendedprice") * 100).cast("long")
        w = W.partitionBy("l_returnflag").orderBy(
            F.col("price_cents").desc(), F.col("l_orderkey"), F.col("l_linenumber")
        )
        ref = [
            tuple(r)
            for r in li.select(
                "l_returnflag", "l_orderkey", "l_linenumber", cents.alias("price_cents")
            )
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .where(F.col("rank") <= 3)
            .orderBy("l_returnflag", "rank")
            .collect()
        ]
        assert got == ref


class TestMinhashBandSkew:
    def test_unpruned_band_join_is_quadratic(self, boilerplate_docs):
        # template shingles dominate every signature, so most doc pairs
        # share full bands — the candidate frame itself is the evidence
        n = minhash_lsh_pairs(boilerplate_docs).count()
        assert n >= N_DOCS * (N_DOCS - 1) // 4

    def test_max_df_bounds_band_candidates(self, boilerplate_docs):
        cands = minhash_lsh_pairs(boilerplate_docs, max_df=5).collect()
        pairs = {(r["doc_a"], r["doc_b"]) for r in cands}
        # clone pairs must survive pruning (identical pruned shingle
        # sets => identical signatures => all bands shared) ...
        assert {(i, i + N_CLONES) for i in range(N_CLONES)} <= pairs
        # ... and the candidate volume stays ~clone-sized, not quadratic
        assert len(cands) <= N_CLONES + 5


N_VECS = 400
DIM = 64
N_PLANTED = 5


@pytest.fixture(scope="module")
def one_cell_embeddings(spark):
    """All vectors in ONE cell (label=0): the adversarial case for
    cell-blocked embedding dedup, whose per-cell pair count is
    quadratic in the hottest cell. Planted: 5 identical pairs."""
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((N_VECS, DIM)).astype(np.float32)
    for i in range(N_PLANTED):
        vecs[N_VECS - N_PLANTED + i] = vecs[i]  # identical copy
    rows = [(i, [float(x) for x in vecs[i]], 0) for i in range(N_VECS)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(4)


class TestEmbeddingCellSkew:
    def test_signlsh_candidates_bounded_without_cells(self, one_cell_embeddings):
        # threshold=-1 keeps every candidate, so the output IS the
        # counted candidate frame of the band join
        n_cand = embedding_signlsh_pairs(
            one_cell_embeddings, num_planes=32, bands=4, threshold=-1.0
        ).count()
        quadratic = N_VECS * (N_VECS - 1) // 2
        assert n_cand < quadratic / 10  # bands refine; no cell cap needed
        assert n_cand >= N_PLANTED

    def test_signlsh_finds_planted_pairs(self, one_cell_embeddings):
        out = embedding_signlsh_pairs(
            one_cell_embeddings, num_planes=32, bands=4, threshold=0.98
        ).collect()
        found = {(r["id_a"], r["id_b"]) for r in out}
        planted = {
            (i, N_VECS - N_PLANTED + i) for i in range(N_PLANTED)
        }  # identical vectors agree on every sign plane -> always candidates
        assert planted <= found

    def test_matches_cell_blocked_verifier(self, one_cell_embeddings):
        """The one-cell corpus is exactly where the cell-blocked
        operator degrades to a single quadratic group; at this test
        size it still runs, so use it as the ground-truth verifier:
        sign-LSH's verified pairs must be a subset, and both must
        contain the planted pairs."""
        blocked = {
            (r["id_a"], r["id_b"])
            for r in embedding_dup_pairs(
                one_cell_embeddings, threshold=0.98
            ).collect()
        }
        lsh = {
            (r["id_a"], r["id_b"])
            for r in embedding_signlsh_pairs(
                one_cell_embeddings, num_planes=32, bands=4, threshold=0.98
            ).collect()
        }
        assert lsh <= blocked
        planted = {(i, N_VECS - N_PLANTED + i) for i in range(N_PLANTED)}
        assert planted <= lsh


class TestAnnTopkSkew:
    """ANN ranking must never put one query's full candidate set on a
    single window task: topk_per_query ranks inside (query, salt)
    partitions first, so per-task rows are bounded by N/n_salts."""

    def test_first_window_is_salted(self, spark):
        from swarm_spark.ops.similarity import ann_topk_bruteforce

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        df = ann_topk_bruteforce(emb, emb.limit(4), k=3, n_salts=8)
        plan = df._jdf.queryExecution().executedPlan().toString()
        windows = [l for l in plan.splitlines() if "Window [" in l or "Window(" in l]
        assert len(windows) == 2
        assert any("salt" in w for w in windows), windows

    def test_matches_unsalted_reference_with_ties(self, spark):
        """Salting must not change the answer, including under cosine
        ties (identical vectors) where the id tie-break decides rank."""
        from pyspark.sql import Window as W

        from swarm_spark.ops.dedup import dot_expr
        from swarm_spark.ops.similarity import ann_topk_bruteforce

        # 3 groups of identical vectors -> every cos within a group ties
        rows = [(i, [float(i % 3), 1.0, float((i % 3) * 2)]) for i in range(30)]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        got = [
            tuple(r)
            for r in ann_topk_bruteforce(
                emb, emb.limit(6), k=5, n_salts=7
            ).collect()
        ]

        q = emb.limit(6).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qv"),
            dot_expr("embedding", "embedding").alias("qn2"),
        )
        c = emb.select(
            F.col("vec_id").alias("id"),
            F.col("embedding").alias("cv"),
            dot_expr("embedding", "embedding").alias("cn2"),
        )
        w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("id"))
        ref = [
            tuple(r)
            for r in c.crossJoin(F.broadcast(q))
            .where(F.col("query_id") != F.col("id"))
            .select(
                "query_id",
                "id",
                F.round(
                    dot_expr("qv", "cv") / F.sqrt(F.col("qn2") * F.col("cn2")), 9
                ).alias("cos"),
            )
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .where(F.col("rank") <= 5)
            .orderBy("query_id", "rank")
            .collect()
        ]
        assert got == ref

    def test_matches_unsalted_reference_randomized(self, spark):
        """Fixed-seed random vectors, several salt counts: the salted
        ranking must equal the naive single-window ranking exactly."""
        from pyspark.sql import Window as W

        from swarm_spark.ops.dedup import dot_expr
        from swarm_spark.ops.similarity import ann_topk_bruteforce

        rng = np.random.RandomState(7)
        rows = [(i, [float(x) for x in rng.randn(8)]) for i in range(120)]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        q = emb.where(F.col("vec_id") % 17 == 0)

        qq = q.select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qv"),
            dot_expr("embedding", "embedding").alias("qn2"),
        )
        c = emb.select(
            F.col("vec_id").alias("id"),
            F.col("embedding").alias("cv"),
            dot_expr("embedding", "embedding").alias("cn2"),
        )
        w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("id"))
        ref = [
            tuple(r)
            for r in c.crossJoin(F.broadcast(qq))
            .where(F.col("query_id") != F.col("id"))
            .select(
                "query_id",
                "id",
                F.round(
                    dot_expr("qv", "cv") / F.sqrt(F.col("qn2") * F.col("cn2")), 9
                ).alias("cos"),
            )
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .where(F.col("rank") <= 4)
            .orderBy("query_id", "rank")
            .collect()
        ]
        for n_salts in (1, 3, 16):
            got = [
                tuple(r)
                for r in ann_topk_bruteforce(emb, q, k=4, n_salts=n_salts).collect()
            ]
            assert got == ref, f"n_salts={n_salts}"


class TestTfidfSkew:
    def test_first_window_is_salted(self, spark, sf_dir):
        """tfidf's per-stratum ranking must never window the raw
        scored-vocab frame on the stratum alone: phase 1 carries the
        salt; the stratum-only window sees only the bounded survivor
        set."""
        from swarm_spark.ops.text import tfidf_top_terms
        from swarm_spark.sources.tables import load_table

        df = tfidf_top_terms(load_table(spark, sf_dir, "documents"), top_k=5)
        plan = df._jdf.queryExecution().executedPlan().toString()
        windows = [l for l in plan.splitlines() if "Window [" in l or "Window(" in l]
        assert len(windows) == 2
        assert any("salt" in w for w in windows), windows
