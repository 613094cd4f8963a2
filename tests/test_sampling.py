"""Deterministic hash sampling: partition-layout invariance,
composability, split stability, and fraction accuracy."""

from __future__ import annotations

from contextlib import contextmanager

import pytest
from pyspark.sql import functions as F

from swarm_spark.ops import hash_sample, split_column, stratified_hash_sample


@contextmanager
def _action_counter():
    """Count DataFrame actions (count/collect/first/head) triggered
    inside the block — sizing actions at plan-CONSTRUCTION time, each a
    full scan at 100 TB. Job counting would be AQE-stage-dependent;
    action counting pins intent exactly."""
    # patch the CONCRETE class (Spark 4's classic DataFrame overrides
    # the unified pyspark.sql.DataFrame methods, so patching the base
    # would never fire)
    from pyspark.sql.classic.dataframe import DataFrame

    calls = {"count": 0, "collect": 0, "first": 0, "head": 0}
    orig = {k: getattr(DataFrame, k) for k in calls}

    def wrap(name):
        def f(self, *a, **kw):
            calls[name] += 1
            return orig[name](self, *a, **kw)

        return f

    for k in calls:
        setattr(DataFrame, k, wrap(k))
    try:
        yield calls
    finally:
        for k, v in orig.items():
            setattr(DataFrame, k, v)


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


class TestStratifiedCap:
    def _df(self, spark, n=3000):
        return spark.range(0, n).select(
            F.col("id"),
            F.element_at(
                F.array(F.lit("a"), F.lit("b"), F.lit("c")),
                (F.col("id") % 3 + 1).cast("int"),
            ).alias("s"),
        )

    def test_exact_counts_per_stratum(self, spark):
        from swarm_spark.ops import stratified_cap

        out = stratified_cap(self._df(spark), "s", cap=7, key="id")
        counts = {r["s"]: r["n"] for r in
                  out.groupBy("s").agg(F.count(F.lit(1)).alias("n")).collect()}
        assert counts == {"a": 7, "b": 7, "c": 7}
        assert out.where(F.col("rk") > 7).count() == 0

    def test_partition_layout_invariant(self, spark):
        from swarm_spark.ops import stratified_cap

        a = stratified_cap(self._df(spark).repartition(13), "s", cap=5, key="id")
        b = stratified_cap(self._df(spark).coalesce(1), "s", cap=5, key="id")
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    def test_kept_set_stable_as_other_strata_grow(self, spark):
        """Adding docs to stratum 'c' must not change which 'a' docs
        are kept — membership is a pure function of the records."""
        from swarm_spark.ops import stratified_cap

        small = self._df(spark, 1500)
        grown = small.unionByName(
            spark.range(100000, 101000).select(F.col("id"), F.lit("c").alias("s"))
        )
        kept_small = {r["id"] for r in
                      stratified_cap(small, "s", 5, "id").where(F.col("s") == "a").collect()}
        kept_grown = {r["id"] for r in
                      stratified_cap(grown, "s", 5, "id").where(F.col("s") == "a").collect()}
        assert kept_small == kept_grown

    def test_cap_none_balances_to_min(self, spark):
        from swarm_spark.ops import stratified_cap

        df = self._df(spark, 3000).where(
            (F.col("s") != "b") | (F.col("id") < 30)  # 'b' has 10 rows
        )
        out = stratified_cap(df, "s", cap=None, key="id")
        counts = {r["s"]: r["n"] for r in
                  out.groupBy("s").agg(F.count(F.lit(1)).alias("n")).collect()}
        assert counts == {"a": 10, "b": 10, "c": 10}

    def test_first_window_is_salted(self, spark):
        from swarm_spark.ops import stratified_cap

        df = stratified_cap(self._df(spark), "s", cap=5, key="id", n_salts=8)
        plan = df._jdf.queryExecution().executedPlan().toString()
        windows = [l for l in plan.splitlines() if "Window [" in l or "Window(" in l]
        assert len(windows) == 2
        assert any("salt" in w for w in windows), windows

    def test_bad_cap_rejected(self, spark):
        from swarm_spark.ops import stratified_cap

        with pytest.raises(ValueError):
            stratified_cap(self._df(spark), "s", cap=0, key="id")


class TestKnnClassify:
    def test_majority_and_tiebreak(self, spark):
        """4 identical 'label 1' vectors, 4 identical 'label 2' vectors
        slightly off, plus a query equidistant-ish: with k=4 nearest all
        label-1, prediction is 1; with a manufactured 2-2 vote the
        smaller label wins."""
        from swarm_spark.ops.similarity import knn_classify

        rows = [
            # two exact clusters
            (0, [1.0, 0.0], 1), (1, [1.0, 0.0], 1),
            (2, [0.0, 1.0], 2), (3, [0.0, 1.0], 2),
            # query vector equally similar to both clusters
            (9, [1.0, 1.0], 0),
        ]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
        out = knn_classify(emb, emb.where(F.col("vec_id") == 9), k=4).collect()
        assert len(out) == 1
        # 2 votes each for labels 1 and 2 -> tie -> smaller label
        assert out[0]["pred_label"] == 1 and out[0]["votes"] == 2


class TestTokenBudgetSample:
    def _docs(self, spark):
        rows = []
        # 'a': 20 docs x 10 tokens; 'b': 3 docs x 100 tokens; 'c': one
        # giant doc (300 tokens) that alone exceeds the budget
        for i in range(20):
            rows.append((f"a{i:02d}", "a", " ".join(["t"] * 10)))
        for i in range(3):
            rows.append((f"b{i}", "b", " ".join(["t"] * 100)))
        rows.append(("c0", "c", " ".join(["t"] * 300)))
        return spark.createDataFrame(rows, "doc_id string, s string, text string")

    def test_budget_semantics(self, spark):
        from swarm_spark.ops.sampling import hash_bucket, token_budget_sample

        df = self._docs(spark)
        out = token_budget_sample(df, "s", budget=95, key="doc_id").collect()
        by_s = {}
        for r in out:
            by_s.setdefault(r["s"], []).append(r)
        # every kept doc STARTS before the budget line
        for rws in by_s.values():
            for r in rws:
                assert r["cum_tok"] - r["n_tok"] < 95
        # stratum a: 10-token docs -> exactly ceil(95/10) = 10 kept
        assert len(by_s["a"]) == 10
        assert max(r["cum_tok"] for r in by_s["a"]) == 100
        # stratum b: first 100-token doc crosses the line alone
        assert len(by_s["b"]) == 1
        # oversized single doc still kept (>= 1 doc per stratum)
        assert len(by_s["c"]) == 1 and by_s["c"][0]["n_tok"] == 300
        # the kept set is the hash-order prefix
        order = sorted(
            (r["doc_id"] for r in df.where("s = 'a'").collect()),
            key=lambda d: (
                df.sparkSession.range(1)
                .select(hash_bucket(F.lit(d), "swarm-budget").alias("b"))
                .head()["b"],
                d,
            ),
        )
        assert sorted(r["doc_id"] for r in by_s["a"]) == sorted(order[:10])

    def test_partition_invariant(self, spark):
        from swarm_spark.ops.sampling import token_budget_sample

        df = self._docs(spark)
        a = {
            (r["doc_id"], r["cum_tok"])
            for r in token_budget_sample(df, "s", 95, "doc_id").collect()
        }
        b = {
            (r["doc_id"], r["cum_tok"])
            for r in token_budget_sample(
                df.repartition(7), "s", 95, "doc_id", n_ranges=3
            ).collect()
        }
        assert a == b

    def test_two_phase_matches_naive_window(self, spark):
        from pyspark.sql import Window
        from swarm_spark.ops.sampling import hash_bucket, token_budget_sample

        df = self._docs(spark)
        w = Window.partitionBy("s").orderBy(hash_bucket("doc_id", "swarm-budget"), "doc_id")
        naive = (
            df.withColumn("n_tok", F.size(F.split("text", " +")).cast("long"))
            .withColumn("cum_tok", F.sum("n_tok").over(w))
            .where(F.col("cum_tok") - F.col("n_tok") < 95)
        )
        expect = {(r["doc_id"], r["cum_tok"]) for r in naive.collect()}
        got = {
            (r["doc_id"], r["cum_tok"])
            for r in token_budget_sample(df, "s", 95, "doc_id", n_ranges=4).collect()
        }
        assert got == expect

    def test_bad_budget_rejected(self, spark):
        from swarm_spark.ops.sampling import token_budget_sample

        with pytest.raises(ValueError):
            token_budget_sample(self._docs(spark), "s", 0, "doc_id")


class TestMixturePlan:
    def test_hand_case(self, spark):
        from swarm_spark.ops.sampling import mixture_plan

        rows = [
            ("d1", "en", " ".join(["t"] * 900)),
            ("d2", "de", " ".join(["t"] * 100)),
            ("d3", "de", " ".join(["t"] * 100)),
        ]
        df = spark.createDataFrame(rows, "doc_id string, lang string, text string")
        out = {
            r["lang"]: r
            for r in mixture_plan(
                df, "lang", {"en": 800_000, "de": 200_000}
            ).collect()
        }
        # en caps the mix: floor(900e6/8e5) = 1125 < floor(200e6/2e5) = 1000?
        # no: de cap = floor(200*1e6/200000) = 1000 -> budget 1000
        assert out["en"]["budget_tokens"] == 1000
        assert out["en"]["take_tokens"] == 800
        assert out["de"]["take_tokens"] == 200
        assert out["de"]["tokens_avail"] == 200

    def test_unweighted_stratum_excluded_and_bad_ppm(self, spark):
        from swarm_spark.ops.sampling import mixture_plan

        df = spark.createDataFrame(
            [("d1", "en", "t t"), ("d2", "xx", "t")],
            "doc_id string, lang string, text string",
        )
        out = mixture_plan(df, "lang", {"en": 1_000_000}).collect()
        assert [r["lang"] for r in out] == ["en"]
        with pytest.raises(ValueError):
            mixture_plan(df, "lang", {"en": 0})


class TestSampleToMixture:
    def test_allocations_respected(self, spark):
        from swarm_spark.ops.sampling import mixture_plan, sample_to_mixture

        rows = []
        for i in range(30):
            rows.append((f"e{i:02d}", "en", " ".join(["t"] * 20)))
        for i in range(10):
            rows.append((f"d{i:02d}", "de", " ".join(["t"] * 20)))
        df = spark.createDataFrame(rows, "doc_id string, lang string, text string")
        weights = {"en": 600_000, "de": 400_000}
        plan = {r["lang"]: r for r in mixture_plan(df, "lang", weights).collect()}
        # de caps: floor(200e6/4e5) = 500 -> en take 300, de take 200
        assert plan["de"]["budget_tokens"] == 500
        out = sample_to_mixture(df, "lang", weights, key="doc_id").collect()
        toks = {}
        for r in out:
            toks[r["lang"]] = toks.get(r["lang"], 0) + r["n_tok"]
        # prefix rule: total stops within one doc past the allocation
        assert 300 <= toks["en"] < 300 + 20
        assert 200 <= toks["de"] < 200 + 20
        for r in out:
            assert r["cum_tok"] - r["n_tok"] < plan[r["lang"]]["take_tokens"]

    def test_unweighted_stratum_dropped(self, spark):
        from swarm_spark.ops.sampling import sample_to_mixture

        df = spark.createDataFrame(
            [("a", "en", "t t t"), ("b", "xx", "t t t")],
            "doc_id string, lang string, text string",
        )
        out = sample_to_mixture(df, "lang", {"en": 1_000_000}, key="doc_id").collect()
        assert {r["lang"] for r in out} == {"en"}


class TestConstructionActions:
    """VERDICT r6 #5: sizing count() actions at plan-construction time
    are full scans at 100 TB. Pin each operator's construction-time
    ACTION budget so a redundant action can't silently come back (the
    scan-budget sweep only sees the RETURNED plan, not side actions)."""

    def _docs(self, spark):
        return spark.createDataFrame(
            [(i, f"lang{i % 3}", "tok " * (5 + i % 7)) for i in range(60)],
            "doc_id long, lang string, text string",
        )

    def test_token_budget_sample_constructs_with_one_action(self, spark):
        from swarm_spark.ops.sampling import token_budget_sample

        docs = self._docs(spark)
        with _action_counter() as calls:
            df = token_budget_sample(docs, "lang", 50, key="doc_id")
        # exactly the subtotal collect — the n_ranges sizing count is gone
        assert calls == {"count": 0, "collect": 1, "first": 0, "head": 0}, calls
        assert df.count() > 0

    def test_stratified_cap_balance_path_constructs_with_one_action(self, spark):
        from swarm_spark.ops.sampling import stratified_cap

        docs = self._docs(spark)
        with _action_counter() as calls:
            df = stratified_cap(docs, "lang", None, key="doc_id")
        # the stratum-count pass doubles as the salt-sizing row count
        assert calls == {"count": 0, "collect": 1, "first": 0, "head": 0}, calls
        assert df.count() > 0

    def test_stratified_cap_hint_skips_the_sizing_count(self, spark):
        from swarm_spark.ops.sampling import stratified_cap

        docs = self._docs(spark)
        with _action_counter() as calls:
            stratified_cap(docs, "lang", 5, key="doc_id", approx_rows=60)
        assert sum(calls.values()) == 0, calls

    def test_pack_bins_hint_skips_the_sizing_count(self, spark):
        from swarm_spark.ops.packing import pack_greedy_bins

        docs = self._docs(spark)
        with _action_counter() as calls:
            pack_greedy_bins(docs, capacity=64, approx_rows=60)
        assert sum(calls.values()) == 0, calls

    def test_token_prefix_hint_constructs_with_one_action(self, spark):
        from swarm_spark.ops.packing import token_prefix

        docs = self._docs(spark)
        with _action_counter() as calls:
            # boundary sample collect + subtotal collect stay (they ARE
            # the range partitioner); the row-sizing count is skipped
            token_prefix(docs, approx_rows=60)
        assert calls["count"] == 0 and calls["collect"] == 2, calls


class TestGlobalShuffleOrder:
    def test_total_permutation_and_invariance(self, spark):
        from swarm_spark.ops.sampling import global_shuffle_order

        df = spark.range(2000).select(F.col("id"))
        out = global_shuffle_order(df, "id")
        rows = out.collect()
        assert sorted(r["pos"] for r in rows) == list(range(2000))
        # partition-layout invariant: same permutation at any layout
        again = {
            r["id"]: r["pos"]
            for r in global_shuffle_order(df.repartition(17), "id").collect()
        }
        assert {r["id"]: r["pos"] for r in rows} == again
        # looks shuffled: not the identity or a near-sorted order
        by_pos = [r["id"] for r in sorted(rows, key=lambda r: r["pos"])]
        asc = sum(1 for a, b in zip(by_pos, by_pos[1:]) if a < b)
        assert 0.4 < asc / (len(by_pos) - 1) < 0.6  # ~random rises

    def test_seed_changes_permutation(self, spark):
        from swarm_spark.ops.sampling import global_shuffle_order

        df = spark.range(500).select(F.col("id"))
        a = {r["id"]: r["pos"] for r in global_shuffle_order(df, "id").collect()}
        b = {
            r["id"]: r["pos"]
            for r in global_shuffle_order(df, "id", seed="epoch-2").collect()
        }
        assert a != b
        assert sorted(b.values()) == list(range(500))

    def test_membership_prefix_is_resume_stable(self, spark):
        """A run that stopped at pos < k resumes against the same
        prefix: positions are a pure function of records, so removing
        NO rows and rerunning yields byte-identical order."""
        from swarm_spark.ops.sampling import global_shuffle_order

        df = spark.range(300).select(F.col("id"))
        first = sorted(
            (r["pos"], r["id"]) for r in global_shuffle_order(df, "id").collect()
        )[:100]
        second = sorted(
            (r["pos"], r["id"]) for r in global_shuffle_order(df, "id").collect()
        )[:100]
        assert first == second

    def test_construction_runs_one_action(self, spark):
        from swarm_spark.ops.sampling import global_shuffle_order

        df = spark.range(100).select(F.col("id"))
        with _action_counter() as calls:
            global_shuffle_order(df, "id")
        assert calls == {"count": 0, "collect": 1, "first": 0, "head": 0}, calls

    def test_bad_ranges(self, spark):
        from swarm_spark.ops.sampling import global_shuffle_order

        df = spark.range(5).select(F.col("id"))
        with pytest.raises(ValueError):
            global_shuffle_order(df, "id", n_ranges=0)

    def test_output_invariant_across_range_counts(self, spark):
        """n_ranges is a parallelism knob ONLY: auto-sized, hinted via
        approx_rows, and any explicit value (power of two or not) all
        produce the identical permutation (r7 VERDICT task #1)."""
        from swarm_spark.ops.sampling import global_shuffle_order

        df = spark.range(1500).select(F.col("id"))
        base = {
            r["id"]: r["pos"] for r in global_shuffle_order(df, "id").collect()
        }
        for kw in (
            {"n_ranges": 1},
            {"n_ranges": 7},
            {"n_ranges": 4096},
            {"approx_rows": 1500},
            {"approx_rows": 10**12},  # derives a large power-free count
        ):
            got = {
                r["id"]: r["pos"]
                for r in global_shuffle_order(df, "id", **kw).collect()
            }
            assert got == base, f"permutation changed under {kw}"

    def test_range_count_scales_with_corpus(self, spark):
        """The sizing rule mirrors _salts_for: ~2M rows per range with
        a 1024 floor — derived from approx_rows with no extra action,
        and from the offsets count pass when no hint is given."""
        from swarm_spark.ops import sampling
        from swarm_spark.ops.sampling import global_shuffle_order

        df = spark.range(200).select(F.col("id"))
        with _action_counter() as calls:
            out = global_shuffle_order(df, "id", approx_rows=10_000_000_000)
        assert calls["count"] == 0 and calls["collect"] == 1, calls
        # 10G rows / 2M target = 5000 ranges — visible as the offsets
        # join's granularity cap (tiny corpus: ranges hold <= 1 row)
        assert sorted(r["pos"] for r in out.collect()) == list(range(200))
        # the no-hint auto path folds the fine count grid to the floor
        # for a small corpus and still runs exactly one action
        with _action_counter() as calls:
            global_shuffle_order(df, "id")
        assert calls["count"] == 0 and calls["collect"] == 1, calls


class TestWeightedSample:
    def _docs(self, spark):
        # weights 1..200: total 20100; n_target 50 keeps ~50
        rows = [(i, i) for i in range(1, 201)]
        return spark.createDataFrame(rows, "id long, w long")

    def test_inclusion_tracks_weight(self, spark):
        from swarm_spark.ops.sampling import weighted_sample

        df = self._docs(spark)
        kept = weighted_sample(df, "w", "id", n_target=50).collect()
        assert 25 <= len(kept) <= 80  # ~50 expected, binomial spread
        # the kept set is weight-biased: its mean weight beats the corpus mean
        assert sum(r["w"] for r in kept) / len(kept) > 100.5

    def test_partitioning_invariant_and_total_weight_passthrough(self, spark):
        from swarm_spark.ops.sampling import weighted_sample

        df = self._docs(spark)
        a = sorted(r["id"] for r in weighted_sample(df, "w", "id", 50).collect())
        b = sorted(
            r["id"]
            for r in weighted_sample(df.repartition(13), "w", "id", 50).collect()
        )
        c = sorted(
            r["id"]
            for r in weighted_sample(df, "w", "id", 50, total_weight=20100).collect()
        )
        assert a == b == c

    def test_zero_weight_never_kept_and_saturated_always_kept(self, spark):
        from swarm_spark.ops.sampling import weighted_sample

        df = spark.createDataFrame([(1, 0), (2, 5), (3, 5)], "id long, w long")
        kept = {r["id"] for r in weighted_sample(df, "w", "id", 1000).collect()}
        assert kept == {2, 3}  # P saturates at 1 for w>0; w=0 is P=0

    def test_validation(self, spark):
        from swarm_spark.ops.sampling import weighted_sample

        df = self._docs(spark)
        with pytest.raises(ValueError):
            weighted_sample(df, "w", "id", 0)
        with pytest.raises(ValueError):
            weighted_sample(df, "w", "id", 10, total_weight=0)


class TestTemperatureSample:
    def _docs(self, spark):
        # strata sizes 400/100/16 -> sqrt scale 20/10/4, sum 34
        rows = (
            [(i, "big") for i in range(400)]
            + [(1000 + i, "mid") for i in range(100)]
            + [(2000 + i, "rare") for i in range(16)]
        )
        return spark.createDataFrame(rows, "id long, lang string")

    def test_quotas_integer_exact(self, spark):
        from swarm_spark.ops.sampling import temperature_quotas

        q = {
            r["lang"]: (r["n_docs"], r["quota"])
            for r in temperature_quotas(self._docs(spark), "lang", 34).collect()
        }
        # budget == sum of sqrt scales: quotas are exactly the scales
        assert q == {"big": (400, 20), "mid": (100, 10), "rare": (16, 4)}

    def test_flattening_vs_proportional(self, spark):
        from swarm_spark.ops.sampling import temperature_quotas

        q = {
            r["lang"]: r["quota"]
            for r in temperature_quotas(self._docs(spark), "lang", 100).collect()
        }
        # proportional would give big 400/516=77%; sqrt damps it to ~59%
        # and lifts rare from 3.1% of the corpus to ~11% of the sample
        assert q["big"] <= 60 and q["rare"] >= 10
        assert sum(q.values()) <= 100

    def test_sample_meets_quotas_exactly_and_is_stable(self, spark):
        from swarm_spark.ops.sampling import sample_temperature, temperature_quotas

        df = self._docs(spark)
        want = {
            r["lang"]: r["quota"]
            for r in temperature_quotas(df, "lang", 100).collect()
            if r["quota"] >= 1
        }
        out = sample_temperature(df, "lang", "id", 100).collect()
        got: dict[str, int] = {}
        for r in out:
            got[r["lang"]] = got.get(r["lang"], 0) + 1
        assert got == want
        # ranks are 1..quota within each stratum
        ranks: dict[str, list[int]] = {}
        for r in out:
            ranks.setdefault(r["lang"], []).append(r["rk"])
        assert all(sorted(v) == list(range(1, len(v) + 1)) for v in ranks.values())
        # partition-invariant, salt-count-invariant
        b = sample_temperature(df.repartition(17), "lang", "id", 100, n_salts=5)
        assert sorted((r["lang"], r["id"], r["rk"]) for r in out) == sorted(
            (r["lang"], r["id"], r["rk"]) for r in b.collect()
        )

    def test_validation(self, spark):
        from swarm_spark.ops.sampling import sample_temperature, temperature_quotas

        df = self._docs(spark)
        with pytest.raises(ValueError):
            temperature_quotas(df, "lang", 0)
        with pytest.raises(ValueError):
            sample_temperature(df, "lang", "id", 0)


class TestWeightedSampleExact:
    def _docs(self, spark):
        rows = [(i, 1 if i < 180 else 50) for i in range(200)]
        return spark.createDataFrame(rows, "id long, w long")

    def test_exact_size_and_weight_bias(self, spark):
        from swarm_spark.ops.sampling import weighted_sample_exact

        kept = weighted_sample_exact(self._docs(spark), "w", "id", 40).collect()
        assert len(kept) == 40
        # 20 heavy rows (w=50) vs 180 light (w=1): heavies dominate
        heavies = sum(1 for r in kept if r["w"] == 50)
        assert heavies >= 15

    def test_partition_and_salt_invariant(self, spark):
        from swarm_spark.ops.sampling import weighted_sample_exact

        df = self._docs(spark)
        a = sorted(r["id"] for r in weighted_sample_exact(df, "w", "id", 25).collect())
        b = sorted(
            r["id"]
            for r in weighted_sample_exact(
                df.repartition(13), "w", "id", 25, n_salts=5
            ).collect()
        )
        assert a == b

    def test_zero_weight_excluded_and_n_saturates(self, spark):
        from swarm_spark.ops.sampling import weighted_sample_exact

        df = spark.createDataFrame([(1, 0), (2, 3), (3, 7)], "id long, w long")
        kept = {r["id"] for r in weighted_sample_exact(df, "w", "id", 10).collect()}
        assert kept == {2, 3}

    def test_validation(self, spark):
        from swarm_spark.ops.sampling import weighted_sample_exact

        with pytest.raises(ValueError):
            weighted_sample_exact(self._docs(spark), "w", "id", 0)
        with pytest.raises(ValueError):
            weighted_sample_exact(self._docs(spark), "w", "id", 5, n_salts=0)
