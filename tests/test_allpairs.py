"""All-pairs TF-IDF cosine: candidate gating, scoring, determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from swarm_spark.ops.allpairs import tfidf_cosine_pairs, tfidf_postings


def _docs(spark):
    rows = [
        (1, "quantum flux capacitor drives the temporal array"),
        (2, "quantum flux capacitor drives the spatial array"),  # near-dup of 1
        (3, "grilled cheese sandwich recipe with extra cheese"),
        (4, "cheese sandwich recipe grilled with extra cheese"),  # near-dup of 3
        (5, "the and of with totally unrelated verbiage here"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestTfidfPostings:
    def test_prunes_unpairable_and_stopword_terms(self, spark):
        post = tfidf_postings(_docs(spark), max_df=3).collect()
        toks = {r["tok"] for r in post}
        # df=1 terms can never pair: pruned
        assert "temporal" not in toks and "spatial" not in toks
        # 'the' has df 3 <= cap: kept but with low idf; raise the cap
        # bar and it goes too
        tight = {r["tok"] for r in tfidf_postings(_docs(spark), max_df=2).collect()}
        assert "the" not in tight
        assert "quantum" in toks and "cheese" in toks

    def test_weights_are_tf_times_idf_milli(self, spark):
        import math

        post = {
            (r["id"], r["tok"]): r["w"]
            for r in tfidf_postings(_docs(spark), max_df=4).collect()
        }
        # 'cheese' appears twice in docs 3 and 4 (tf=2), df=2, N=5
        idf = round(math.log(5 / 2) * 1000)
        assert post[(3, "cheese")] == 2 * idf
        assert post[(4, "cheese")] == 2 * idf

    def test_empty_text_contributes_no_terms(self, spark):
        # split('') yields [''] — two empty docs must NOT pair at
        # cosine 1.0 on the empty-string "term" (the gram view of a
        # <n-token doc is the empty string)
        rows = [(1, ""), (2, ""), (3, "alpha beta"), (4, "alpha beta")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        post = tfidf_postings(df, max_df=4).collect()
        assert all(len(r["tok"]) > 0 for r in post)
        pairs = {
            (r["a"], r["b"])
            for r in tfidf_cosine_pairs(df, threshold_micro=500_000, max_df=4).collect()
        }
        assert pairs == {(3, 4)}

    def test_validation(self, spark):
        with pytest.raises(ValueError):
            tfidf_postings(_docs(spark), max_df=1)
        with pytest.raises(ValueError):
            tfidf_cosine_pairs(_docs(spark), threshold_micro=0)


class TestTfidfCosinePairs:
    def test_finds_planted_pairs_only(self, spark):
        pairs = {
            (r["a"], r["b"]): r["cos_micro"]
            for r in tfidf_cosine_pairs(
                _docs(spark), threshold_micro=500_000, max_df=4
            ).collect()
        }
        assert set(pairs) == {(1, 2), (3, 4)}
        assert all(500_000 <= v <= 1_000_000 for v in pairs.values())

    def test_identical_docs_score_exactly_one(self, spark):
        rows = [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"),
                (3, "alpha beta something else")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        pairs = {
            (r["a"], r["b"]): r["cos_micro"]
            for r in tfidf_cosine_pairs(df, threshold_micro=100_000, max_df=3).collect()
        }
        assert pairs[(1, 2)] == 1_000_000

    def test_partitioning_invariant(self, spark):
        docs = _docs(spark)
        a = sorted(map(tuple, tfidf_cosine_pairs(docs, 400_000, max_df=4).collect()))
        b = sorted(
            map(
                tuple,
                tfidf_cosine_pairs(docs.repartition(7), 400_000, max_df=4).collect(),
            )
        )
        assert a == b

    def test_n_docs_passthrough_skips_count(self, spark):
        docs = _docs(spark)
        got = sorted(
            map(
                tuple,
                tfidf_cosine_pairs(docs, 400_000, max_df=4, n_docs=5).collect(),
            )
        )
        want = sorted(map(tuple, tfidf_cosine_pairs(docs, 400_000, max_df=4).collect()))
        assert got == want

    def test_no_shared_kept_term_no_candidate(self, spark):
        # docs sharing ONLY a df-capped stopword never materialize
        rows = [(1, "the aaa bbb"), (2, "the ccc ddd"), (3, "the eee fff"),
                (4, "aaa bbb xyz"), (5, "ccc ddd xyz")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        pairs = tfidf_cosine_pairs(df, 1, max_df=2).select("a", "b").collect()
        got = {(r["a"], r["b"]) for r in pairs}
        # 'the' (df=3) is pruned at max_df=2 -> (1,2),(1,3),(2,3) only
        # pair through real shared vocab
        assert (1, 4) in got and (2, 5) in got and (4, 5) in got
        assert (1, 2) not in got and (1, 3) not in got and (2, 3) not in got


class TestAutoMaxDf:
    def test_floats_up_on_sparse_vocab(self, spark):
        # 60 docs of doc-unique vocabulary: every df = 1 -> candidate
        # estimate tiny at ANY cap -> the cap rides the budget up
        from swarm_spark.ops.allpairs import auto_allpairs_max_df

        rows = [(i, f"u{i}a u{i}b u{i}c u{i}d") for i in range(60)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        assert auto_allpairs_max_df(df, floor=4) >= 64

    def test_held_down_on_saturated_vocab(self, spark):
        # 200 docs over a 4-token vocabulary: every df ~ N -> the
        # linear budget admits only a small cap (never ∝ N)
        from swarm_spark.ops.allpairs import auto_allpairs_max_df

        rows = [(i, "aa bb cc dd") for i in range(200)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        cap = auto_allpairs_max_df(df, floor=4)
        assert cap <= 64  # sqrt-budget scale, far below N=200

    def test_auto_mode_wires_through(self, spark):
        from swarm_spark.ops.allpairs import tfidf_cosine_pairs

        docs = _docs(spark)
        auto = sorted(
            map(tuple, tfidf_cosine_pairs(docs, 400_000, max_df="auto").collect())
        )
        # on this tiny sparse corpus auto floats above every df, so it
        # matches a generous manual cap exactly
        manual = sorted(
            map(tuple, tfidf_cosine_pairs(docs, 400_000, max_df=100).collect())
        )
        assert auto == manual and auto

    def test_rejects_bad_cap(self, spark):
        from swarm_spark.ops.allpairs import tfidf_postings

        with pytest.raises(ValueError):
            tfidf_postings(_docs(spark), max_df="nope")
