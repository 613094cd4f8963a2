"""Semantics tests for the training-data operators (beyond the oracle
hash checks): known-answer cases on tiny hand-built frames."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from swarm_spark.ops import (
    ann_topk_bruteforce,
    attach_fake_image,
    exact_dedup,
    media_features,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
    simhash_pairs_blocked,
    token_stats,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),  # near-dup of 1
        (3, "completely different content about spark engines here"),
        (4, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestExactDedup:
    def test_keeps_lowest_id(self, docs):
        out = exact_dedup(docs)
        assert sorted(r["doc_id"] for r in out.collect()) == [1, 2, 3]


class TestJaccard:
    def test_near_dup_found_exact_dup_is_one(self, docs):
        pairs = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
        }
        assert pairs[(1, 4)] == 1.0  # exact dup
        assert 0.5 <= pairs[(1, 2)] < 1.0  # near dup shares most shingles
        assert (1, 3) not in pairs


class TestMinhashLSH:
    def test_exact_dup_shares_all_bands(self, docs):
        pairs = {
            (r["doc_a"], r["doc_b"]): (r["shared_bands"], r["est_jaccard"])
            for r in minhash_lsh_pairs(docs, num_perm=12, bands=4).collect()
        }
        assert pairs[(1, 4)] == (4, 1.0)
        assert (1, 3) not in pairs  # no shared band for unrelated docs


class TestSimhash:
    def test_exact_dup_distance_zero(self, docs):
        pairs = {
            (r["doc_a"], r["doc_b"]): r["hamming"]
            for r in simhash_pairs(docs, bits=32, max_hamming=32).collect()
        }
        assert pairs[(1, 4)] == 0
        assert pairs[(1, 2)] < pairs[(1, 3)]  # near-dup closer than unrelated

    def test_blocked_variant_is_exact(self, docs):
        # pigeonhole blocking must reproduce the cross join bit-for-bit
        for bits, maxh in ((32, 3), (16, 3), (32, 8)):
            cross = sorted(
                tuple(r) for r in simhash_pairs(docs, bits=bits, max_hamming=maxh).collect()
            )
            blocked = sorted(
                tuple(r)
                for r in simhash_pairs_blocked(docs, bits=bits, max_hamming=maxh).collect()
            )
            assert blocked == cross


class TestTokenStats:
    def test_counts(self, docs):
        r = {x["doc_id"]: x for x in token_stats(docs).collect()}
        assert r[1]["n_tokens"] == 9
        assert r[1]["n_distinct_tokens"] == 8  # 'the' twice
        assert r[1]["n_chars"] == len("the quick brown fox jumps over the lazy dog")


class TestAnn:
    def test_self_similarity_excluded_and_identical_vector_top1(self, spark):
        rows = [
            (0, [1.0, 0.0, 0.0], 0),
            (1, [1.0, 0.0, 0.0], 0),  # identical to 0
            (2, [0.0, 1.0, 0.0], 0),
            (3, [0.7, 0.7, 0.0], 0),
        ]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
        q = emb.where(F.col("vec_id") == 0)
        out = ann_topk_bruteforce(emb, q, k=3).collect()
        assert [r["id"] for r in out] == [1, 3, 2]
        assert out[0]["cos"] == 1.0
        assert all(r["query_id"] == 0 for r in out)


class TestMultimodal:
    def test_features_roundtrip(self, docs):
        media = attach_fake_image(docs)
        assert dict(media.dtypes)["media"] == "binary"
        feats = {r["doc_id"]: r for r in media_features(media).collect()}
        assert feats[1]["header"] == b"SWIM".hex()
        assert feats[1]["n_bytes"] == 14 + len("the quick brown fox jumps over the lazy dog")
        assert 1 <= feats[1]["width"] <= 1920 and 1 <= feats[1]["height"] <= 1080
        # identical content → identical digest/dims (deterministic)
        assert feats[1]["digest"] == feats[4]["digest"]

    def test_resize_scales_dims_and_block_averages(self, spark):
        from swarm_spark.ops.multimodal import (
            attach_fake_video,
            media_features,
            resize_media,
            sample_frames,
        )

        docs = spark.createDataFrame(
            [(1, "abcdefgh")], "doc_id long, text string"
        )
        media = attach_fake_image(docs)
        orig = media_features(media).collect()[0]
        small = resize_media(media, factor=2)
        feats = media_features(small).collect()[0]
        assert feats["width"] == max(orig["width"] // 2, 1)
        assert feats["height"] == max(orig["height"] // 2, 1)
        # payload: pairs floor-averaged -> 4 bytes from 8
        assert feats["n_bytes"] == 14 + 4
        exp = [
            (ord(a) + ord(b)) // 2 for a, b in zip("abcdefgh"[::2], "abcdefgh"[1::2])
        ]
        assert feats["sum_bytes"] == sum(exp)
        # composes with frame sampling downstream (same contract)
        fr = sample_frames(
            attach_fake_video(docs), frame_bytes=4, stride=2
        ).collect()[0]
        assert fr["n_frames"] == 2 and fr["n_sampled"] == 1
        assert fr["sum_sampled"] == sum(ord(c) for c in "abcd")

    def test_resize_rejects_real_formats_and_bad_factor(self, spark):
        from swarm_spark.ops.multimodal import resize_media

        bad = spark.createDataFrame(
            [(1, bytearray(b"\x89PNG1234567890"))], "doc_id long, media binary"
        )
        with pytest.raises(Exception) as ei:
            resize_media(bad).collect()
        assert "NotImplementedError" in str(ei.value) or "resizing" in str(ei.value)
        with pytest.raises(ValueError):
            resize_media(bad, factor=0)

    def test_real_decoder_is_stubbed(self, spark):
        bad = spark.createDataFrame([(1, bytearray(b"\x89PNG1234567890"))], "doc_id long, media binary")
        with pytest.raises(Exception) as ei:
            media_features(bad).collect()
        assert "NotImplementedError" in str(ei.value) or "media decoding" in str(ei.value)


class TestComponents:
    def test_transitive_clusters_and_keep_one(self, spark):
        from swarm_spark.ops import dup_components, keep_one_per_cluster

        # chain 1-2-3 plus island 7-8; 5 untouched
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (7, 8)], "doc_a long, doc_b long"
        )
        comp = {r["id"]: r["component"] for r in dup_components(pairs).collect()}
        assert comp == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7}

        docs = spark.createDataFrame(
            [(i, f"d{i}") for i in [1, 2, 3, 5, 7, 8]], "doc_id long, text string"
        )
        kept = sorted(r["doc_id"] for r in keep_one_per_cluster(docs, pairs).collect())
        assert kept == [1, 5, 7]

    def test_cycle_converges(self, spark):
        from swarm_spark.ops import dup_components

        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 1), (3, 4)], "doc_a long, doc_b long"
        )
        comp = {r["id"]: r["component"] for r in dup_components(pairs).collect()}
        assert set(comp.values()) == {1}

    def test_long_chain_converges_sublinearly(self, spark):
        """A 30-hop chain needs 29 rounds under plain min-label
        propagation; large-star/small-star closes it in O(log n)
        alternating rounds — pin that with a max_iters far below the
        diameter."""
        from swarm_spark.ops import dup_components

        n = 30
        pairs = spark.createDataFrame(
            [(f"d{i:03d}", f"d{i + 1:03d}") for i in range(n - 1)],
            "doc_a string, doc_b string",
        )
        comp = {
            r["id"]: r["component"]
            for r in dup_components(pairs, max_iters=8).collect()
        }
        assert len(comp) == n
        assert set(comp.values()) == {"d000"}

    def test_two_components_string_ids_reverse_order(self, spark):
        from swarm_spark.ops import dup_components

        # edges given high→low and shuffled; min is lexicographic
        pairs = spark.createDataFrame(
            [("z9", "m5"), ("m5", "a1"), ("q2", "q8")],
            "doc_a string, doc_b string",
        )
        comp = {r["id"]: r["component"] for r in dup_components(pairs).collect()}
        assert comp == {"a1": "a1", "m5": "a1", "z9": "a1", "q2": "q2", "q8": "q2"}


class TestDFPruning:
    def test_adversarial_common_shingle_bounded(self, spark):
        """A shingle shared by EVERY doc would generate O(n^2) candidate
        rows; DF-pruning drops it while true dup pairs (sharing rare
        shingles) survive."""
        from swarm_spark.ops.dedup import doc_shingles, prune_by_df

        common = "aaa bbb ccc"  # one shingle present in all docs
        rows = [(i, f"{common} unique{i} token{i} word{i}") for i in range(1, 101)]
        rows += [(200, f"{common} unique7 token7 word7")]  # true dup of 7
        docs = spark.createDataFrame(rows, "doc_id long, text string")

        s = prune_by_df(doc_shingles(docs), max_df=10)
        # the ubiquitous shingle is gone -> candidate join is bounded
        cand = (
            s.alias("a")
            .join(
                s.alias("b"),
                (F.col("a.sh") == F.col("b.sh"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .count()
        )
        assert cand < 100  # unpruned would be > 100*101/2 = 5050 from the hot shingle

        pairs = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in ngram_jaccard_pairs(docs, threshold=0.5, max_df=10).collect()
        }
        assert (7, 200) in pairs  # the real dup survives pruning

    def test_pruning_noop_below_cap(self, docs):
        unpruned = ngram_jaccard_pairs(docs, threshold=0.5).collect()
        pruned = ngram_jaccard_pairs(docs, threshold=0.5, max_df=100).collect()
        assert sorted(map(tuple, unpruned)) == sorted(map(tuple, pruned))

    def test_auto_max_df_holds_on_saturated_vocab(self, spark):
        """The SCALING.md guidance, now executable: on a SATURATED
        shingle space (tiny vocab — every df grows with the corpus) the
        derived cap grows only ~√N, so the candidate volume
        Σ min(df, cap)² stays LINEAR in corpus rows (a max_df ∝ N rule
        makes it quadratic); on a sparse corpus (vocabulary grows with
        the data, dfs stay ~1) the cap floats up. Deterministic: pure
        function of the df histogram."""
        from swarm_spark.ops.dedup import auto_max_df

        # saturated: 3-token vocab -> ONE distinct shingle, df = n_docs
        def saturated(n_docs):
            rows = [(i, "aaa bbb ccc") for i in range(n_docs)]
            return spark.createDataFrame(rows, "doc_id long, text string")

        cap_small = auto_max_df(saturated(100), floor=4)
        cap_big = auto_max_df(saturated(1000), floor=4)
        # candidate volume (one shingle -> exactly cap^2) stays within
        # the linear budget at BOTH sizes: the invariant that matters
        assert cap_small**2 <= 8 * 100
        assert cap_big**2 <= 8 * 1000
        # and the cap grows sub-linearly (~sqrt): 10x data -> <= 4x cap,
        # where the naive max_df ∝ N rule would 10x it
        assert cap_big <= 4 * cap_small

        # sparse: every shingle unique to its doc (df = 1 everywhere)
        sparse = spark.createDataFrame(
            [(i, f"u{i}a u{i}b u{i}c u{i}d u{i}e") for i in range(500)],
            "doc_id long, text string",
        )
        cap_sparse = auto_max_df(sparse, floor=4)
        assert cap_sparse >= 64, "sparse corpus should not be over-pruned"
        # determinism + partition invariance
        assert cap_sparse == auto_max_df(sparse.repartition(7), floor=4)
        # the derived cap keeps true duplicates: feed it to the join
        pairs = ngram_jaccard_pairs(
            sparse.unionByName(
                spark.createDataFrame(
                    [(900, "u7a u7b u7c u7d u7e")], "doc_id long, text string"
                )
            ),
            threshold=0.9,
            max_df=cap_sparse,
        ).collect()
        assert {(r["doc_a"], r["doc_b"]) for r in pairs} == {(7, 900)}

    def test_auto_max_df_empty_and_args(self, spark):
        from swarm_spark.ops.dedup import auto_max_df

        empty = spark.createDataFrame([], "doc_id long, text string")
        assert auto_max_df(empty, floor=16) == 16
        import pytest as _pytest

        with _pytest.raises(ValueError, match=">= 1"):
            auto_max_df(empty, budget_pairs_per_row=0)


class TestWideSimhash:
    def test_48_bit_blocked_equals_exact(self, docs):
        """Wider sketches (the ≫10^6-doc configuration) keep the
        pigeonhole-blocked pair search output-identical to the O(n^2)
        verifier."""
        exact = sorted(
            map(tuple, simhash_pairs(docs, bits=48, max_hamming=8).collect())
        )
        blocked = sorted(
            map(tuple, simhash_pairs_blocked(docs, bits=48, max_hamming=8).collect())
        )
        assert exact == blocked
        assert any(h == 0 for *_, h in exact)  # the exact dup pair

    def test_bits_out_of_range_rejected(self, docs):
        from swarm_spark.ops.dedup import simhash

        with pytest.raises(ValueError):
            simhash(docs, bits=64)


class TestEmbeddingDedup:
    @pytest.fixture(scope="class")
    def emb(self, spark, sf_dir):
        return spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    def test_vectorized_matches_fold_path(self, emb):
        """The numpy gram-matrix path and the pure-DataFrame fold path
        emit identical (id_a, id_b, cell, cos) rows — the fold path is
        the oracle-parity verifier for the BLAS one."""
        from swarm_spark.ops import embedding_dup_pairs

        fast = embedding_dup_pairs(emb, threshold=0.40, vectorized=True).collect()
        slow = embedding_dup_pairs(emb, threshold=0.40, vectorized=False).collect()
        assert len(fast) > 0
        assert sorted(map(tuple, fast)) == sorted(map(tuple, slow))

    def test_signlsh_finds_planted_duplicates_exactly(self, spark):
        """A scaled copy (cos = 1) agrees with its original on EVERY
        hyperplane sign, so sign-LSH recall for true duplicates is
        deterministic — not probabilistic. Emitted pairs are also
        exact-verified, so nothing below the threshold leaks out."""
        import random

        from swarm_spark.ops import embedding_signlsh_pairs

        rng = random.Random(7)
        rows = [(i, [rng.gauss(0, 1) for _ in range(16)]) for i in range(40)]
        rows.append((100, [2.0 * x for x in rows[3][1]]))  # cos=1 with id 3
        rows.append((101, list(rows[11][1])))  # cos=1 with id 11
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        out = embedding_signlsh_pairs(
            emb, num_planes=16, bands=4, threshold=0.95, dim=16
        ).collect()
        got = {(r["id_a"], r["id_b"]) for r in out}
        assert {(3, 100), (11, 101)} <= got
        assert all(r["cos"] >= 0.95 for r in out)
        assert all(r["shared_bands"] == 4 for r in out if r["cos"] >= 0.999999)

    def test_signlsh_validates_band_divisibility(self, emb):
        from swarm_spark.ops import embedding_signlsh_pairs

        with pytest.raises(ValueError):
            embedding_signlsh_pairs(emb, num_planes=16, bands=5)

    def test_signlsh_survives_empty_partitions_and_empty_frame(self, spark):
        """mapInPandas can deliver zero-row Arrow batches; the vectorized
        sketch must skip them instead of crashing on a 0-size reshape."""
        from swarm_spark.ops import embedding_signlsh_pairs

        rows = [(i, [float(i)] * 8) for i in range(3)]
        sparse = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        ).repartition(16)  # most partitions empty
        assert (
            embedding_signlsh_pairs(sparse, num_planes=8, bands=2, dim=8).count()
            >= 0
        )
        empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
        assert (
            embedding_signlsh_pairs(empty, num_planes=8, bands=2, dim=8).count()
            == 0
        )

    def test_planes_are_deterministic(self):
        from swarm_spark.ops import rademacher_planes

        a = rademacher_planes(4, 8)
        assert a == rademacher_planes(4, 8)
        assert all(s in (1, -1) for row in a for s in row)


class TestRepetitionSignals:
    def test_known_fractions(self, spark):
        from swarm_spark.ops import repetition_signals

        rows = [
            (1, "a b a b a b"),      # bigrams: "a b"×3, "b a"×2 → top 3/5
            (2, "x y z"),            # all distinct → top 1/2
            (3, "w"),                # shorter than n → NULL gram stats
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: r for r in repetition_signals(df).collect()}
        assert out[1]["n_grams"] == 5 and out[1]["top_gram_n"] == 3
        assert out[1]["top_gram_frac"] == 0.6
        # 6 tokens, 2 distinct → dup fraction 1 - 2/6
        assert out[1]["dup_token_frac"] == round(1 - 2 / 6, 6)
        assert out[2]["top_gram_n"] == 1 and out[2]["top_gram_frac"] == 0.5
        assert out[3]["n_grams"] is None and out[3]["top_gram_frac"] is None


class TestPiiScrub:
    def test_redaction_and_counts(self, spark):
        from swarm_spark.ops import pii_scrub

        rows = [
            (1, "mail bob.smith+x@corp.example.org now"),
            (2, "call 555-123-4567 or +1 212.555.0199 from 10.0.0.7"),
            (3, "clean text with no identifiers at all"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: r for r in pii_scrub(df).collect()}
        assert out[1]["n_email"] == 1 and "<EMAIL>" in out[1]["scrubbed"]
        assert "bob" not in out[1]["scrubbed"]
        assert out[2]["n_phone"] == 2  # 555-123-4567 and 212.555.0199
        assert out[2]["n_ipv4"] == 1 and "<IPV4>" in out[2]["scrubbed"]
        assert "4567" not in out[2]["scrubbed"]
        assert out[3]["scrubbed"] == "clean text with no identifiers at all"
        assert (out[3]["n_email"], out[3]["n_phone"], out[3]["n_ipv4"]) == (0, 0, 0)


class TestBlockBloom:
    def _frames(self, spark, n=400):
        rows = [(i, f"member text {i}") for i in range(n)]
        probes = rows + [(1000 + i, f"novel text {i}") for i in range(n)]
        return (
            spark.createDataFrame(rows, "doc_id long, text string"),
            spark.createDataFrame(probes, "doc_id long, text string"),
        )

    def test_no_false_negatives_ever(self, spark):
        """The contract that makes the filter a safe pre-filter: every
        member must be flagged, at ANY filter size (even a saturated
        one-block filter)."""
        from swarm_spark.ops.dedup import bloom_contains, build_block_bloom

        members, probes = self._frames(spark)
        for n_blocks in (1, 16, 4096):
            bloom = build_block_bloom(members, n_blocks=n_blocks)
            out = bloom_contains(probes, bloom, n_blocks=n_blocks)
            missed = out.where(
                (F.col("doc_id") < 1000) & ~F.col("might_contain")
            ).count()
            assert missed == 0, f"n_blocks={n_blocks}: {missed} false negatives"

    def test_probe_preserves_user_block_column(self, spark):
        """ADVICE r7: the probe's internal temporaries must not clobber
        a pre-existing 'block' column on the probed frame (plausible
        when probing a frame derived from bloom tooling, whose own
        output schema uses 'block')."""
        from swarm_spark.ops.dedup import bloom_contains, build_block_bloom

        members, probes = self._frames(spark, n=50)
        probes = probes.withColumn("block", F.col("doc_id") * 10)
        bloom = build_block_bloom(members, n_blocks=64)
        out = bloom_contains(probes, bloom, n_blocks=64)
        assert "block" in out.columns
        rows = out.where(F.col("block") != F.col("doc_id") * 10).count()
        assert rows == 0, "user 'block' column was overwritten by the probe"

    def test_fpr_falls_with_size_and_dense_filter_saturates(self, spark):
        from swarm_spark.ops.dedup import bloom_contains, build_block_bloom

        members, probes = self._frames(spark)

        def fpr(n_blocks):
            bloom = build_block_bloom(members, n_blocks=n_blocks)
            out = bloom_contains(probes, bloom, n_blocks=n_blocks)
            fp = out.where((F.col("doc_id") >= 1000) & F.col("might_contain")).count()
            return fp / 400

        dense, sized = fpr(8), fpr(4096)
        # 400 keys x 4 bits into 8 blocks saturates; 4096 blocks
        # (~60 bits/key) is near-exact
        assert dense > 0.5, dense
        assert sized < 0.05, sized

    def test_filter_is_partitioning_invariant_and_small(self, spark):
        from swarm_spark.ops.dedup import build_block_bloom

        members, _ = self._frames(spark)
        a = sorted(map(tuple, build_block_bloom(members, n_blocks=64).collect()))
        b = sorted(
            map(
                tuple,
                build_block_bloom(members.repartition(13), n_blocks=64).collect(),
            )
        )
        assert a == b
        assert len(a) <= 64
        # 62-bit contract: every mask stays in signed-positive range
        assert all(m >= 0 for _, m in a)

    def test_bad_args(self, spark):
        from swarm_spark.ops.dedup import build_block_bloom

        members, _ = self._frames(spark, n=4)
        with pytest.raises(ValueError):
            build_block_bloom(members, k=0)
        with pytest.raises(ValueError):
            build_block_bloom(members, k=7)
        with pytest.raises(ValueError):
            build_block_bloom(members, n_blocks=0)


class TestLinearCountDistinct:
    def test_estimate_tracks_true_cardinality(self, spark):
        from swarm_spark.ops.dedup import linear_count_distinct

        for n in (100, 2000, 20000):
            df = spark.range(n).select(F.concat(F.lit("k"), F.col("id")).alias("k"))
            (row,) = linear_count_distinct(df, "k", n_blocks=4096).collect()
            est = row["estimate"]
            assert abs(est - n) / n < 0.05, (n, est)
            assert row["m_bits"] == 62 * 4096
            assert row["set_bits"] + row["zero_bits"] == row["m_bits"]

    def test_duplicates_do_not_inflate(self, spark):
        from swarm_spark.ops.dedup import linear_count_distinct

        uniq = spark.range(500).select(F.concat(F.lit("k"), F.col("id") % 50).alias("k"))
        (row,) = linear_count_distinct(uniq, "k", n_blocks=1024).collect()
        assert abs(row["estimate"] - 50) <= 3

    def test_saturated_bitmap_returns_null(self, spark):
        from swarm_spark.ops.dedup import linear_count_distinct

        # 1 block = 62 bits; >>62 distinct keys saturate it
        df = spark.range(20000).select(F.col("id").cast("string").alias("k"))
        (row,) = linear_count_distinct(df, "k", n_blocks=1).collect()
        assert row["zero_bits"] == 0 and row["estimate"] is None

    def test_partitioning_invariant(self, spark):
        from swarm_spark.ops.dedup import linear_count_distinct

        df = spark.range(3000).select(F.col("id").cast("string").alias("k"))
        a = linear_count_distinct(df, "k").collect()
        b = linear_count_distinct(df.repartition(17), "k").collect()
        assert a == b


class TestIncrementalDedup:
    def test_flags_against_corpus(self, spark):
        from swarm_spark.ops import incremental_dup_flags

        corpus = spark.createDataFrame(
            [
                (1, "the quick brown fox jumps over the lazy dog today"),
                (2, "totally unrelated corpus document about query planners"),
            ],
            "doc_id long, text string",
        )
        new = spark.createDataFrame(
            [
                # exact copy of corpus doc 1
                (10, "the quick brown fox jumps over the lazy dog today"),
                # shares the rarest 5-gram window (suffix edit) → fp dup only
                (11, "the quick brown fox jumps over the lazy dog tonight"),
                # fresh content
                (12, "entirely new material never seen in any corpus"),
                # too short for a 5-gram fingerprint, not in corpus
                (13, "tiny doc"),
            ],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: (r["exact_dup"], r["fp_dup"])
            for r in incremental_dup_flags(new, corpus).collect()
        }
        assert out[10] == (True, True)
        assert out[12] == (False, False)
        assert out[13] == (False, False)
        # 11 is not byte-identical but must share doc 1's min-md5 window
        assert out[11][0] is False


class TestSequencePacking:
    CAP = 64

    @pytest.fixture(scope="class")
    def docs(self, spark):
        rows = [(i, " ".join(f"w{j}" for j in range((i * 37) % 150 + 1))) for i in range(60)]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_concat_chunks_windows_are_exactly_full(self, spark, docs):
        from swarm_spark.ops.packing import pack_concat_chunks

        out = pack_concat_chunks(docs, capacity=self.CAP).collect()
        total = sum(r["take"] for r in out)
        by_win = {}
        for r in out:
            assert 0 <= r["off"] < self.CAP and 1 <= r["take"] <= self.CAP
            by_win[r["window_id"]] = by_win.get(r["window_id"], 0) + r["take"]
        last = max(by_win)
        # every window except the tail holds exactly CAP tokens
        assert all(v == self.CAP for w, v in by_win.items() if w != last)
        assert by_win[last] == total - self.CAP * last
        # token conservation: every document's tokens all land somewhere
        per_doc = {}
        for r in out:
            per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + r["take"]
        n_toks = {r["doc_id"]: r["n_tok"] for r in out}
        assert per_doc == n_toks

    def test_concat_chunks_partition_invariant(self, spark, docs):
        from swarm_spark.ops.packing import pack_concat_chunks

        a = [tuple(r) for r in pack_concat_chunks(docs, capacity=self.CAP).collect()]
        b = [
            tuple(r)
            for r in pack_concat_chunks(
                docs.repartition(7), capacity=self.CAP, num_partitions=3
            ).collect()
        ]
        assert a == b  # prefix sum is a pure function of the corpus

    def test_greedy_bins_never_overflow_and_stay_maximal(self, spark, docs):
        from swarm_spark.ops.packing import pack_greedy_bins

        out = pack_greedy_bins(docs, capacity=self.CAP, num_buckets=4).collect()
        fills: dict = {}
        for r in out:
            key = (r["bucket"], r["bin_id"])
            fills.setdefault(key, []).append((r["doc_id"], r["n_tok"], r["oversize"]))
        for (bucket, bin_id), members in fills.items():
            tot = sum(n for _, n, _ in members)
            if any(o for _, _, o in members):
                assert len(members) == 1  # oversize docs bin alone
            else:
                assert tot <= self.CAP
                # maximality: the first doc of the NEXT bin didn't fit here
                nxt = fills.get((bucket, bin_id + 1))
                if nxt and not nxt[0][2]:
                    assert tot + nxt[0][1] > self.CAP

    def test_greedy_bins_auto_buckets_bound_rows(self, spark, docs):
        """num_buckets=None derives the bucket count from the corpus so
        no sequential applyInPandas group exceeds max_bucket_rows."""
        import pytest

        from swarm_spark.ops.packing import pack_greedy_bins

        out = pack_greedy_bins(
            docs, capacity=self.CAP, max_bucket_rows=3
        )  # 60 docs / cap 3 -> >=20 buckets
        per_bucket: dict = {}
        for r in out.collect():
            per_bucket[r["bucket"]] = per_bucket.get(r["bucket"], 0) + 1
        assert len(per_bucket) >= 10
        # md5 bucketing is balanced: allow slack over the expected bound
        assert max(per_bucket.values()) <= 3 * 3
        # an explicit under-provisioned bucket count refuses to build
        with pytest.raises(ValueError, match="num_buckets"):
            pack_greedy_bins(docs, capacity=self.CAP, num_buckets=2, max_bucket_rows=5)


class TestBoilerplateAndLeakage:
    def test_strip_repeated_segments_lines(self, spark):
        from swarm_spark.ops.text import strip_repeated_segments

        banner = "subscribe to our newsletter"
        rows = [
            (0, f"unique intro zero\n{banner}\nbody text zero"),
            (1, f"{banner}\nanother body one"),
            (2, f"totally distinct two\n{banner}"),
            (3, banner),  # doc that is ONLY boilerplate -> empty
            (4, "no boilerplate here at all"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: r["text"] for r in strip_repeated_segments(docs, delim="\n", max_df=2).collect()}
        assert out[0] == "unique intro zero\nbody text zero"
        assert out[1] == "another body one"
        assert out[2] == "totally distinct two"
        assert out[3] == ""  # all segments stripped, row preserved
        assert out[4] == "no boilerplate here at all"

    def test_length_histogram_buckets_and_conservation(self, spark):
        from swarm_spark.ops.text import length_histogram

        rows = [
            (0, " ".join(["w"] * 3)),  # bucket 0
            (1, " ".join(["w"] * 130)),  # bucket 1
            (2, " ".join(["w"] * 130)),  # bucket 1
            (3, " ".join(["w"] * 300)),  # bucket 2
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["bucket"]: r for r in length_histogram(docs).collect()}
        assert set(out) == {0, 1, 2}
        assert out[1]["n_docs"] == 2 and out[1]["n_tokens"] == 260
        assert (out[2]["min_tokens"], out[2]["max_tokens"]) == (300, 300)
        # token conservation across buckets
        assert sum(r["n_tokens"] for r in out.values()) == 3 + 130 + 130 + 300

    def test_strip_segments_regex_metachar_delim(self, spark):
        """delim is a LITERAL: '.' must split on periods, not
        every-character (the Java-regex reading), and '|' must not
        split everywhere. Reassembly and split must agree."""
        from swarm_spark.ops.text import strip_repeated_segments

        rows = [
            (0, "keep me.common tail"),
            (1, "also mine.common tail"),
            (2, "solo doc.rare tail"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = {
            r["doc_id"]: r["text"]
            for r in strip_repeated_segments(docs, delim=".", max_df=1).collect()
        }
        assert out[0] == "keep me"
        assert out[1] == "also mine"
        assert out[2] == "solo doc.rare tail"
        pipe = spark.createDataFrame(
            [(0, "a|shared"), (1, "b|shared")], "doc_id long, text string"
        )
        got = {
            r["doc_id"]: r["text"]
            for r in strip_repeated_segments(pipe, delim="|", max_df=1).collect()
        }
        assert got == {0: "a", 1: "b"}

    def test_decontaminate_flags_exact_ngram_leak(self, spark):
        from swarm_spark.ops.dedup import decontaminate

        bench = spark.createDataFrame(
            [(100, "the quick brown fox jumps over the lazy dog")],
            "doc_id long, text string",
        )
        train = spark.createDataFrame(
            [
                (0, "prefix words then the quick brown fox jumps too"),  # leaks one 5-gram
                (1, "completely unrelated content with no overlap at all"),
                (2, "short doc"),  # fewer than n tokens
            ],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: (r["n_hits"], r["contaminated"]) for r in decontaminate(train, bench, n=5).collect()}
        assert out[0] == (1, True)
        assert out[1] == (0, False)
        assert out[2] == (0, False)
        assert len(out) == 3

    def test_pack_chunks_plan_has_no_global_single_partition_sort(self, spark):
        """The scale property of the two-phase prefix sum: a naive
        Window.orderBy(doc_id) cumsum plans an Exchange SinglePartition
        (the whole corpus through one task); the range-partitioned
        formulation must never do that."""
        from swarm_spark.ops.packing import pack_concat_chunks

        docs = spark.createDataFrame(
            [(i, "a b c d e") for i in range(100)], "doc_id long, text string"
        )
        out = pack_concat_chunks(docs, capacity=7, num_partitions=4)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "SinglePartition" not in plan


class TestSignLshVectorizedParity:
    def test_vectorized_sketch_matches_expression_fold(self, spark, sf_dir):
        """The numpy sketch's row-vectorized / dim-sequential
        accumulation must be bit-identical to the interpreted
        aggregate(zip_with(...)) fold — same pairs, same cos."""
        from swarm_spark.ops.dedup import embedding_signlsh_pairs
        from swarm_spark.sources.tables import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        fast = [tuple(r) for r in embedding_signlsh_pairs(emb, threshold=0.40).collect()]
        slow = [
            tuple(r)
            for r in embedding_signlsh_pairs(emb, threshold=0.40, vectorized=False).collect()
        ]
        assert fast == slow and fast

    def test_packing_supports_string_ids(self, spark):
        from swarm_spark.ops.packing import pack_concat_chunks, pack_greedy_bins

        docs = spark.createDataFrame(
            [(f"u{i:03d}", "a b c d e f g") for i in range(30)],
            "uri string, text string",
        )
        chunks = pack_concat_chunks(docs, capacity=10, id_col="uri").collect()
        assert sum(r["take"] for r in chunks) == 30 * 7
        bins = pack_greedy_bins(docs, capacity=10, id_col="uri", num_buckets=3).collect()
        assert len(bins) == 30 and all(isinstance(r["doc_id"], str) for r in bins)


class TestQualityAndLeakageSignals:
    def test_unigram_surprisal_hand_case(self, spark):
        """Corpus 'a a a b': p(a)=3/4, p(b)=1/4. Doc 1 = 'a a a',
        doc 2 = 'b'. micro(a) = round(-ln(.75)*1e6) = 287682,
        micro(b) = round(-ln(.25)*1e6) = 1386294."""
        import math

        from swarm_spark.ops.text import unigram_surprisal

        docs = spark.createDataFrame(
            [(1, "a a a"), (2, "b")], "doc_id long, text string"
        )
        out = {r["doc_id"]: (r["n_tokens"], r["avg_surprisal_micro"])
               for r in unigram_surprisal(docs).collect()}
        ma = round(-math.log(0.75) * 1e6)
        mb = round(-math.log(0.25) * 1e6)
        assert out[1] == (3, (2 * 3 * ma + 3) // 6)
        assert out[2] == (1, mb)

    def test_surprisal_partition_invariant(self, spark, sf_dir):
        from swarm_spark.ops.text import unigram_surprisal
        from swarm_spark.sources.tables import load_table

        docs = load_table(spark, sf_dir, "documents")
        a = unigram_surprisal(docs.repartition(17)).collect()
        b = unigram_surprisal(docs.coalesce(1)).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_dup_ngram_coverage_planted_clone(self, spark):
        """Two clone docs share every shingle (dup_frac 1.0); a unique
        doc shares none (0.0)."""
        from swarm_spark.ops.dedup import dup_ngram_coverage

        docs = spark.createDataFrame(
            [
                (1, "x y z w q"),
                (2, "x y z w q"),
                (3, "p1 p2 p3 p4 p5"),
            ],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: (r["n_shingles"], r["n_dup"], r["dup_frac"])
               for r in dup_ngram_coverage(docs, n=3).collect()}
        assert out[1] == (3, 3, 1.0) and out[2] == (3, 3, 1.0)
        assert out[3] == (3, 0, 0.0)

    def test_split_leakage_flags_cross_split_duplicates(self, spark):
        """Plant one text duplicated across doc_ids that the split
        hash sends to different splits; it must be the ONLY reported
        digest, with its splits listed sorted."""
        from swarm_spark.ops.dedup import split_leakage
        from swarm_spark.ops.sampling import split_column

        base = spark.range(0, 300).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("unique text "), F.col("id")).alias("text"),
        )
        # copies of one text on every doc_id 1000..1049: with 50
        # assignments the deterministic split hash crosses splits
        dup = spark.range(1000, 1050).select(
            F.col("id").alias("doc_id"), F.lit("the planted duplicate").alias("text")
        )
        docs = base.unionByName(dup)
        out = split_leakage(docs).collect()
        assert len(out) == 1
        row = out[0]
        assert row["n_docs"] == 50 and row["n_splits"] >= 2
        assert row["splits"] == ",".join(sorted(row["splits"].split(",")))
        # sanity: the splits listed are exactly the ones the hash assigns
        expected = {
            r["s"]
            for r in dup.select(split_column("doc_id").alias("s")).distinct().collect()
        }
        assert set(row["splits"].split(",")) == expected


class TestWinnowingGuarantee:
    def test_shared_run_guarantees_shared_fingerprint(self, spark):
        """Winnowing's defining property: any two documents sharing a
        contiguous token run of length >= w + k - 1 MUST share at least
        one selected fingerprint (Schleimer et al., thm 1). Randomized
        docs with planted shared runs of exactly that length."""
        import random

        from swarm_spark.ops.text import winnow_fingerprints

        k, w = 3, 4
        run_len = w + k - 1  # 6 tokens
        rng = random.Random(3)
        rows = []
        planted = []
        for pair in range(10):
            shared = [f"s{pair}_{j}" for j in range(run_len)]
            for side in (0, 1):
                doc_id = pair * 2 + side
                noise = lambda m: [  # noqa: E731
                    f"n{doc_id}_{rng.randrange(10**6)}" for _ in range(m)
                ]
                toks = noise(rng.randrange(0, 15)) + shared + noise(rng.randrange(0, 15))
                rows.append((doc_id, " ".join(toks)))
            planted.append((pair * 2, pair * 2 + 1))
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        fp = winnow_fingerprints(docs, k=k, w=w)
        by_doc: dict[int, set] = {}
        for r in fp.collect():
            by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
        for a, b in planted:
            assert by_doc.get(a, set()) & by_doc.get(b, set()), (a, b)


class TestNormalizedDedup:
    def test_case_punct_variants_collapse(self, spark):
        """Canonical-form dedup: docs differing only in case,
        punctuation, and whitespace share a norm_hash; genuinely
        different docs don't. (The synthetic corpus has no such
        variants, so this is unit-pinned rather than a registry
        query.)"""
        from swarm_spark.ops.text import normalize_text

        docs = spark.createDataFrame(
            [
                (1, "Hello, World!  Fast table."),
                (2, "hello world fast table"),
                (3, "HELLO   world — fast... table"),
                (4, "another document entirely"),
            ],
            "doc_id long, text string",
        )
        norm = normalize_text(docs)
        groups = (
            norm.groupBy("norm_hash")
            .agg(F.count(F.lit(1)).alias("n"), F.min("doc_id").alias("keep"))
            .collect()
        )
        sizes = sorted(r["n"] for r in groups)
        assert sizes == [1, 3]
        big = next(r for r in groups if r["n"] == 3)
        assert big["keep"] == 1


class TestSemanticDedup:
    def _toy(self, spark):
        # 8 vectors in 2 clear clusters; v1/v2 near-identical, v3 a
        # scaled copy of v1 (cos = 1), v10/v11 identical in the other
        # cluster; the rest are far from everything.
        rows = [
            (1, [1.0, 0.0, 0.0, 0.1]),
            (2, [0.99, 0.01, 0.0, 0.1]),
            (3, [2.0, 0.0, 0.0, 0.2]),
            (4, [0.5, 0.5, 0.5, 0.5]),
            (10, [0.0, 1.0, 0.0, -0.1]),
            (11, [0.0, 1.0, 0.0, -0.1]),
            (12, [0.0, 0.0, 1.0, 0.0]),
            (13, [-1.0, 0.0, 0.0, 0.4]),
        ]
        return spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def test_planted_semantic_groups_collapse(self, spark):
        from swarm_spark.ops.semdedup import semantic_dup_pairs, semantic_keep_one

        df = self._toy(spark)
        pairs = semantic_dup_pairs(
            df, n_cells=2, iters=2, threshold=0.98
        ).collect()
        found = {(r["id_a"], r["id_b"]) for r in pairs}
        # the planted near-identical groups must pair up
        assert {(1, 2), (1, 3), (2, 3), (10, 11)} <= found
        assert all(r["cos"] >= 0.98 for r in pairs)
        kept = {
            r["vec_id"]
            for r in semantic_keep_one(
                df, n_cells=2, iters=2, threshold=0.98
            ).collect()
        }
        # min id survives each group; singletons pass through
        assert {1, 10} <= kept
        assert {2, 3, 11}.isdisjoint(kept)
        assert {4, 12, 13} <= kept

    def test_pairs_only_within_cells(self, spark):
        """Blocking contract: every emitted pair shares a k-means cell
        (same-cell pairs only — the SemDeDup trade)."""
        from swarm_spark.ops.ivf import kmeans_cells
        from swarm_spark.ops.semdedup import semantic_dup_pairs

        df = self._toy(spark)
        cells = {
            r["id"]: r["cell"]
            for r in kmeans_cells(df, k=2, iters=2).collect()
        }
        pairs = semantic_dup_pairs(df, n_cells=2, iters=2, threshold=0.5).collect()
        assert pairs  # threshold low enough to emit something
        for r in pairs:
            assert cells[r["id_a"]] == cells[r["id_b"]] == r["cell"]


class TestDsirImportance:
    def _corpus(self, spark):
        rows = [
            # target-domain docs: legal-ish bigrams
            (1, "the court held that the court ruled", 1),
            (2, "the court ruled on the appeal", 1),
            # near-target doc: shares the distinctive bigrams
            (3, "the court held the appeal", 0),
            # off-target doc: disjoint vocabulary
            (4, "banana smoothie recipe with extra mango", 0),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string, is_tgt int")

    def test_target_like_docs_rank_higher(self, spark):
        from swarm_spark.ops.text import dsir_importance

        df = self._corpus(spark)
        out = {
            r["doc_id"]: r
            for r in dsir_importance(df, F.col("is_tgt") == 1).collect()
        }
        assert set(out) == {1, 2, 3, 4}
        # normalize by feature count to compare docs of different length
        avg = {k: v["importance_micro"] / v["n_bigrams"] for k, v in out.items()}
        assert avg[3] > avg[4]          # near-target beats off-target
        assert min(avg[1], avg[2]) > avg[4]

    def test_column_and_frame_targets_agree(self, spark):
        from swarm_spark.ops.text import dsir_importance

        df = self._corpus(spark)
        fused = dsir_importance(df, F.col("is_tgt") == 1).collect()
        twoframe = dsir_importance(df, df.where(F.col("is_tgt") == 1)).collect()
        key = lambda rows: sorted(
            (r["doc_id"], r["n_bigrams"], r["importance_micro"]) for r in rows
        )
        assert key(fused) == key(twoframe)

    def test_frame_target_counts_target_only_buckets(self, spark):
        """ADVICE r6: with a separate target frame, buckets present
        ONLY in the target were left-join-dropped, undercounting the
        target normalizer tt. Pin the exact micro-nat values against a
        from-scratch Python mirror of the formula, with a target whose
        vocabulary is disjoint from the raw pool (every target bucket
        is target-only)."""
        import hashlib
        import math
        from collections import Counter
        from decimal import ROUND_HALF_UP, Decimal

        from swarm_spark.ops.text import dsir_importance

        raw = spark.createDataFrame(
            [(1, "aa bb cc"), (2, "bb cc dd")], "doc_id long, text string"
        )
        tgt = spark.createDataFrame([(9, "zz yy xx ww")], "doc_id long, text string")
        out = {r["doc_id"]: r for r in dsir_importance(raw, tgt).collect()}

        B = 4096

        def bkt(bg):
            h = hashlib.md5(f"swarm-dsir|{bg}".encode()).hexdigest()
            return int(h[:8], 16) % B

        raw_bgs = {1: ["aa bb", "bb cc"], 2: ["bb cc", "cc dd"]}
        tgt_bgs = ["zz yy", "yy xx", "xx ww"]
        cr = Counter(bkt(b) for bgs in raw_bgs.values() for b in bgs)
        ct = Counter(bkt(b) for b in tgt_bgs)
        rt, tt = sum(cr.values()), sum(ct.values())
        assert tt == 3  # the fix: target-only buckets count toward tt

        def lr(b):
            x = (
                math.log((ct[b] + 1) / (tt + B))
                - math.log((cr[b] + 1) / (rt + B))
            ) * 1_000_000
            return int(Decimal(x).quantize(Decimal(1), rounding=ROUND_HALF_UP))

        for doc, bgs in raw_bgs.items():
            assert out[doc]["importance_micro"] == sum(lr(bkt(b)) for b in bgs)
            assert out[doc]["n_bigrams"] == len(bgs)

    def test_short_docs_excluded_and_bad_buckets(self, spark):
        from swarm_spark.ops.text import dsir_importance

        df = spark.createDataFrame(
            [(1, "one", 0), (2, "two tokens here", 1)],
            "doc_id long, text string, is_tgt int",
        )
        out = dsir_importance(df, F.col("is_tgt") == 1).collect()
        assert [r["doc_id"] for r in out] == [2]
        with pytest.raises(ValueError):
            dsir_importance(df, F.col("is_tgt") == 1, num_buckets=1)


class TestNaiveBayesQuality:
    def _corpus(self, spark):
        rows = [
            # good class: clean prose vocabulary
            (1, "the court held that the ruling stands", 1),
            (2, "the court ruled on the appeal today", 1),
            (3, "the appeal stands and the ruling holds", 1),
            # bad class: keyword-spam vocabulary
            (4, "buy cheap pills buy cheap pills now", 0),
            (5, "cheap pills discount discount buy now", 0),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string, good int")

    def test_separates_classes_and_self_consistent(self, spark):
        from swarm_spark.ops.text import nb_score_quality, nb_train_quality

        df = self._corpus(spark)
        model = nb_train_quality(df, F.col("good") == 1, num_buckets=4096)
        out = {
            r["doc_id"]: r
            for r in nb_score_quality(df, model, num_buckets=4096).collect()
        }
        assert set(out) == {1, 2, 3, 4, 5}
        assert all(out[d]["pred_good"] for d in (1, 2, 3))
        assert not any(out[d]["pred_good"] for d in (4, 5))
        for r in out.values():
            assert r["pred_good"] == (r["score_micro"] > 0)

    def test_exact_micro_nats_against_python_mirror(self, spark):
        """Pin the llr/prior arithmetic against a from-scratch Python
        mirror (HALF_UP micro-nat rounding, Laplace smoothing, doc
        prior) — the engine-exact contract the oracle relies on."""
        import hashlib
        import math
        from collections import Counter
        from decimal import ROUND_HALF_UP, Decimal

        from swarm_spark.ops.text import nb_score_quality, nb_train_quality

        df = self._corpus(spark)
        B = 4096
        model = nb_train_quality(df, F.col("good") == 1, num_buckets=B)
        out = {
            r["doc_id"]: r
            for r in nb_score_quality(df, model, num_buckets=B).collect()
        }

        def bkt(tok):
            h = hashlib.md5(f"swarm-nb|{tok}".encode()).hexdigest()
            return int(h[:8], 16) % B

        docs = {
            r["doc_id"]: (r["text"].split(" "), r["good"] == 1)
            for r in df.collect()
        }
        cp = Counter(bkt(t) for ws, g in docs.values() if g for t in ws)
        cn = Counter(bkt(t) for ws, g in docs.values() if not g for t in ws)
        tp, tn = sum(cp.values()), sum(cn.values())
        dp = sum(1 for _, g in docs.values() if g)
        dn = len(docs) - dp

        def micro(x):
            return int(
                Decimal(x * 1_000_000).quantize(Decimal(1), rounding=ROUND_HALF_UP)
            )

        prior = micro(math.log((dp + 1) / (dn + 1)))
        for doc_id, (ws, _) in docs.items():
            want = prior + sum(
                micro(
                    math.log((cp[bkt(t)] + 1) / (tp + B))
                    - math.log((cn[bkt(t)] + 1) / (tn + B))
                )
                for t in ws
            )
            assert out[doc_id]["score_micro"] == want, doc_id
            assert out[doc_id]["n_tokens"] == len(ws)

    def test_scoring_new_wave_uses_unseen_default(self, spark):
        """A wave token hashing to a bucket absent from training gets
        the model's stored unseen-bucket llr (reserved row -3), not a
        silent drop — scoring new data against a historical model is
        well-defined."""
        import math

        from swarm_spark.ops.text import nb_score_quality, nb_train_quality

        df = self._corpus(spark)
        B = 4096
        model = nb_train_quality(df, F.col("good") == 1, num_buckets=B)
        res = {r["bkt"]: r["llr_micro"] for r in model.where(F.col("bkt") < 0).collect()}
        assert set(res) == {-1, -3, -4}
        assert res[-4] == B  # model is self-describing
        wave = spark.createDataFrame(
            [(9, "zzzunseen qqqnovel wwwfresh")], "doc_id long, text string"
        )
        (row,) = nb_score_quality(wave, model, num_buckets=B).collect()
        assert row["n_tokens"] == 3
        # all three tokens unseen -> prior + 3 * unseen default
        assert row["score_micro"] == res[-1] + 3 * res[-3]
        # sanity: the unseen default is ln((tn+B)/(tp+B)) in micro-nats
        tp = 21  # 3 good docs x 7 tokens
        tn = 13  # bad docs: 7 + 6 tokens
        assert abs(res[-3] - round(math.log((tn + B) / (tp + B)) * 1e6)) <= 1

    def test_null_label_counts_as_bad_and_model_is_small(self, spark):
        from swarm_spark.ops.text import nb_train_quality

        df = spark.createDataFrame(
            [(1, "alpha beta", 1), (2, "gamma delta", None)],
            "doc_id long, text string, good int",
        )
        model = nb_train_quality(df, F.col("good") == 1, num_buckets=64)
        rows = model.collect()
        assert len(rows) <= 64 + 3
        prior = next(r["llr_micro"] for r in rows if r["bkt"] == -1)
        # dp=1, dn=1 -> prior ln(2/2)=0
        assert prior == 0
        with pytest.raises(ValueError):
            nb_train_quality(df, F.col("good") == 1, num_buckets=1)


class TestTopNgrams:
    def test_hand_case_counts_and_rank(self, spark):
        from swarm_spark.ops.text import top_ngrams

        df = spark.createDataFrame(
            [
                (1, "click here to accept cookies now please"),
                (2, "click here to accept cookies today"),
                (3, "totally unrelated text with other words"),
                (4, "click here to accept cookies now again"),
            ],
            "doc_id long, text string",
        )
        rows = top_ngrams(df, n=5, top_k=10, min_count=2).collect()
        by = {r["ngram"]: r for r in rows}
        assert by["click here to accept cookies"]["count"] == 3
        assert by["click here to accept cookies"]["doc_freq"] == 3
        assert by["click here to accept cookies"]["rank"] == 1
        assert by["here to accept cookies now"]["count"] == 2
        # singleton n-grams pruned by min_count
        assert "totally unrelated text with other" not in by

    def test_occurrences_vs_doc_freq(self, spark):
        from swarm_spark.ops.text import top_ngrams

        # one doc repeats the 2-gram 3 times; another has it once
        df = spark.createDataFrame(
            [(1, "ha ha ha ha"), (2, "ha ha no")], "doc_id long, text string"
        )
        (row,) = top_ngrams(df, n=2, top_k=1, min_count=2).collect()
        assert row["ngram"] == "ha ha"
        assert row["count"] == 4 and row["doc_freq"] == 2

    def test_bad_args(self, spark):
        import pytest as _pytest

        from swarm_spark.ops.text import top_ngrams

        df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        with _pytest.raises(ValueError):
            top_ngrams(df, n=0)
        with _pytest.raises(ValueError):
            top_ngrams(df, top_k=0)


class TestGroupValueQuantiles:
    def test_matches_nearest_rank_reference(self, spark):
        import math
        import random

        from swarm_spark.ops.text import group_value_quantiles

        rng = random.Random(5)
        rows = [
            (f"g{rng.randrange(3)}", rng.randrange(1, 40)) for _ in range(500)
        ]
        df = spark.createDataFrame(rows, "g string, v long")
        got = {
            (r["g"], r["q_permille"]): (r["value"], r["n_rows"])
            for r in group_value_quantiles(df, "g", "v", (250, 500, 900, 1000)).collect()
        }
        from collections import defaultdict

        by_g = defaultdict(list)
        for g, v in rows:
            by_g[g].append(v)
        for g, vals in by_g.items():
            vals.sort()
            n = len(vals)
            for q in (250, 500, 900, 1000):
                expect = vals[math.ceil(q * n / 1000) - 1]
                assert got[(g, q)] == (expect, n), (g, q)

    def test_bounded_window_is_histogram_sized(self, spark):
        """The quantile window partitions over HISTOGRAM rows (distinct
        values per group), never raw rows — pin by plan: the window's
        input is the aggregated (group, value) frame."""
        from swarm_spark.ops.text import group_value_quantiles

        df = spark.createDataFrame(
            [("a", i % 5) for i in range(1000)], "g string, v long"
        )
        out = group_value_quantiles(df, "g", "v")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "WindowExec" not in plan or "percentile" not in plan.lower()
        rows = out.collect()
        assert {r["q_permille"] for r in rows} == {500, 900, 990}
        assert all(r["n_rows"] == 1000 for r in rows)

    def test_bad_quantile_points(self, spark):
        import pytest as _pytest

        from swarm_spark.ops.text import group_value_quantiles

        df = spark.createDataFrame([("a", 1)], "g string, v long")
        with _pytest.raises(ValueError):
            group_value_quantiles(df, "g", "v", (0,))
        with _pytest.raises(ValueError):
            group_value_quantiles(df, "g", "v", (1001,))
        with _pytest.raises(ValueError):
            group_value_quantiles(df, "g", "v", ())


class TestVocabDrift:
    def _counts(self, spark, pairs):
        return spark.createDataFrame(pairs, "tok string, cnt long")

    def test_identical_distributions_are_zero(self, spark):
        from swarm_spark.ops.text import vocab_js_divergence

        a = self._counts(spark, [("x", 10), ("y", 30)])
        b = self._counts(spark, [("x", 20), ("y", 60)])  # same distribution
        (row,) = vocab_js_divergence(a, b).collect()
        assert row["js_micro"] == 0
        assert row["vocab_union"] == 2 and row["tokens_wave"] == 80

    def test_disjoint_vocabs_hit_ln2(self, spark):
        import math

        from swarm_spark.ops.text import vocab_js_divergence

        a = self._counts(spark, [("x", 5), ("y", 5)])
        b = self._counts(spark, [("u", 3), ("v", 7)])
        (row,) = vocab_js_divergence(a, b).collect()
        # JS of disjoint supports = ln 2 exactly (the upper bound)
        assert abs(row["js_micro"] - round(math.log(2) * 1e6)) <= 2
        assert row["vocab_stored"] == 2 and row["vocab_wave"] == 2
        assert row["vocab_union"] == 4

    def test_drift_orders_and_empty_rejected(self, spark):
        import pytest as _pytest

        from swarm_spark.ops.text import vocab_js_divergence

        base = self._counts(spark, [("x", 50), ("y", 50)])
        near = self._counts(spark, [("x", 55), ("y", 45)])
        far = self._counts(spark, [("x", 95), ("y", 5)])
        js_near = vocab_js_divergence(base, near).head()["js_micro"]
        js_far = vocab_js_divergence(base, far).head()["js_micro"]
        assert 0 < js_near < js_far
        with _pytest.raises(ValueError, match="non-empty"):
            vocab_js_divergence(base, base.limit(0)).collect()


class TestHistogramMerge:
    def test_merge_equals_full_recompute(self, spark):
        """The value histogram is a count monoid: folding two waves'
        histograms equals the full-corpus histogram EXACTLY, and so do
        the quantiles computed from it — incremental quantile
        maintenance never rescans history."""
        from swarm_spark.ops.text import (
            group_value_quantiles,
            histogram_merge,
            quantiles_from_histogram,
            value_histogram_counts,
        )

        rows = [(i, "g%d" % (i % 3), (i * 7) % 11) for i in range(200)]
        df = spark.createDataFrame(rows, "id long, g string, v long")
        a = value_histogram_counts(df.where("id % 2 = 0"), "g", "v")
        b = value_histogram_counts(df.where("id % 2 = 1"), "g", "v")
        merged = histogram_merge(a, b)
        full = value_histogram_counts(df, "g", "v")
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, full.collect())
        )
        mq = sorted(map(tuple, quantiles_from_histogram(merged, "g").collect()))
        fq = sorted(map(tuple, group_value_quantiles(df, "g", "v").collect()))
        assert mq == fq


class TestFilterByGroupQuantile:
    def test_keeps_top_half_per_group(self, spark):
        from swarm_spark.ops.text import filter_by_group_quantile

        rows = [("a", v) for v in range(1, 11)] + [("b", v) for v in (100, 200)]
        df = spark.createDataFrame(rows, "g string, v long")
        kept = filter_by_group_quantile(df, "g", "v", q_permille=500).collect()
        by = {}
        for r in kept:
            by.setdefault(r["g"], set()).add(r["v"])
        # a: median (nearest-rank, n=10 -> 5th value = 5) and above
        assert by["a"] == {5, 6, 7, 8, 9, 10}
        # b: median of [100, 200] is 100 -> both kept (adaptive per group)
        assert by["b"] == {100, 200}

    def test_keep_le_inverts(self, spark):
        from swarm_spark.ops.text import filter_by_group_quantile

        df = spark.createDataFrame(
            [("a", v) for v in range(1, 11)], "g string, v long"
        )
        kept = {r["v"] for r in
                filter_by_group_quantile(df, "g", "v", 500, keep="le").collect()}
        assert kept == {1, 2, 3, 4, 5}
        import pytest as _pytest

        with _pytest.raises(ValueError):
            filter_by_group_quantile(df, "g", "v", 500, keep="between")


class TestChunkText:
    def test_hand_case_windows(self, spark):
        from swarm_spark.ops.text import chunk_text

        df = spark.createDataFrame(
            [(1, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"), (2, "a b c"), (3, "")],
            "doc_id long, text string",
        )
        out = chunk_text(df, size=4, overlap=2).collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault(r["doc_id"], []).append(r)
        # 10 tokens, size 4, stride 2 -> starts 0,2,4,6 (6+4 >= 10 stops)
        d1 = by_doc[1]
        assert [(r["chunk_id"], r["start_tok"], r["n_tok"]) for r in d1] == [
            (0, 0, 4), (1, 2, 4), (2, 4, 4), (3, 6, 4)
        ]
        assert d1[0]["chunk"] == "t0 t1 t2 t3"
        assert d1[3]["chunk"] == "t6 t7 t8 t9"
        # short doc -> one (shorter) window; empty text -> one ['']
        # token (the whitespace-token contract), still one chunk
        assert [(r["start_tok"], r["n_tok"], r["chunk"]) for r in by_doc[2]] == [
            (0, 3, "a b c")
        ]
        assert len(by_doc[3]) == 1

    def test_every_token_covered_and_strides_exact(self, spark):
        from swarm_spark.ops.text import chunk_text

        df = spark.createDataFrame(
            [(i, " ".join(f"w{j}" for j in range(i))) for i in range(1, 40)],
            "doc_id long, text string",
        )
        out = chunk_text(df, size=8, overlap=3).collect()
        for r in out:
            assert 1 <= r["n_tok"] <= 8
            assert r["start_tok"] == r["chunk_id"] * 5
        cover = {}
        for r in out:
            cover.setdefault(r["doc_id"], set()).update(
                range(r["start_tok"], r["start_tok"] + r["n_tok"])
            )
        for i in range(1, 40):
            assert cover[i] == set(range(i))
        # no window fully contained in its predecessor
        for doc, rows in ((d, [r for r in out if r["doc_id"] == d]) for d in (25, 39)):
            ends = [r["start_tok"] + r["n_tok"] for r in sorted(rows, key=lambda r: r["chunk_id"])]
            assert ends == sorted(set(ends))

    def test_bad_params(self, spark):
        from swarm_spark.ops.text import chunk_text

        df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        with pytest.raises(ValueError):
            chunk_text(df, size=0)
        with pytest.raises(ValueError):
            chunk_text(df, size=4, overlap=4)


class TestVocabMerge:
    def test_merge_equals_full_recompute(self, spark):
        from swarm_spark.ops.text import vocab_counts, vocab_merge, vocab_report

        a = spark.createDataFrame(
            [(1, "x y x"), (2, "y z")], "doc_id long, text string"
        )
        b = spark.createDataFrame(
            [(3, "z z w"), (4, "x")], "doc_id long, text string"
        )
        merged = vocab_merge(vocab_counts(a), vocab_counts(b))
        full = vocab_counts(a.unionByName(b))
        assert {(r["tok"], r["cnt"]) for r in merged.collect()} == {
            (r["tok"], r["cnt"]) for r in full.collect()
        } == {("x", 3), ("y", 2), ("z", 3), ("w", 1)}
        rep = vocab_report(merged, top_k=2).collect()
        assert [(r["token"], r["count"], r["rank"]) for r in rep] == [
            ("x", 3, 1), ("z", 3, 2)
        ]
        assert rep[-1]["cum_share"] == round(6 / 9, 6)


class TestSharedSubstringRuns:
    def test_planted_verbatim_passage(self, spark):
        from swarm_spark.ops.dedup import shared_substring_runs

        passage = " ".join(f"p{j}" for j in range(20))
        rows = [
            (1, "a1 a2 a3 " + passage + " a4 a5"),          # passage at pos 3
            (2, passage + " b1 b2 b3 b4 b5 b6 b7"),          # passage at pos 0
            (3, " ".join(f"c{j}" for j in range(30))),       # shares nothing
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = shared_substring_runs(df, k=8, min_run=16).collect()
        assert [(r["doc_a"], r["doc_b"], r["start_a"], r["start_b"], r["run_tokens"])
                for r in out] == [(1, 2, 3, 0, 20)]

    def test_runs_are_maximal_not_fragmented(self, spark):
        """m matching k-grams on one diagonal merge into ONE run of
        m + k - 1 tokens; a second, disjoint shared passage yields a
        separate row."""
        from swarm_spark.ops.dedup import shared_substring_runs

        s1 = " ".join(f"x{j}" for j in range(12))
        s2 = " ".join(f"y{j}" for j in range(10))
        d1 = s1 + " q1 q2 q3 q4 q5 " + s2
        d2 = s1 + " r1 r2 r3 " + s2
        df = spark.createDataFrame(
            [(1, d1), (2, d2)], "doc_id long, text string"
        )
        out = sorted(
            shared_substring_runs(df, k=5, min_run=8).collect(),
            key=lambda r: r["start_a"],
        )
        assert [(r["start_a"], r["start_b"], r["run_tokens"]) for r in out] == [
            (0, 0, 12), (17, 15, 10)
        ]

    def test_param_validation(self, spark):
        from swarm_spark.ops.dedup import shared_substring_runs

        df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
        with pytest.raises(ValueError):
            shared_substring_runs(df, k=1)
        with pytest.raises(ValueError):
            shared_substring_runs(df, k=8, min_run=4)


class TestHashedEmbedding:
    def test_unit_norm_and_zero_doc(self, spark):
        from swarm_spark.ops.text import hashed_embedding

        df = spark.createDataFrame(
            [(1, "alpha beta gamma delta"), (2, "")],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r["vec"] for r in hashed_embedding(df, dim=16).collect()}
        n2 = sum(x * x for x in out[1])
        assert abs(n2 - 1.0) < 1e-6
        # empty text hashes the one '' token somewhere — still unit;
        # raw (unnormalized) components are integral
        raw = {
            r["doc_id"]: r["vec"]
            for r in hashed_embedding(df, dim=16, normalize=False).collect()
        }
        assert all(float(x).is_integer() for x in raw[1])

    def test_feeds_semantic_dedup(self, spark):
        """The whole point: raw text -> hashed vectors -> SemDeDup
        finds the planted near-identical documents."""
        from swarm_spark.ops.semdedup import semantic_dup_pairs
        from swarm_spark.ops.text import hashed_embedding

        rows = [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog today"),
            (3, "completely different subject matter entirely here now"),
            (4, "unrelated text about cooking pasta with garlic butter"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        emb = hashed_embedding(df, dim=32)
        # n_cells=1: with 4 docs, k-means init would seed docs 1 and 2
        # as separate centroids and block the very pair we planted
        pairs = semantic_dup_pairs(
            emb, vec_col="vec", id_col="doc_id", n_cells=1, iters=1,
            threshold=0.8,
        ).collect()
        found = {(r["id_a"], r["id_b"]) for r in pairs}
        assert (1, 2) in found
        assert all(p == (1, 2) or 3 not in p and 4 not in p for p in found)


class TestShardAssignments:
    def test_shards_token_balanced_and_deterministic(self, spark):
        from swarm_spark.ops.packing import shard_assignments

        df = spark.createDataFrame(
            [(i, " ".join(["t"] * (5 + i % 7))) for i in range(60)],
            "doc_id long, text string",
        )
        out = shard_assignments(df, n_shards=4).collect()
        total = sum(r["n_tok"] for r in out)
        cap = -(-total // 4)
        by_shard = {}
        for r in out:
            by_shard.setdefault(r["shard"], []).append(r["n_tok"])
        assert set(by_shard) <= set(range(4))
        mx = max(r["n_tok"] for r in out)
        # each shard within one doc of the capacity target
        for s, toks in by_shard.items():
            assert sum(toks) < cap + mx
        # partition-invariant
        again = shard_assignments(df.repartition(7), n_shards=4, num_partitions=3).collect()
        assert {(r["doc_id"], r["shard"]) for r in again} == {
            (r["doc_id"], r["shard"]) for r in out
        }

    def test_single_shard_and_validation(self, spark):
        from swarm_spark.ops.packing import shard_assignments

        df = spark.createDataFrame([(1, "a b"), (2, "c")], "doc_id long, text string")
        out = shard_assignments(df, n_shards=1).collect()
        assert {r["shard"] for r in out} == {0}
        with pytest.raises(ValueError):
            shard_assignments(df, n_shards=0)


class TestSubstringRunsRandomized:
    def test_matches_bruteforce_on_random_corpora(self, spark):
        """Diagonal/islands logic vs a quadratic per-pair reference on
        a random corpus with planted shared slices (fixed seed)."""
        import random

        from swarm_spark.ops.dedup import shared_substring_runs

        rnd = random.Random(20260814)
        k, min_run = 4, 6
        vocab = [f"w{j}" for j in range(25)]  # small vocab -> chance collisions
        docs = []
        for i in range(24):
            docs.append((i, [rnd.choice(vocab) for _ in range(rnd.randint(4, 30))]))
        # plant shared slices across random pairs
        for _ in range(6):
            a, b = rnd.sample(range(24), 2)
            seg = [rnd.choice(vocab) for _ in range(rnd.randint(6, 12))]
            pa = rnd.randint(0, len(docs[a][1]))
            pb = rnd.randint(0, len(docs[b][1]))
            docs[a] = (a, docs[a][1][:pa] + seg + docs[a][1][pa:])
            docs[b] = (b, docs[b][1][:pb] + seg + docs[b][1][pb:])

        def grams(toks):
            return [tuple(toks[i:i + k]) for i in range(len(toks) - k + 1)]

        expected = set()
        for ia in range(24):
            for ib in range(ia + 1, 24):
                ga, gb = grams(docs[ia][1]), grams(docs[ib][1])
                match = {
                    (pa, pb)
                    for pa, g in enumerate(ga)
                    for pb, h in enumerate(gb)
                    if g == h
                }
                for (pa, pb) in match:
                    if (pa - 1, pb - 1) in match:
                        continue  # not a run start
                    ln = 0
                    while (pa + ln, pb + ln) in match:
                        ln += 1
                    run_tokens = ln + k - 1
                    if run_tokens >= min_run:
                        expected.add((ia, ib, pa, pb, run_tokens))

        df = spark.createDataFrame(
            [(i, " ".join(t)) for i, t in docs], "doc_id long, text string"
        )
        got = {
            (r["doc_a"], r["doc_b"], r["start_a"], r["start_b"], r["run_tokens"])
            for r in shared_substring_runs(
                df, k=k, min_run=min_run, max_df=10_000
            ).collect()
        }
        assert expected, "seed produced no runs — regenerate the fixture"
        assert got == expected


class TestBigramSurprisal:
    def test_repetitive_doc_scores_below_novel_doc(self, spark):
        from swarm_spark.ops.text import bigram_surprisal

        rows = [
            (1, "a b a b a b a b a b"),          # one dominant transition
            (2, "q w e r t y u i o p"),          # all transitions unique
            (3, "a b"),                           # shares doc 1's transition
            (4, "x"),                              # < 2 tokens: excluded
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: r for r in bigram_surprisal(df).collect()}
        assert 4 not in out
        assert out[1]["n_bigrams"] == 9 and out[2]["n_bigrams"] == 9
        assert out[1]["avg_surprisal_micro"] < out[2]["avg_surprisal_micro"]
        # doc 3 rides doc 1's frequent transition: also low surprisal
        assert out[3]["avg_surprisal_micro"] < out[2]["avg_surprisal_micro"]


class TestCountMinSketch:
    def _tokens(self, spark):
        # known multiset: tok_i occurs i times, i in 1..40 (total 820)
        rows = [(f"tok{i:02d}",) for i in range(1, 41) for _ in range(i)]
        return spark.createDataFrame(rows, "tok string")

    def test_never_undercounts_and_is_tight_when_wide(self, spark):
        from swarm_spark.ops.sketch import cms_lookup, cms_sketch

        toks = self._tokens(spark)
        sk = cms_sketch(toks, "tok", width=1024, depth=4)
        est = {
            r["tok"]: r["est"]
            for r in cms_lookup(
                sk, toks.select("tok").distinct(), "tok", width=1024, depth=4
            ).collect()
        }
        exact = {f"tok{i:02d}": i for i in range(1, 41)}
        assert set(est) == set(exact)
        for k, true in exact.items():
            assert est[k] >= true, (k, est[k], true)
        # 40 keys in 1024 columns x 4 rows: min over rows is exact
        assert est == exact

    def test_narrow_sketch_overcounts_never_undercounts(self, spark):
        from swarm_spark.ops.sketch import cms_lookup, cms_sketch

        toks = self._tokens(spark)
        sk = cms_sketch(toks, "tok", width=8, depth=2)
        est = {
            r["tok"]: r["est"]
            for r in cms_lookup(
                sk, toks.select("tok").distinct(), "tok", width=8, depth=2
            ).collect()
        }
        assert all(est[f"tok{i:02d}"] >= i for i in range(1, 41))
        assert sum(est.values()) > 820  # collisions forced at width 8

    def test_unseen_key_estimates_zero_when_cell_empty(self, spark):
        from swarm_spark.ops.sketch import cms_lookup, cms_sketch

        toks = self._tokens(spark)
        sk = cms_sketch(toks, "tok", width=4096, depth=4)
        probe = spark.createDataFrame([("never-seen-key-xyz",)], "tok string")
        (row,) = cms_lookup(sk, probe, "tok", width=4096, depth=4).collect()
        assert row["est"] == 0

    def test_merge_equals_recompute(self, spark):
        from swarm_spark.ops.sketch import cms_merge, cms_sketch

        toks = self._tokens(spark)
        even = F.substring("tok", 4, 2).cast("int") % 2 == 0
        a, b = toks.where(even), toks.where(~even)
        merged = cms_merge(
            cms_sketch(a, "tok", width=64, depth=3),
            cms_sketch(b, "tok", width=64, depth=3),
        )
        full = cms_sketch(toks, "tok", width=64, depth=3)
        diff = (
            merged.withColumnRenamed("cnt", "ca")
            .join(full.withColumnRenamed("cnt", "cb"), ["row", "col"], "full")
            .where(
                F.coalesce("ca", F.lit(-1)) != F.coalesce("cb", F.lit(-1))
            )
            .count()
        )
        assert diff == 0

    def test_partitioning_invariant(self, spark):
        from swarm_spark.ops.sketch import cms_sketch

        toks = self._tokens(spark)
        a = sorted(map(tuple, cms_sketch(toks, "tok", width=32, depth=2).collect()))
        b = sorted(
            map(tuple, cms_sketch(toks.repartition(13), "tok", width=32, depth=2).collect())
        )
        assert a == b

    def test_heavy_hitters_one_sided(self, spark):
        from swarm_spark.ops.sketch import cms_heavy_hitters

        toks = self._tokens(spark)
        hh = {
            r["tok"]: r["est"]
            for r in cms_heavy_hitters(toks, "tok", threshold=30, width=1024, depth=4).collect()
        }
        # every truly-heavy key survives (the one-sided guarantee)
        assert {f"tok{i:02d}" for i in range(30, 41)} <= set(hh)
        # and at this width nothing rides along
        assert set(hh) == {f"tok{i:02d}" for i in range(30, 41)}

    def test_validation(self, spark):
        import pytest as _pytest

        from swarm_spark.ops.sketch import cms_heavy_hitters, cms_sketch

        toks = self._tokens(spark)
        with _pytest.raises(ValueError):
            cms_sketch(toks, "tok", width=0)
        with _pytest.raises(ValueError):
            cms_sketch(toks, "tok", depth=0)
        with _pytest.raises(ValueError):
            cms_heavy_hitters(toks, "tok", threshold=0)


class TestHyperLogLog:
    def _keys(self, spark, n, dup=1):
        rows = [(f"key-{i:06d}",) for i in range(n) for _ in range(dup)]
        return spark.createDataFrame(rows, "k string")

    def _estimate(self, spark, n, p=12):
        from swarm_spark.ops.sketch import hll_estimate, hll_registers

        regs = hll_registers(self._keys(spark, n), "k", p=p)
        (row,) = hll_estimate(regs, p=p).collect()
        return row

    def test_large_range_within_flajolet_error(self, spark):
        # sigma ~ 1.04/sqrt(4096) = 1.6%; 4 sigma = 6.5%
        row = self._estimate(spark, 10_000)
        assert abs(row["estimate"] - 10_000) <= 650
        assert row["m_regs"] == 4096

    def test_small_range_uses_linear_counting(self, spark):
        # 50 keys in 4096 registers: the linear-counting branch, near-exact
        row = self._estimate(spark, 50)
        assert row["nonzero_regs"] <= 50
        assert abs(row["estimate"] - 50) <= 3

    def test_duplicates_are_free(self, spark):
        from swarm_spark.ops.sketch import hll_registers

        once = sorted(map(tuple, hll_registers(self._keys(spark, 500), "k").collect()))
        thrice = sorted(
            map(tuple, hll_registers(self._keys(spark, 500, dup=3), "k").collect())
        )
        assert once == thrice

    def test_merge_equals_recompute(self, spark):
        from swarm_spark.ops.sketch import hll_merge, hll_registers

        keys = self._keys(spark, 2_000)
        odd = F.substring("k", 5, 6).cast("int") % 2 == 1
        merged = hll_merge(
            hll_registers(keys.where(odd), "k"),
            hll_registers(keys.where(~odd), "k"),
        )
        full = hll_registers(keys, "k")
        diff = (
            merged.withColumnRenamed("rho", "ra")
            .join(full.withColumnRenamed("rho", "rb"), "bucket", "full")
            .where(F.coalesce("ra", F.lit(-1)) != F.coalesce("rb", F.lit(-1)))
            .count()
        )
        assert diff == 0

    def test_partitioning_invariant(self, spark):
        from swarm_spark.ops.sketch import hll_registers

        keys = self._keys(spark, 1_000)
        a = sorted(map(tuple, hll_registers(keys, "k").collect()))
        b = sorted(map(tuple, hll_registers(keys.repartition(13), "k").collect()))
        assert a == b

    def test_overlapping_waves_merge_exactly(self, spark):
        # max monoid: overlapping (non-partitioned) waves still fold exactly
        from swarm_spark.ops.sketch import hll_estimate, hll_merge, hll_registers

        a = self._keys(spark, 800)                      # key-000000..000799
        b = self._keys(spark, 1_000).where(F.substring("k", 5, 6).cast("int") >= 400)
        merged = hll_merge(hll_registers(a, "k"), hll_registers(b, "k"))
        (got,) = hll_estimate(merged).collect()
        (want,) = hll_estimate(hll_registers(self._keys(spark, 1_000), "k")).collect()
        assert tuple(got) == tuple(want)

    def test_p16_harmonic_sum_does_not_overflow(self, spark):
        # p=16: 65536 registers x 2^49 each puts sum_scaled near 2^65,
        # past int64 — the decimal(38,0) accumulator must carry it
        # without wrapping (a bigint sum silently goes negative under
        # non-ANSI Spark and corrupts the estimate)
        row = self._estimate(spark, 2_000, p=16)
        assert row["m_regs"] == 65536
        assert int(row["sum_scaled"]) > (1 << 63)
        assert abs(row["estimate"] - 2_000) <= 60  # linear-count branch

    def test_validation(self, spark):
        import pytest as _pytest

        from swarm_spark.ops.sketch import hll_estimate, hll_registers

        keys = self._keys(spark, 10)
        with _pytest.raises(ValueError):
            hll_registers(keys, "k", p=10)
        with _pytest.raises(ValueError):
            hll_estimate(hll_registers(keys, "k"), p=7)
