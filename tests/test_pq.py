"""Product quantization: deterministic training, encode semantics
against hand-built codebooks, integral ADC, and the two-stage rerank.
The full-value DuckDB parity is pinned by test_oracle (ann_pq_adc /
ann_pq_rerank); these tests cover the operator contracts directly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from swarm_spark.ops.pq import pq_encode, pq_topk, pq_topk_rerank, pq_train


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


@pytest.fixture()
def corpus(spark):
    # two tight 4-d clusters + a stray, ids interleaved
    rows = [
        (0, [1.0, 1.0, 0.0, 0.0]),
        (1, [9.0, 9.0, 8.0, 8.0]),
        (2, [1.1, 0.9, 0.1, -0.1]),
        (3, [8.9, 9.1, 8.1, 7.9]),
        (4, [0.9, 1.1, -0.1, 0.1]),
        (5, [9.1, 8.9, 7.9, 8.1]),
        (6, [5.0, 5.0, 4.0, 4.0]),
    ]
    return _vecs(spark, rows)


class TestTrainEncode:
    def test_training_is_partitioning_invariant(self, spark, corpus):
        a = sorted(map(tuple, pq_train(corpus, m=2, k=2, iters=2).collect()))
        b = sorted(
            map(tuple, pq_train(corpus.repartition(5), m=2, k=2, iters=2).collect())
        )
        assert a == b
        assert len(a) == 2 * 2  # m*k rows

    def test_encode_against_hand_codebooks(self, spark, corpus):
        """pq_encode is pure nearest-code assignment: with hand-built
        codebooks the expected codes are computable by eye."""
        books = spark.createDataFrame(
            [
                # sub 0 over dims 1-2, sub 1 over dims 3-4
                (0, 0, [1.0, 1.0], 2.0),
                (0, 1, [9.0, 9.0], 162.0),
                (1, 0, [0.0, 0.0], 0.0),
                (1, 1, [8.0, 8.0], 128.0),
            ],
            "sub int, code int, cv array<double>, cn2 double",
        )
        codes = {
            r["id"]: r["codes"] for r in pq_encode(corpus, books, m=2).collect()
        }
        assert codes[0] == [0, 0] and codes[2] == [0, 0] and codes[4] == [0, 0]
        assert codes[1] == [1, 1] and codes[3] == [1, 1] and codes[5] == [1, 1]
        assert codes[6] == [0, 0]  # exact midpoint: tie -> smallest code

    def test_encode_tie_breaks_by_code_id(self, spark):
        df = _vecs(spark, [(7, [0.5, 0.5])])
        books = spark.createDataFrame(
            [(0, 0, [0.0, 0.0], 0.0), (0, 1, [1.0, 1.0], 2.0)],
            "sub int, code int, cv array<double>, cn2 double",
        )
        (row,) = pq_encode(df, books, m=1).collect()
        assert row["codes"] == [0]  # equidistant -> smallest code

    def test_bad_args(self, spark, corpus):
        with pytest.raises(ValueError, match="divisible"):
            pq_train(corpus, m=3, k=2)
        with pytest.raises(ValueError, match="need >= k"):
            pq_train(corpus, m=2, k=100)
        with pytest.raises(ValueError):
            pq_train(corpus, m=0, k=2)
        with pytest.raises(ValueError, match="empty"):
            pq_train(corpus.limit(0), m=2, k=2)

    def test_ragged_dims_fail_fast(self, spark, corpus):
        """A corpus with ragged embedding lengths must FAIL, not
        silently zero-pad short slices into garbage centroids/codes
        (ADVICE r8). The guard is in-plan (raise_error inside the
        subvector explode), so train, encode, and the query side of
        search all inherit it with zero extra scans."""
        ragged = corpus.unionByName(
            _vecs(spark, [(99, [1.0, 2.0])])  # dim 2 among dim-4 rows
        )
        # wrapper class varies (SparkRuntimeException vs Py4JJavaError)
        # with where the action surfaces the task failure — pin the
        # raise_error MESSAGE, not the wrapper
        with pytest.raises(Exception, match="ragged"):
            pq_train(ragged, m=2, k=2, iters=1)
        books = pq_train(corpus, m=2, k=2, iters=1)
        with pytest.raises(Exception, match="ragged"):
            pq_encode(ragged, books, m=2).collect()
        codes = pq_encode(corpus, books, m=2)
        with pytest.raises(Exception, match="ragged"):
            pq_topk(codes, ragged, books, k=2, m=2).collect()


class TestAdcSearch:
    def _index(self, spark, corpus):
        books = pq_train(corpus, m=2, k=2, iters=3)
        return books, pq_encode(corpus, books, m=2)

    def test_nearest_cluster_wins_and_self_excluded(self, spark, corpus):
        books, codes = self._index(spark, corpus)
        queries = corpus.where(F.col("vec_id") == 0)
        out = pq_topk(codes, queries, books, k=3, m=2).collect()
        ids = [r["id"] for r in out]
        assert 0 not in ids  # self excluded
        assert set(ids) <= {2, 4, 6, 1, 3, 5}
        # same-cluster neighbors (2, 4) outrank the far cluster
        assert set(ids[:2]) == {2, 4}
        assert [r["rank"] for r in out] == [1, 2, 3]

    def test_adc_is_integral_and_partitioning_invariant(self, spark, corpus):
        books, codes = self._index(spark, corpus)
        queries = corpus.where(F.col("vec_id") % 2 == 0)
        a = sorted(map(tuple, pq_topk(codes, queries, books, k=3, m=2).collect()))
        b = sorted(
            map(
                tuple,
                pq_topk(
                    codes.repartition(7), queries, books, k=3, m=2, n_salts=3
                ).collect(),
            )
        )
        assert a == b
        assert all(isinstance(t[2], int) for t in a)  # micro-unit longs

    def test_ivfpq_full_probe_equals_plain_adc(self, spark, corpus):
        """With nprobe == n_cells every cell is probed, so IVF-PQ must
        reduce exactly to the plain ADC scan — the cell gate only ever
        REMOVES candidates, deterministically."""
        from swarm_spark.ops.pq import ann_topk_ivfpq

        queries = corpus.where(F.col("vec_id") % 2 == 0)
        books, codes = self._index(spark, corpus)
        plain = sorted(
            map(tuple, pq_topk(codes, queries, books, k=3, m=2).collect())
        )
        full_probe = sorted(
            map(
                tuple,
                ann_topk_ivfpq(
                    corpus, queries, k=3, n_cells=2, nprobe=2,
                    cell_iters=2, m=2, pq_k=2, pq_iters=3,
                ).collect(),
            )
        )
        assert full_probe == plain

    @pytest.mark.sweep  # heavyweight referee: full run via `-m ""` (pytest.ini)
    def test_broadcast_guard_fallback_is_identical(self, spark, corpus):
        """An oversized query batch must fall back from the broadcast
        LUT/probes to plain equi-joins with IDENTICAL output (the
        similarity-tier guard — an unguarded broadcast of a huge batch
        OOMs the driver)."""
        from swarm_spark.ops.pq import ann_topk_ivfpq

        queries = corpus.where(F.col("vec_id") % 2 == 0)
        books, codes = self._index(spark, corpus)
        want = sorted(
            map(tuple, pq_topk(codes, queries, books, k=3, m=2).collect())
        )
        got = sorted(
            map(
                tuple,
                pq_topk(
                    codes, queries, books, k=3, m=2, broadcast_max_queries=1
                ).collect(),
            )
        )
        assert got == want
        kw = dict(k=3, n_cells=2, nprobe=2, cell_iters=2, m=2, pq_k=2, pq_iters=3)
        want = sorted(map(tuple, ann_topk_ivfpq(corpus, queries, **kw).collect()))
        got = sorted(
            map(
                tuple,
                ann_topk_ivfpq(
                    corpus, queries, broadcast_max_queries=None, **kw
                ).collect(),
            )
        )
        assert got == want

    def test_probe_requires_cell_column(self, spark, corpus):
        from swarm_spark.ops.pq import pq_probe_cells

        books, codes = self._index(spark, corpus)
        cent = spark.createDataFrame(
            [(0, [1.0, 1.0, 0.0, 0.0], 2.0)], "cell int, ccv array<double>, ccn2 double"
        )
        with pytest.raises(ValueError, match="cell"):
            pq_probe_cells(codes, cent, corpus, books, m=2)

    def test_rerank_returns_exact_cosine_order(self, spark, corpus):
        """With shortlist >= corpus the rerank IS brute force: compare
        against ann_topk_bruteforce directly."""
        from swarm_spark.ops.similarity import ann_topk_bruteforce

        books, codes = self._index(spark, corpus)
        queries = corpus.where(F.col("vec_id") % 2 == 0)
        got = sorted(
            map(
                tuple,
                pq_topk_rerank(
                    corpus, codes, queries, books, k=3, shortlist=10, m=2
                ).collect(),
            )
        )
        want = sorted(
            map(tuple, ann_topk_bruteforce(corpus, queries, k=3, n_salts=2).collect())
        )
        assert got == want


class TestResidualIvfPq:
    @pytest.mark.sweep  # heavyweight referee: full run via `-m ""` (pytest.ini)
    def test_one_cell_reduces_to_centered_pq(self, spark, corpus):
        """With n_cells=1 the residual variant IS plain PQ over the
        mean-centered corpus: subtract build_ivf's own centroid in
        Python and the two pipelines must agree row for row (same
        Lloyd contract, same micro rounding)."""
        from swarm_spark.ops.ivf import build_ivf
        from swarm_spark.ops.pq import ann_topk_ivfpq_residual

        _, centroids = build_ivf(corpus, n_cells=1, iters=2)
        (crow,) = centroids.collect()
        cc = list(crow["ccv"])
        centered = _vecs(
            spark,
            [
                (r["vec_id"], [a - b for a, b in zip(r["embedding"], cc)])
                for r in corpus.collect()
            ],
        )
        queries = corpus.where(F.col("vec_id") % 2 == 0)
        books = pq_train(centered, m=2, k=2, iters=3)
        codes = pq_encode(centered, books, m=2)
        cq = centered.where(F.col("vec_id") % 2 == 0)
        want = sorted(map(tuple, pq_topk(codes, cq, books, k=3, m=2).collect()))
        got = sorted(
            map(
                tuple,
                ann_topk_ivfpq_residual(
                    corpus, queries, k=3, n_cells=1, nprobe=1,
                    cell_iters=2, m=2, pq_k=2, pq_iters=3,
                ).collect(),
            )
        )
        assert got == want

    @pytest.mark.sweep  # heavyweight referee: full run via `-m ""` (pytest.ini)
    def test_broadcast_guard_fallback_is_identical(self, spark, corpus):
        from swarm_spark.ops.pq import ann_topk_ivfpq_residual

        queries = corpus.where(F.col("vec_id") % 2 == 0)
        kw = dict(k=3, n_cells=2, nprobe=2, cell_iters=2, m=2, pq_k=2, pq_iters=3)
        want = sorted(
            map(tuple, ann_topk_ivfpq_residual(corpus, queries, **kw).collect())
        )
        got = sorted(
            map(
                tuple,
                ann_topk_ivfpq_residual(
                    corpus, queries, broadcast_max_queries=None, **kw
                ).collect(),
            )
        )
        assert got == want

    @pytest.mark.sweep  # heavyweight referee: full run via `-m ""` (pytest.ini)
    def test_partitioning_invariant(self, spark, corpus):
        from swarm_spark.ops.pq import ann_topk_ivfpq_residual

        queries = corpus.where(F.col("vec_id") % 2 == 0)
        kw = dict(k=3, n_cells=2, nprobe=2, cell_iters=2, m=2, pq_k=2, pq_iters=3)
        a = sorted(
            map(tuple, ann_topk_ivfpq_residual(corpus, queries, **kw).collect())
        )
        b = sorted(
            map(
                tuple,
                ann_topk_ivfpq_residual(
                    corpus.repartition(5), queries, n_salts=3, **kw
                ).collect(),
            )
        )
        assert a == b
        assert all(isinstance(t[2], int) for t in a)
