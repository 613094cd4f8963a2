"""Stupid-Backoff bigram LM perplexity filter (ops/lm.py): hand-
derivable counts on tiny corpora, the three-branch per-token cost,
wave-fold == retrain (the SUM-monoid contract), the gate semantics,
and model persistence. Full-value DuckDB parity of train+score is
pinned by test_oracle (text_lm_perplexity / text_lm_merge /
text_lm_gate)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from swarm_spark.ops.lm import (
    lm_gate,
    lm_merge,
    lm_perplexity,
    lm_train,
    load_lm,
    save_lm,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _counts(model):
    return {
        (r["ctx"], r["tok"]): r["cnt"] for r in model.collect()
    }


def _micro(x: float) -> int:
    v = x * 1_000_000
    return int(math.floor(abs(v) + 0.5)) * (1 if v >= 0 else -1)


class TestTrain:
    def test_unigram_and_bigram_counts(self, spark):
        m = _counts(lm_train(_docs(spark, [(1, "a b a"), (2, "b a")])))
        assert m[(None, "a")] == 3 and m[(None, "b")] == 2
        assert m[("a", "b")] == 1 and m[("b", "a")] == 2
        assert ("a", "a") not in m

    def test_empty_tokens_dropped(self, spark):
        # leading/double spaces never mint the '' token (the TF-IDF
        # all-pairs latent-divergence guard, applied here from day one)
        m = _counts(lm_train(_docs(spark, [(1, "  a  b ")])))
        assert m == {(None, "a"): 1, (None, "b"): 1, ("a", "b"): 1}

    def test_single_token_doc_has_no_bigrams(self, spark):
        m = _counts(lm_train(_docs(spark, [(1, "a")])))
        assert m == {(None, "a"): 1}


class TestScore:
    def test_three_branch_costs(self, spark):
        # corpus: "a b" x2, "a c" -> T=6, V=3
        train = _docs(spark, [(1, "a b"), (2, "a b"), (3, "a c")])
        model = lm_train(train)
        t, v = 6, 3
        out = {
            r["doc_id"]: r
            for r in lm_perplexity(
                _docs(spark, [(10, "a b"), (11, "a z")]), model
            ).collect()
        }
        # doc 10: first tok 'a' unigram (cnt 3), then seen bigram
        # (a,b): cnt 2 over ctx cnt 3
        c_first = _micro(-math.log((3 + 1) / (t + v + 1)))
        c_seen = _micro(-math.log(2 / 3))
        assert out[10]["n_toks"] == 2
        assert out[10]["cost_micro"] == c_first + c_seen
        # doc 11: 'z' is OOV -> backoff alpha * (0+1)/(T+V+1)
        c_oov = _micro(-math.log(0.4 * ((0 + 1) / (t + v + 1))))
        assert out[11]["cost_micro"] == c_first + c_oov
        assert out[11]["avg_micro"] == round((c_first + c_oov) / 2)

    def test_unseen_bigram_of_seen_words_backs_off(self, spark):
        model = lm_train(_docs(spark, [(1, "a b"), (2, "b a")]))
        t, v = 4, 2
        out = lm_perplexity(_docs(spark, [(10, "a a")]), model).head()
        c_first = _micro(-math.log((2 + 1) / (t + v + 1)))
        c_backoff = _micro(-math.log(0.4 * ((2 + 1) / (t + v + 1))))
        assert out["cost_micro"] == c_first + c_backoff

    def test_empty_doc_absent(self, spark):
        model = lm_train(_docs(spark, [(1, "a b")]))
        got = lm_perplexity(
            _docs(spark, [(10, "a"), (11, "")]), model
        ).collect()
        assert [r["doc_id"] for r in got] == [10]

    def test_alpha_validated(self, spark):
        model = lm_train(_docs(spark, [(1, "a b")]))
        with pytest.raises(ValueError):
            lm_perplexity(_docs(spark, [(1, "a")]), model, alpha=0.0)

    def test_empty_model_rejected(self, spark):
        model = lm_train(_docs(spark, [(1, "a")])).where(F.lit(False))
        with pytest.raises(ValueError):
            lm_perplexity(_docs(spark, [(1, "a")]), model)


class TestMergeMonoid:
    def test_wave_fold_equals_retrain(self, spark):
        rows = [(i, f"tok{i % 3} tok{(i + 1) % 4} tok{i % 2}") for i in range(20)]
        full = _docs(spark, rows)
        merged = lm_merge(
            lm_train(full.where(F.col("doc_id") % 2 == 0)),
            lm_train(full.where(F.col("doc_id") % 2 == 1)),
        )
        assert _counts(merged) == _counts(lm_train(full))

    def test_scores_identical_after_fold(self, spark):
        rows = [(i, f"w{i % 5} w{(i * 7) % 5} w{i % 3}") for i in range(30)]
        full = _docs(spark, rows)
        merged = lm_merge(
            lm_train(full.where(F.col("doc_id") < 10)),
            lm_train(full.where(F.col("doc_id") >= 10)),
        )
        a = sorted(map(tuple, lm_perplexity(full, lm_train(full)).collect()))
        b = sorted(map(tuple, lm_perplexity(full, merged).collect()))
        assert a == b

    def test_merge_requires_input(self):
        with pytest.raises(ValueError):
            lm_merge()


class TestOrderN:
    def test_train_order3_counts(self, spark):
        m = _counts(lm_train(_docs(spark, [(1, "a b c a b")]), order=3))
        assert m[(None, "a")] == 2 and m[(None, "b")] == 2
        assert m[("a", "b")] == 2 and m[("b", "c")] == 1
        assert m[("a b", "c")] == 1 and m[("b c", "a")] == 1
        assert m[("c a", "b")] == 1
        assert ("a b", "a") not in m

    def test_train_short_doc_has_no_trigrams(self, spark):
        m = _counts(lm_train(_docs(spark, [(1, "a b")]), order=3))
        assert m == {(None, "a"): 1, (None, "b"): 1, ("a", "b"): 1}

    def test_order_validated(self, spark):
        d = _docs(spark, [(1, "a b")])
        with pytest.raises(ValueError):
            lm_train(d, order=0)
        with pytest.raises(ValueError):
            lm_perplexity(d, lm_train(d), order=0)

    def test_trigram_three_branch_costs(self, spark):
        # corpus "a b c" x2 + "a b d": tri (a b, c)=2, (a b, d)=1;
        # bi (a,b)=3, (b,c)=2, (b,d)=1; uni a=3 b=3 c=2 d=1 -> T=9 V=4
        train = _docs(spark, [(1, "a b c"), (2, "a b c"), (3, "a b d")])
        model = lm_train(train, order=3)
        t, v = 9, 4

        def puni(cnt):
            return (cnt + 1) / (t + v + 1)

        out = {
            r["doc_id"]: r["cost_micro"]
            for r in lm_perplexity(
                _docs(
                    spark,
                    [(10, "a b c"), (11, "b b c"), (12, "a b z")],
                ),
                model,
                order=3,
            ).collect()
        }
        # doc 10: P(a) uni; (a,b) seen bigram at m=2 (no alpha);
        # (a b, c) seen trigram: 2/3
        c10 = (
            _micro(-math.log(puni(3)))
            + _micro(-math.log(3 / 3))
            + _micro(-math.log(2 / 3))
        )
        assert out[10] == c10
        # doc 11: P(b) uni; (b,b) unseen bigram at m=2 -> alpha*P(b);
        # (b b, c) unseen tri, (b, c) seen bi -> alpha * 2/3
        c11 = (
            _micro(-math.log(puni(3)))
            + _micro(-math.log(0.4 * puni(3)))
            + _micro(-math.log(0.4 * (2 / 3)))
        )
        assert out[11] == c11
        # doc 12: last token z: tri and bi and uni all unseen at m=3
        # -> alpha^2 * P_oov
        c12 = (
            _micro(-math.log(puni(3)))
            + _micro(-math.log(3 / 3))
            + _micro(-math.log(0.4 * 0.4 * puni(0)))
        )
        assert out[12] == c12

    def test_trigram_fold_equals_retrain(self, spark):
        rows = [
            (i, f"w{i % 4} w{(i * 3) % 5} w{i % 3} w{(i * 7) % 4}")
            for i in range(40)
        ]
        full = _docs(spark, rows)
        merged = lm_merge(
            lm_train(full.where(F.col("doc_id") % 2 == 0), order=3),
            lm_train(full.where(F.col("doc_id") % 2 == 1), order=3),
        )
        assert _counts(merged) == _counts(lm_train(full, order=3))
        a = sorted(
            map(tuple, lm_perplexity(full, lm_train(full, order=3), order=3).collect())
        )
        b = sorted(map(tuple, lm_perplexity(full, merged, order=3).collect()))
        assert a == b

    def test_order3_model_scores_at_order2_like_bigram_model(self, spark):
        # lower-order tables are embedded: scoring an order-3 model at
        # order=2 must equal scoring a pure bigram model
        train = _docs(spark, [(1, "a b c a"), (2, "b c a b")])
        docs = _docs(spark, [(10, "a b c"), (11, "c c a")])
        a = sorted(
            map(tuple, lm_perplexity(docs, lm_train(train, order=3)).collect())
        )
        b = sorted(map(tuple, lm_perplexity(docs, lm_train(train)).collect()))
        assert a == b


class TestGate:
    def test_keeps_low_perplexity_docs(self, spark):
        # in-domain text scores low; OOV soup scores high
        train = _docs(spark, [(i, "the cat sat on the mat") for i in range(5)])
        model = lm_train(train)
        docs = _docs(
            spark, [(1, "the cat sat"), (2, "zz qq xx vv"), (3, "on the mat")]
        )
        scored = {
            r["doc_id"]: r["avg_micro"]
            for r in lm_perplexity(docs, model).collect()
        }
        thr = scored[1]
        kept = sorted(
            r["doc_id"] for r in lm_gate(docs, model, max(thr, scored[3])).collect()
        )
        assert 2 not in kept and 1 in kept and 3 in kept

    def test_gate_preserves_doc_columns(self, spark):
        model = lm_train(_docs(spark, [(1, "a b")]))
        out = lm_gate(_docs(spark, [(5, "a b")]), model, 10**9)
        assert out.columns == ["doc_id", "text"]
        assert out.head()["text"] == "a b"


class TestEval:
    def test_confusion_counts_exact(self, spark):
        from swarm_spark.ops.lm import lm_eval

        train = _docs(spark, [(i, "good text here") for i in range(4)])
        model = lm_train(train)
        docs = spark.createDataFrame(
            [
                (1, "good text here", True),   # low cost -> pred good
                (2, "zz qq ww vv", True),      # OOV soup -> pred bad
                (3, "good text here", False),  # low cost, labeled bad
                (4, "mm nn oo pp", False),     # high cost, labeled bad
            ],
            "doc_id long, text string, y boolean",
        )
        scored = {
            r["doc_id"]: r["avg_micro"]
            for r in lm_perplexity(docs, model).collect()
        }
        thr = scored[1]  # docs 1 and 3 at/below, 2 and 4 above
        assert scored[2] > thr and scored[4] > thr and scored[3] == thr
        rows = lm_eval(docs, model, F.col("y"), thresholds=[thr]).collect()
        assert len(rows) == 1
        r = rows[0]
        assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (1, 1, 1, 1)
        assert r["precision_micro"] == 500_000
        assert r["recall_micro"] == 500_000
        assert r["accuracy_micro"] == 500_000
        assert r["f1_micro"] == 500_000

    def test_null_label_counts_bad_and_zero_denominator_is_null(self, spark):
        from swarm_spark.ops.lm import lm_eval

        model = lm_train(_docs(spark, [(1, "a b")]))
        docs = spark.createDataFrame(
            [(1, "zz yy", None)], "doc_id long, text string, y boolean"
        )
        r = lm_eval(docs, model, F.col("y"), thresholds=[0]).head()
        # pred bad (cost > 0), label bad -> one tn; no positives at all
        assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (0, 0, 0, 1)
        assert r["precision_micro"] is None and r["recall_micro"] is None
        assert r["f1_micro"] is None and r["accuracy_micro"] == 1_000_000

    def test_zero_token_doc_counts_as_predicted_bad(self, spark):
        # ADVICE r10: lm_gate DROPS unscored (zero-token) docs, so the
        # measured curve must count them as predicted-bad — fn when
        # labeled good, tn otherwise — not silently exclude them
        from swarm_spark.ops.lm import lm_eval

        model = lm_train(_docs(spark, [(1, "a b")]))
        docs = spark.createDataFrame(
            [
                (1, "a b", True),   # scored low -> tp
                (2, "", True),      # unscored, labeled good -> fn
                (3, "   ", False),  # unscored (whitespace only) -> tn
            ],
            "doc_id long, text string, y boolean",
        )
        r = lm_eval(docs, model, F.col("y"), thresholds=[10**9]).head()
        assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (1, 0, 1, 1)

    def test_threshold_sweep_orders_rows(self, spark):
        from swarm_spark.ops.lm import lm_eval

        model = lm_train(_docs(spark, [(1, "a b c")]))
        docs = spark.createDataFrame(
            [(1, "a b", True)], "doc_id long, text string, y boolean"
        )
        rows = lm_eval(
            docs, model, F.col("y"), thresholds=[10**9, 0, 500]
        ).collect()
        assert [r["threshold_micro"] for r in rows] == [0, 500, 10**9]

    def test_empty_thresholds_rejected(self, spark):
        from swarm_spark.ops.lm import lm_eval

        model = lm_train(_docs(spark, [(1, "a")]))
        with pytest.raises(ValueError):
            lm_eval(_docs(spark, [(1, "a")]), model, F.lit(True), thresholds=[])


class TestPersistence:
    def test_save_load_round_trip(self, spark, tmp_path):
        model = lm_train(_docs(spark, [(1, "a b a"), (2, "c a")]))
        save_lm(model, str(tmp_path / "lm"))
        loaded = load_lm(spark, str(tmp_path / "lm"))
        assert _counts(loaded) == _counts(model)
        out = lm_perplexity(_docs(spark, [(9, "a b c")]), loaded)
        assert out.head()["n_toks"] == 3


class TestGroupedLM:
    """Per-group trainer/scorer (lm_train_by / lm_perplexity_by): one
    grouped frame must equal per-slice ungrouped training+scoring —
    the equivalence that makes the CCNet per-language composition one
    corpus scan instead of |languages| filtered scans."""

    def _ldocs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, lang string, text string")

    ROWS = [
        (0, "en", "the cat sat on the mat"),
        (1, "en", "the cat ran to the cat"),
        (2, "en", "a dog sat"),
        (3, "de", "der hund sitzt auf der matte"),
        (4, "de", "der hund rennt der hund"),
        (5, "fr", "le chat"),
    ]

    @pytest.mark.parametrize("order", [1, 2, 3])
    def test_grouped_equals_per_slice(self, spark, order):
        from swarm_spark.ops.lm import lm_perplexity_by, lm_train_by

        docs = self._ldocs(spark, self.ROWS)
        model = lm_train_by(docs, order=order)
        got = {
            (r["doc_id"], r["lang"]): (r["n_toks"], r["cost_micro"], r["avg_micro"])
            for r in lm_perplexity_by(docs, model, order=order).collect()
        }
        want = {}
        for lang in ("en", "de", "fr"):
            sl = docs.where(F.col("lang") == lang)
            m = lm_train(sl, order=order)
            for r in lm_perplexity(sl, m, order=order).collect():
                want[(r["doc_id"], lang)] = (
                    r["n_toks"], r["cost_micro"], r["avg_micro"]
                )
        assert got == want and len(got) == len(self.ROWS)

    def test_grouped_counts_are_per_group(self, spark):
        from swarm_spark.ops.lm import lm_train_by

        docs = self._ldocs(spark, self.ROWS)
        model = lm_train_by(docs)
        uni = {
            (r["grp"], r["tok"]): r["cnt"]
            for r in model.where(F.col("ctx").isNull()).collect()
        }
        assert uni[("en", "the")] == 4
        assert uni[("de", "der")] == 4
        assert ("fr", "the") not in uni

    def test_groups_without_mass_are_absent(self, spark):
        from swarm_spark.ops.lm import lm_perplexity_by, lm_train_by

        docs = self._ldocs(spark, self.ROWS)
        model = lm_train_by(docs.where(F.col("lang") != "fr"))
        scored = lm_perplexity_by(docs, model)
        assert sorted(r["doc_id"] for r in scored.collect()) == [0, 1, 2, 3, 4]

    def test_buckets_scored_matches_lm_buckets(self, spark, sf_dir):
        from swarm_spark.ops.lm import (
            lm_buckets,
            lm_buckets_scored,
            lm_perplexity,
            lm_train,
        )
        from swarm_spark.sources.tables import load_table

        docs = load_table(spark, sf_dir, "documents")
        model = lm_train(docs.where(F.col("lang") == "en"))
        want = {
            (r["doc_id"], r["bucket"]) for r in lm_buckets(docs, model).collect()
        }
        labeled = docs.select("doc_id", "lang").join(
            lm_perplexity(docs, model), "doc_id"
        )
        got = {
            (r["doc_id"], r["bucket"])
            for r in lm_buckets_scored(labeled).collect()
        }
        assert got == want and got
