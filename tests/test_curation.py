"""Gopher rule gate + ExactSubstr duplicated-span removal semantics."""

from __future__ import annotations

import pytest

from swarm_spark.ops.curation import exactsubstr_cut, gopher_gate, gopher_rules


def _rows(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_gopher_rule_flags(spark):
    good = "the cat sat with all of that tea and more " * 6  # 60 words
    docs = spark.createDataFrame(
        [
            (0, good.strip()),
            # too few words
            (1, "the of and that have with be to"),
            # mean word length < 3 (words of 1-2 chars)
            (2, " ".join(["a", "to", "of", "an"] * 15) + " the of"),
            # symbol-heavy: > 1 '#' per 10 words
            (3, ("the of w " * 20).strip() + " " + "# " * 10),
            # no stop words
            (4, ("lorem ipsum dolor sit amet " * 12).strip()),
            # > 20% non-alphabetic words
            (5, ("the of 123 456 789 " * 12).strip()),
        ],
        "doc_id long, text string",
    )
    got = _rows(gopher_rules(docs, min_words=50))
    assert got[0]["keep"] is True
    assert got[1]["flag_words"] is False and got[1]["keep"] is False
    assert got[2]["flag_mean_len"] is False
    assert got[3]["flag_symbol"] is False
    assert got[4]["flag_stop"] is False
    assert got[5]["flag_alpha"] is False
    kept = [r["doc_id"] for r in gopher_gate(docs, min_words=50).collect()]
    assert kept == [0]


def test_gopher_words_split_on_any_whitespace(spark):
    # ADVICE r11: 'end\nStart' must count as TWO words (Rae et al.
    # whitespace split), and tabs/leading/trailing whitespace must not
    # mint merged or empty words. ADVICE r12: vertical tab / formfeed
    # / CR are separators in BOTH engines (the class is pinned
    # explicitly because Java's \\s includes \\x0B and RE2's does not)
    docs = spark.createDataFrame(
        [
            (0, "end\nStart tab\there  double  space\n"),
            (1, " lead"),
            (2, "v\x0btab form\ffeed carriage\rreturn"),
        ],
        "doc_id long, text string",
    )
    got = _rows(gopher_rules(docs, min_words=1))
    assert got[0]["n_words"] == 6
    assert got[0]["total_chars"] == len("endStarttabheredoublespace")
    assert got[1]["n_words"] == 1
    assert got[2]["n_words"] == 6
    assert got[2]["total_chars"] == len("vtabformfeedcarriagereturn")


def test_gopher_line_rules(spark):
    base = ("the of and that have with be to good words here now " * 5).strip()
    bullets = "\n".join(["- item of the list"] * 10)
    ells = "\n".join([base[:40] + "..."] * 10)
    docs = spark.createDataFrame(
        [(0, base + "\n" + bullets), (1, base + "\n" + ells), (2, base)],
        "doc_id long, text string",
    )
    got = _rows(gopher_rules(docs, min_words=10))
    # 10/11 lines bulleted > 90%
    assert got[0]["flag_bullet"] is False
    # 10/11 lines ellipsis-terminated > 30%
    assert got[1]["flag_ellipsis"] is False
    assert got[2]["flag_bullet"] is True and got[2]["flag_ellipsis"] is True


def test_exactsubstr_keeps_first_occurrence(spark):
    run = "alpha beta gamma delta epsilon"  # 5-token duplicated run
    docs = spark.createDataFrame(
        [
            (1, f"intro one {run} tail one"),
            (2, f"entry two {run} close six"),
            (3, "unrelated text with no duplicate span here"),
        ],
        "doc_id long, text string",
    )
    got = _rows(exactsubstr_cut(docs, min_len=5))
    # doc 1 is the canonical (min doc_id) occurrence: untouched
    assert got[1]["n_removed"] == 0
    assert got[1]["text_clean"] == f"intro one {run} tail one"
    # doc 2 loses exactly the 5-token run
    assert got[2]["n_removed"] == 5
    assert got[2]["text_clean"] == "entry two close six"
    assert got[3]["n_removed"] == 0


def test_exactsubstr_within_doc_repeat(spark):
    run = "a b c d e"
    docs = spark.createDataFrame(
        [(7, f"{run} mid {run}")], "doc_id long, text string"
    )
    got = _rows(exactsubstr_cut(docs, min_len=5))
    # second in-doc occurrence cut, first kept
    assert got[7]["n_removed"] == 5
    assert got[7]["text_clean"] == f"{run} mid"


def test_exactsubstr_short_overlap_untouched(spark):
    # shared span of 4 < min_len=5 tokens: nothing removed
    docs = spark.createDataFrame(
        [(1, "p q r s xx yy"), (2, "p q r s zz ww")],
        "doc_id long, text string",
    )
    got = _rows(exactsubstr_cut(docs, min_len=5))
    assert got[1]["n_removed"] == 0 and got[2]["n_removed"] == 0


def test_exactsubstr_long_run_cut_whole(spark):
    # run of 8 tokens, L=5: all windows duplicated, doc 2 loses all 8
    run = "t1 t2 t3 t4 t5 t6 t7 t8"
    docs = spark.createDataFrame(
        [(1, f"{run} end"), (2, f"start {run}")],
        "doc_id long, text string",
    )
    got = _rows(exactsubstr_cut(docs, min_len=5))
    assert got[1]["n_removed"] == 0
    assert got[2]["n_removed"] == 8
    assert got[2]["text_clean"] == "start"


def test_exactsubstr_doc_shorter_than_window(spark):
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b")], "doc_id long, text string"
    )
    got = _rows(exactsubstr_cut(docs, min_len=5))
    assert got[1]["n_removed"] == 0 and got[2]["n_removed"] == 0
    assert got[2]["text_clean"] == "a b"


class TestExactSubstrIncremental:
    def _mk(self, spark):
        run = "alpha beta gamma delta epsilon zeta"
        return spark.createDataFrame(
            [
                (1, f"one lead {run} one tail"),
                (2, "plain body with its own words"),
                # wave 2 (ids ascend across waves)
                (3, f"three lead {run} three tail"),
                (4, f"{run} four tail"),
                (5, "five body repeat five body repeat x y z"),
            ],
            "doc_id long, text string",
        )

    def test_wave_cut_equals_one_shot(self, spark):
        from swarm_spark.ops.curation import (
            exactsubstr_cut,
            exactsubstr_cut_wave,
            exactsubstr_window_stats,
        )

        docs = self._mk(spark)
        w1 = docs.where("doc_id < 3")
        w2 = docs.where("doc_id >= 3")
        led = exactsubstr_window_stats(w1, min_len=6)
        got = {
            r["doc_id"]: (r["n_removed"], r["text_clean"])
            for r in exactsubstr_cut(w1, min_len=6)
            .unionByName(exactsubstr_cut_wave(w2, led, min_len=6))
            .collect()
        }
        want = {
            r["doc_id"]: (r["n_removed"], r["text_clean"])
            for r in exactsubstr_cut(docs, min_len=6).collect()
        }
        assert got == want
        # the duplicated run survives exactly once, at doc 1 (doc 3
        # also shares the preceding "lead" token, extending its run)
        assert got[1][0] == 0 and got[3][0] == 7 and got[4][0] == 6

    def test_merge_equals_one_shot_stats(self, spark):
        from swarm_spark.ops.curation import (
            exactsubstr_merge,
            exactsubstr_window_stats,
        )

        docs = self._mk(spark)
        s1 = exactsubstr_window_stats(docs.where("doc_id < 3"), min_len=6)
        s2 = exactsubstr_window_stats(docs.where("doc_id >= 3"), min_len=6)
        merged = {
            r["g"]: (r["first_id"], r["first_p"], r["cnt"])
            for r in exactsubstr_merge(s1, s2).collect()
        }
        full = {
            r["g"]: (r["first_id"], r["first_p"], r["cnt"])
            for r in exactsubstr_window_stats(docs, min_len=6).collect()
        }
        assert merged == full


class TestGopherRepetition:
    def test_signals_and_gate(self, spark):
        from swarm_spark.ops.curation import (
            gopher_repetition,
            gopher_repetition_gate,
        )

        loop = " ".join(["bad loop"] * 12)  # top-2-gram dominates
        run = "v w x y z"
        dup5 = f"{run} a1 b1 c1 {run} d1 e1 f1 g1 h1 i1 j1 k1 l1 m1"
        clean = "q0 q1 q2 q3 q4 q5 q6 q7 q8 q9 r0 r1 r2 r3 r4 r5"
        docs = spark.createDataFrame(
            [(0, loop), (1, dup5), (2, clean)], "doc_id long, text string"
        )
        got = {
            r["doc_id"]: r.asDict()
            for r in gopher_repetition(
                docs, top_ns=(2,), dup_ns=(5,)
            ).collect()
        }
        # doc 0: "bad loop" occurs 12x of 23 bigrams; chars = 12*8=96
        # of 84 total... capped? no cap — overlapping occurrences can
        # exceed total chars by construction (the paper's signal too)
        assert got[0]["top2_frac_micro"] > 500_000
        assert got[1]["dup5_frac_micro"] > 0
        # clean doc: every bigram unique -> top cov = one bigram's 4
        # chars of 32 total = 125,000 micro exactly
        assert got[2]["dup5_frac_micro"] == 0
        assert got[2]["top2_frac_micro"] == 125_000
        kept = {
            r["doc_id"]
            for r in gopher_repetition_gate(
                docs, top_ns=(2,), dup_ns=(5,)
            ).collect()
        }
        assert kept == {2}

    def test_short_docs_emit_zero_signals(self, spark):
        from swarm_spark.ops.curation import gopher_repetition

        docs = spark.createDataFrame(
            [(0, "one two"), (1, "single")], "doc_id long, text string"
        )
        got = {
            r["doc_id"]: r.asDict()
            for r in gopher_repetition(docs, top_ns=(3,), dup_ns=(5,)).collect()
        }
        assert got[0]["top3_frac_micro"] == 0 and got[0]["dup5_frac_micro"] == 0
        assert got[1]["top3_frac_micro"] == 0


class TestKeepBest:
    def test_highest_score_survives_ties_to_lowest_id(self, spark):
        from swarm_spark.ops.components import keep_best_per_cluster

        docs = spark.createDataFrame(
            [(1, 10), (2, 30), (3, 30), (4, 5), (9, 99)],
            "doc_id long, score long",
        )
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4)], "doc_a long, doc_b long"
        )
        kept = sorted(
            r["doc_id"]
            for r in keep_best_per_cluster(docs, pairs, "score").collect()
        )
        # cluster {1,2,3,4}: best score 30 held by 2 and 3 -> 2 wins;
        # doc 9 is unclustered and passes through
        assert kept == [2, 9]

    def test_reliable_checkpoint_dir(self, spark, tmp_path):
        """checkpoint_dir switches the scored frame to a RELIABLE
        checkpoint (r11 VERDICT #4): same survivors, and the
        checkpoint files actually land under the given directory."""
        import os

        from swarm_spark.ops.components import keep_best_per_cluster

        docs = spark.createDataFrame(
            [(1, 10), (2, 30), (3, 30), (4, 5), (9, 99)],
            "doc_id long, score long",
        )
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4)], "doc_a long, doc_b long"
        )
        ckpt = str(tmp_path / "ckpt")
        kept = sorted(
            r["doc_id"]
            for r in keep_best_per_cluster(
                docs, pairs, "score", checkpoint_dir=ckpt
            ).collect()
        )
        assert kept == [2, 9]
        found = [
            os.path.join(dp, f)
            for dp, _, fs in os.walk(ckpt)
            for f in fs
        ]
        assert found  # reliable checkpoint data was written there

    def test_preset_session_checkpoint_dir_survives(self, spark, tmp_path):
        """r12 ADVICE (deferred to r14): a checkpoint dir the SESSION
        already configured must survive ``keep_best_per_cluster`` — the
        function may set the dir only when unset, and must warn (not
        silently redirect) on conflict. Checkpoint data lands under the
        pre-set dir; survivors are unchanged."""
        import os
        import warnings as _warnings

        from swarm_spark.ops.components import keep_best_per_cluster

        sc = spark.sparkContext
        original = sc.getCheckpointDir()
        preset = str(tmp_path / "preset")
        conflicting = str(tmp_path / "conflicting")
        docs = spark.createDataFrame(
            [(1, 10), (2, 30), (3, 30), (4, 5), (9, 99)],
            "doc_id long, score long",
        )
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4)], "doc_a long, doc_b long"
        )
        try:
            sc.setCheckpointDir(preset)
            preset_resolved = sc.getCheckpointDir()
            with _warnings.catch_warnings(record=True) as caught:
                _warnings.simplefilter("always")
                kept = sorted(
                    r["doc_id"]
                    for r in keep_best_per_cluster(
                        docs, pairs, "score", checkpoint_dir=conflicting
                    ).collect()
                )
            assert kept == [2, 9]
            # the session's dir was NOT redirected
            assert sc.getCheckpointDir() == preset_resolved
            assert not os.path.exists(conflicting) or not any(
                fs for _, _, fs in os.walk(conflicting)
            )
            assert any(fs for _, _, fs in os.walk(preset))
            assert any(
                "checkpoint dir already" in str(w.message) for w in caught
            ), [str(w.message) for w in caught]
            # repeat-call with the SAME dir stays silent (the uuid
            # subdir getCheckpointDir returns must compare equal to
            # its requested parent)
            with _warnings.catch_warnings(record=True) as caught2:
                _warnings.simplefilter("always")
                keep_best_per_cluster(
                    docs, pairs, "score", checkpoint_dir=preset
                ).collect()
            assert not [
                w for w in caught2
                if "checkpoint dir" in str(w.message)
            ], [str(w.message) for w in caught2]
        finally:
            # restore the session-global state for later tests
            if original is None:
                getattr(sc._jsc.sc(), "checkpointDir_$eq")(
                    sc._jvm.scala.Option.empty()
                )
            else:
                getattr(sc._jsc.sc(), "checkpointDir_$eq")(
                    sc._jvm.scala.Option.apply(original)
                )


class TestLshTune:
    def test_curve_properties(self):
        from swarm_spark.ops.dedup import lsh_tune

        rows = []
        for t in (0.3, 0.5, 0.7, 0.9):
            b, r = lsh_tune(t, 128)
            assert 1 <= b and 1 <= r and b * r <= 128
            rows.append(r)
        # steeper thresholds need steeper curves: r rises with t
        assert rows == sorted(rows) and rows[0] < rows[-1]

    def test_recall_bias_widens_bands(self):
        from swarm_spark.ops.dedup import lsh_tune

        b_bal, r_bal = lsh_tune(0.8, 128, fn_weight=0.5)
        b_rec, r_rec = lsh_tune(0.8, 128, fn_weight=0.9)
        # recall bias -> catch more below-threshold pairs: more bands
        # per row (curve shifts left), never fewer
        assert (b_rec, -r_rec) >= (b_bal, -r_bal)

    def test_validation(self):
        import pytest as _pytest

        from swarm_spark.ops.dedup import lsh_tune

        with _pytest.raises(ValueError):
            lsh_tune(0.0, 128)
        with _pytest.raises(ValueError):
            lsh_tune(0.5, 1)


def _exactsubstr_reference(texts: dict[int, str], ln: int):
    """Brute-force driver-side ExactSubstr: the independent referee
    both Spark paths are property-checked against."""
    wins: dict[tuple[str, ...], list[tuple[int, int]]] = {}
    toks = {d: t.split() for d, t in texts.items()}
    for d in sorted(toks):
        ws = toks[d]
        for p in range(len(ws) - ln + 1):
            wins.setdefault(tuple(ws[p : p + ln]), []).append((d, p))
    cut = {d: set() for d in toks}
    for occs in wins.values():
        if len(occs) > 1:
            for d, p in sorted(occs)[1:]:
                cut[d].update(range(p, p + ln))
    out = {}
    for d, ws in toks.items():
        kept = [w for i, w in enumerate(ws) if i not in cut[d]]
        out[d] = (len(ws), len(ws) - len(kept), " ".join(kept))
    return out


class TestExactSubstrProperties:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    corpus = st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=1, max_size=14
        ),
        min_size=2,
        max_size=8,
    )

    @given(docs=corpus, ln=st.integers(min_value=2, max_value=4))
    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @pytest.mark.sweep  # heavyweight referee: full run via `-m ""` (pytest.ini)
    def test_one_shot_and_incremental_match_reference(self, spark, docs, ln):
        from swarm_spark.ops.curation import (
            exactsubstr_cut,
            exactsubstr_cut_wave,
            exactsubstr_window_stats,
        )

        texts = {i: " ".join(ws) for i, ws in enumerate(docs)}
        ref = _exactsubstr_reference(texts, ln)
        df = spark.createDataFrame(
            list(texts.items()), "doc_id long, text string"
        )
        got = {
            r["doc_id"]: (r["n_tokens"], r["n_removed"], r["text_clean"])
            for r in exactsubstr_cut(df, min_len=ln).collect()
        }
        assert got == ref
        # waves split at the id midpoint: ids ascend, so incremental
        # keep-first must equal the one-shot reference too
        mid = len(docs) // 2
        w1, w2 = df.where(f"doc_id < {mid}"), df.where(f"doc_id >= {mid}")
        led = exactsubstr_window_stats(w1, min_len=ln)
        inc = {
            r["doc_id"]: (r["n_tokens"], r["n_removed"], r["text_clean"])
            for r in exactsubstr_cut(w1, min_len=ln)
            .unionByName(exactsubstr_cut_wave(w2, led, min_len=ln))
            .collect()
        }
        assert inc == ref


class TestGopherOracleParity:
    """Cross-engine fuzz: the Gopher rule arithmetic must agree with
    the DuckDB oracle SQL on adversarial text (bullets, ellipses,
    newlines, runs of spaces, digits, short/empty-ish tokens) — the
    same comparison the driver runs, on inputs testdata never hits."""

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    word = st.sampled_from(
        # the \x0B / \f / \r entries pin the explicit whitespace class
        # (ADVICE r12: Java \s includes \x0B, RE2 \s does not — both
        # engines must split these into two words)
        ["the", "of", "a", "x", "123", "#tag", "...", "word", "-", "•item",
         "v\x0btab", "f\ffeed", "c\rret"]
    )
    line = st.lists(word, min_size=1, max_size=8).map(" ".join)
    text = st.lists(line, min_size=1, max_size=4).map("\n".join)

    @given(texts=st.lists(text, min_size=1, max_size=6))
    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_rules_match_duckdb(self, spark, texts):
        import duckdb

        from swarm_spark.ops.curation import gopher_rules
        from swarm_spark.ops_queries import SQL_GOPHER_RULES

        docs = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        got = [
            tuple(r)
            for r in gopher_rules(docs, min_words=30).orderBy("doc_id").collect()
        ]
        con = duckdb.connect()
        con.register(
            "documents",
            __import__("pandas").DataFrame(
                {"doc_id": range(len(texts)), "text": texts}
            ),
        )
        # the registry oracle, minus its corpus-specific stop list:
        # the fuzz uses the paper's list, so swap it back in
        sql = SQL_GOPHER_RULES.replace(
            "['the','a','table','value']",
            "['the','be','to','of','and','that','have','with']",
        )
        want = con.execute(sql).fetchall()
        assert got == want


class TestRepetitionOracleParity:
    """Cross-engine fuzz for the repetition tiers: multibyte words
    (char-vs-byte length), heavy ties (max-struct vs ORDER BY ... g
    DESC collation), and short docs, against the registry oracle."""

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    word = st.sampled_from(["aa", "bb", "ccc", "é", "日本", "zz", "aa"])
    text = st.lists(word, min_size=1, max_size=16).map(" ".join)

    @given(texts=st.lists(text, min_size=1, max_size=5))
    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @pytest.mark.sweep  # heavyweight referee: full run via `-m ""` (pytest.ini)
    def test_repetition_matches_duckdb(self, spark, texts):
        import duckdb
        import pandas as pd

        from swarm_spark.ops.curation import gopher_repetition
        from swarm_spark.ops_queries import SQL_GOPHER_REPETITION

        docs = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        got = [
            tuple(r)
            for r in gopher_repetition(docs, top_ns=(2, 3), dup_ns=(5, 8))
            .orderBy("doc_id")
            .collect()
        ]
        con = duckdb.connect()
        con.register(
            "documents", pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
        )
        want = con.execute(SQL_GOPHER_REPETITION).fetchall()
        assert got == want

    @given(texts=st.lists(text, min_size=2, max_size=5))
    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_exactsubstr_matches_duckdb(self, spark, texts):
        import duckdb
        import pandas as pd

        from swarm_spark.ops.curation import exactsubstr_cut
        from swarm_spark.ops_queries import SQL_EXACTSUBSTR_CUT

        # L=8 matches the registry SQL's hard-coded window
        docs = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        got = [
            tuple(r)
            for r in exactsubstr_cut(docs, min_len=8).orderBy("doc_id").collect()
        ]
        con = duckdb.connect()
        con.register(
            "documents", pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
        )
        want = con.execute(SQL_EXACTSUBSTR_CUT).fetchall()
        assert got == want


class TestNormalizeOracleParity:
    """Cross-engine fuzz for canonical-form normalization: lower +
    strip-non-alnum + whitespace collapse + trim + md5 must agree on
    unicode letters, mixed case, tabs/newlines, and digit runs —
    the regex semantics both engines must read identically."""

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    piece = st.sampled_from(
        ["Hello", "WORLD", "a1b2", "...", "#x", "é", "日本", "-", "_",
         "  ", "\t", "\n", "0", "mix3d"]
    )
    text = st.lists(piece, min_size=1, max_size=12).map(" ".join)

    @given(texts=st.lists(text, min_size=1, max_size=6))
    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_normalize_matches_duckdb(self, spark, texts):
        import duckdb
        import pandas as pd

        from swarm_spark.ops.text import normalize_text
        from swarm_spark.ops_queries import SQL_NORMALIZE

        docs = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        got = [
            tuple(r) for r in normalize_text(docs).orderBy("doc_id").collect()
        ]
        con = duckdb.connect()
        con.register(
            "documents", pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
        )
        want = con.execute(SQL_NORMALIZE).fetchall()
        assert got == want


def test_gopher_gate_filter_equals_rules_keep_set(spark):
    """gopher_gate is a pure where() filter (r14 optimization: no
    flag-frame self-semi-join); its keep set must equal
    gopher_rules(...).where(keep) for every rule combination — the
    shared-semantics guarantee the inlined predicate relies on."""
    import random

    rng = random.Random(14)
    vocab = ["the", "a", "table", "value", "lorem", "x1", "#", "...", "be"]
    rows = []
    for i in range(200):
        n = rng.randint(0, 80)
        words = [rng.choice(vocab) for _ in range(n)]
        text = " ".join(words)
        if rng.random() < 0.3:
            text = text.replace(" ", "\n- ", 1)
        rows.append((i, text))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for kwargs in (
        {},
        {"min_words": 5},
        {"min_words": 2, "max_words": 40},
        {"stopwords": ("the", "a", "table", "value"), "min_stop_hits": 1},
    ):
        via_rules = sorted(
            r["doc_id"]
            for r in gopher_rules(docs, **kwargs).where("keep").collect()
        )
        via_gate = sorted(
            r["doc_id"] for r in gopher_gate(docs, **kwargs).collect()
        )
        assert via_gate == via_rules, kwargs


def test_gopher_gate_per_row_semantics_on_dup_and_null_ids(spark):
    """Pin the documented per-ROW contract (r14 ADVICE): under
    duplicate ids each row is judged on its own text (no
    any-passing-twin leakage), and NULL-id rows pass when their text
    does (the old semi-join dropped null keys unconditionally)."""
    passing = "the a table value " + " ".join(["lorem"] * 26)
    failing = "# # #"
    docs = spark.createDataFrame(
        [
            (1, passing),  # dup id: one passing...
            (1, failing),  # ...one failing text under the SAME id
            (None, passing),  # null id, passing text
            (None, failing),  # null id, failing text
            (2, failing),
        ],
        "doc_id long, text string",
    )
    kept = gopher_gate(
        docs, min_words=5, stopwords=("the", "a", "table", "value")
    ).collect()
    kept_rows = sorted(
        ((r["doc_id"], r["text"] == passing) for r in kept),
        key=lambda t: (t[0] is None, t[0] or 0),
    )
    assert kept_rows == [(1, True), (None, True)]
