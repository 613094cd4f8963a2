"""CLI surface: parser shape + the ingest/schema/enqueue/migrate
commands end-to-end over a temp warehouse with rego rules."""

from __future__ import annotations

import json

import pytest

from swarm_spark.cli import build_parser, main

EVENT_REGO = """
package event
src[{"schema": "applog", "parser": "json"}] {
    input.cs.bucket == "local"
    endswith(input.cs.name, ".ndjson")
}
"""
SCHEMA_REGO = """
package schema.applog
log[{
    "dataset": "apps", "table": "logs",
    "id": input.log_id, "timestamp": input.event_time, "data": input,
}] { input.event_time == input.event_time }
"""


@pytest.fixture()
def workdir(tmp_path):
    (tmp_path / "policy").mkdir()
    (tmp_path / "policy" / "event.rego").write_text(EVENT_REGO)
    (tmp_path / "policy" / "schema.rego").write_text(SCHEMA_REGO)
    data = tmp_path / "data"
    data.mkdir()
    with open(data / "a.ndjson", "w") as f:
        for i in range(10):
            f.write(
                json.dumps(
                    {"log_id": f"L{i}", "event_time": 1700000000 + i, "msg": f"m{i}"}
                )
                + "\n"
            )
    return tmp_path


def _run(capsys, argv):
    rc = main(argv)
    assert rc == 0
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


class TestParser:
    def test_subcommands_and_aliases(self):
        p = build_parser()
        args = p.parse_args(["i", "x.ndjson", "--rules", "r/"])
        assert args.fn.__name__ == "cmd_ingest"
        args = p.parse_args(["serve", "--rules", "r/", "--addr", "0.0.0.0:9"])
        assert args.fn.__name__ == "cmd_serve"
        with pytest.raises(SystemExit):
            p.parse_args(["ingest"])  # objects required


class TestCommands:
    def test_ingest_then_migrate(self, spark, workdir, capsys):
        out = _run(
            capsys,
            ["--cpus", "4", "ingest", str(workdir / "data" / "*.ndjson"),
             "--rules", str(workdir / "policy"), "--warehouse", str(workdir / "wh")],
        )
        assert out["rows"] == 10 and out["tables"] == {"apps.logs": 10}

        out = _run(
            capsys,
            ["--cpus", "4", "migrate", "--warehouse", str(workdir / "wh"),
             "--src", "apps.logs", "--dst", "apps.copy"],
        )
        assert out["rows"] == 10

    def test_schema_only(self, spark, workdir, capsys):
        out = _run(
            capsys,
            ["--cpus", "4", "schema", str(workdir / "data" / "*.ndjson"),
             "--rules", str(workdir / "policy"), "--warehouse", str(workdir / "wh2")],
        )
        assert out["tables"] == ["apps.logs"]

    def test_ingest_then_compact(self, spark, workdir, capsys):
        wh = str(workdir / "wh3")
        for _ in range(3):  # several batches -> several slices
            _run(
                capsys,
                ["--cpus", "4", "ingest", str(workdir / "data" / "*.ndjson"),
                 "--rules", str(workdir / "policy"), "--warehouse", wh],
            )
        out = _run(
            capsys,
            ["--cpus", "4", "compact", "--warehouse", wh, "--table", "apps.logs"],
        )
        assert out["files_after"] < out["files_before"]
        out2 = _run(
            capsys,
            ["--cpus", "4", "migrate", "--warehouse", wh,
             "--src", "apps.logs", "--dst", "apps.verify"],
        )
        assert out2["rows"] == 30  # all rows survived the rewrite

    def test_enqueue(self, workdir, capsys):
        out = _run(
            capsys,
            ["enqueue", str(workdir / "data" / "*.ndjson"),
             "-o", str(workdir / "q" / "m.ndjson")],
        )
        assert out == {"messages": 1, "objects": 1, "batches": 1}
        lines = (workdir / "q" / "m.ndjson").read_text().splitlines()
        assert len(lines) == 1
        msg = json.loads(lines[0])
        assert msg["payload"]["objects"][0]["cs"]["bucket"] == "local"


class TestReport:
    def test_report_sections_match_registry_queries(self, spark, capsys):
        res = _run(
            capsys,
            [
                "--cpus", "4",
                "report", "/root/testdata/sf0.001/documents.parquet",
                "--ngrams", "5", "--top-k", "5",
                "--quantiles-by", "lang",
                "--length-hist", "128",
                "--vocab", "3",
            ],
        )
        assert set(res) == {"top_ngrams", "tok_quantiles", "length_hist", "vocab"}
        assert len(res["top_ngrams"]) == 5
        assert res["top_ngrams"][0]["rank"] == 1
        assert all(r["count"] >= r["doc_freq"] >= 1 for r in res["top_ngrams"])
        # quantile rows: one per (lang, q-point), value monotone in q
        from collections import defaultdict

        by_lang = defaultdict(dict)
        for r in res["tok_quantiles"]:
            by_lang[r["lang"]][r["q_permille"]] = r["value"]
        for qs in by_lang.values():
            assert qs[500] <= qs[900] <= qs[990]
        assert len(res["vocab"]) == 3
        assert sum(b["n_docs"] for b in res["length_hist"]) == 500

    def test_report_expectations_from_json(self, tmp_path, capsys):
        import json as _json

        spec = tmp_path / "checks.json"
        spec.write_text(
            _json.dumps(
                [
                    ["not_null", "text"],
                    ["unique", "doc_id"],
                    ["accepted", "lang", ["en", "de", "fr", "es", "zh"]],
                ]
            )
        )
        res = _run(
            capsys,
            ["--cpus", "4", "report", "/root/testdata/sf0.001/documents.parquet",
             "--expectations", str(spec)],
        )
        rows = {(r["check"], r["column"]): r for r in res["expectations"]}
        assert set(rows) == {
            ("not_null", "text"), ("unique", "doc_id"), ("accepted", "lang")
        }
        assert all(r["passed"] and r["n_rows"] == 500 for r in rows.values())

    def test_report_gopher_failure_counts(self, spark, capsys):
        res = _run(
            capsys,
            ["--cpus", "4", "report", "/root/testdata/sf0.001/documents.parquet",
             "--gopher", "--gopher-stopwords", "the,a,table,value"],
        )
        g = res["gopher"]
        assert g["docs"] == 500
        # failing ANY rule implies failing keep; keep-failures bound
        # each rule's count and at least one rule actually bites here
        assert all(g[k] <= g["fail_keep"] for k in g if k.startswith("fail_flag"))
        assert g["fail_keep"] > 0
        from swarm_spark.ops.curation import gopher_rules

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        want = gopher_rules(
            docs, stopwords=("the", "a", "table", "value")
        ).where("NOT keep").count()
        assert g["fail_keep"] == want

    def test_report_requires_a_section(self, capsys):
        import pytest as _pytest

        with _pytest.raises(SystemExit, match="nothing to report"):
            _run(capsys, ["report", "/root/testdata/sf0.001/documents.parquet"])


class TestCurate:
    def test_curate_end_to_end(self, spark, tmp_path, capsys):
        out = str(tmp_path / "curated")
        res = _run(
            capsys,
            [
                "--cpus", "4",
                "curate", "/root/testdata/sf0.001/documents.parquet",
                "-o", out,
                "--min-quality", "0.5",
                "--langs", "en",
            ],
        )
        assert res["docs_in"] == 500
        assert res["docs_kept"] == sum(res["splits"].values()) > 0
        back = spark.read.parquet(out)
        assert set(back.columns) >= {"doc_id", "text", "quality", "pred_lang", "split"}
        # matches the registry query's kept set exactly
        from swarm_spark.ops_queries import q_corpus_curate

        expected = {r["doc_id"] for r in
                    q_corpus_curate(spark, "/root/testdata/sf0.001").collect()}
        got = {r["doc_id"] for r in back.collect()}
        assert got == expected

    def test_curate_gopher_and_exactsubstr(self, spark, tmp_path, capsys):
        """--gopher applies the rule gate, --exactsubstr rewrites texts
        with corpus-duplicated spans cut — both match the library ops
        applied in the same order."""
        out = str(tmp_path / "curated_g")
        res = _run(
            capsys,
            [
                "--cpus", "4",
                "curate", "/root/testdata/sf0.001/documents.parquet",
                "-o", out,
                "--min-quality", "0",
                "--gopher", "--gopher-min-words", "30",
                "--gopher-stopwords", "the,a,table,value",
                "--exactsubstr", "8",
            ],
        )
        from pyspark.sql import functions as F

        from swarm_spark.ops.curation import exactsubstr_cut, gopher_gate
        from swarm_spark.ops.dedup import exact_dedup_text

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        gated = gopher_gate(
            exact_dedup_text(docs), min_words=30,
            stopwords=("the", "a", "table", "value"),
        )
        cut = exactsubstr_cut(gated, min_len=8)
        # untouched docs keep their ORIGINAL text (ADVICE r11); only
        # docs with spans removed take the rebuilt space-joined form
        orig = {r["doc_id"]: r["text"] for r in gated.collect()}
        want = {
            (r["doc_id"], r["text_clean"] if r["n_removed"] else orig[r["doc_id"]])
            for r in cut.where(F.col("n_removed") < F.col("n_tokens")).collect()
        }
        back = spark.read.parquet(out)
        got = {(r["doc_id"], r["text"]) for r in back.collect()}
        assert got == want
        assert res["docs_kept"] == len(want) > 0

    def test_curate_keep_best_survivors(self, spark, tmp_path, capsys):
        out = str(tmp_path / "curated_kb")
        res = _run(
            capsys,
            [
                "--cpus", "4",
                "curate", "/root/testdata/sf0.001/documents.parquet",
                "-o", out, "--min-quality", "0",
                "--near-dup", "0.7", "--keep-best", "--max-df", "100",
            ],
        )
        from pyspark.sql import functions as F

        from swarm_spark.ops.components import keep_best_per_cluster
        from swarm_spark.ops.dedup import exact_dedup_text, minhash_lsh_pairs
        from swarm_spark.ops.text import quality_expr

        docs = exact_dedup_text(
            spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        )
        pairs = minhash_lsh_pairs(docs, max_df=100).where(
            F.col("est_jaccard") >= 0.7
        )
        want = {
            r["doc_id"]
            for r in keep_best_per_cluster(
                docs.withColumn(
                    "q", F.round(quality_expr("text") * 1000).cast("long")
                ),
                pairs,
                "q",
            ).collect()
        }
        got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
        assert got == want and res["docs_kept"] == len(want) > 0

    def test_quality_lm_bucket(self, spark, tmp_path, capsys):
        model = str(tmp_path / "lmq")
        _run(
            capsys,
            ["--cpus", "4", "quality", "lm-train",
             "/root/testdata/sf0.001/documents.parquet",
             "--model", model, "--label-col", "lang", "--label-value", "en"],
        )
        res = _run(
            capsys,
            ["--cpus", "4", "quality", "lm-bucket",
             "/root/testdata/sf0.001/documents.parquet",
             "--model", model, "--label-col", "lang",
             "--output", str(tmp_path / "bkts")],
        )
        assert set(res["buckets"]) == {"head", "middle", "tail"}
        assert sum(res["buckets"].values()) == 500
        # matches the registry row's bucket assignment exactly
        from swarm_spark.ops_queries import q_text_lm_buckets

        want = {
            r["doc_id"]: r["bucket"]
            for r in q_text_lm_buckets(spark, "/root/testdata/sf0.001").collect()
        }
        got = {
            r["doc_id"]: r["bucket"]
            for r in spark.read.parquet(str(tmp_path / "bkts")).collect()
        }
        assert got == want

    def test_curate_exactsubstr_ledger_waves(self, spark, tmp_path, capsys):
        """Two curate runs over id-ascending waves with a persisted
        ledger reproduce the one-shot span cut over the full corpus —
        the incremental contract, driven through the CLI."""
        from pyspark.sql import functions as F

        from swarm_spark.ops.curation import exactsubstr_cut

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        w1p, w2p = str(tmp_path / "w1.parquet"), str(tmp_path / "w2.parquet")
        docs.where("doc_id < 250").write.parquet(w1p)
        docs.where("doc_id >= 250").write.parquet(w2p)
        led = str(tmp_path / "xs_ledger")
        got = {}
        for i, src in enumerate((w1p, w2p)):
            out = str(tmp_path / f"wave{i}")
            _run(
                capsys,
                ["--cpus", "4", "curate", src, "-o", out,
                 "--min-quality", "0", "--exactsubstr", "8",
                 "--exactsubstr-ledger", led],
            )
            for r in spark.read.parquet(out).collect():
                got[r["doc_id"]] = r["text"]
        orig = {r["doc_id"]: r["text"] for r in docs.collect()}
        want = {
            r["doc_id"]: r["text_clean"] if r["n_removed"] else orig[r["doc_id"]]
            for r in exactsubstr_cut(docs, min_len=8)
            .where(F.col("n_removed") < F.col("n_tokens"))
            .collect()
        }
        assert got == want

    def test_curate_exactsubstr_preserves_untouched_text(
        self, spark, tmp_path, capsys
    ):
        """A doc the span cut never touched keeps its original
        newlines/indentation verbatim (ADVICE r11) — only touched docs
        are rewritten to the space-joined rebuilt stream."""
        run = " ".join(f"tok{i}" for i in range(8))
        src = str(tmp_path / "xs_docs.parquet")
        spark.createDataFrame(
            [
                (0, f"first {run} copy"),
                (1, f"second {run} copy"),
                (2, "untouched\n  indented line\tkeeps\nits form with many words"),
            ],
            "doc_id long, text string",
        ).write.parquet(src)
        out = str(tmp_path / "xs_out")
        _run(
            capsys,
            ["--cpus", "4", "curate", src, "-o", out,
             "--min-quality", "0", "--exactsubstr", "8"],
        )
        got = {r["doc_id"]: r["text"] for r in spark.read.parquet(out).collect()}
        assert got[2] == "untouched\n  indented line\tkeeps\nits form with many words"
        assert got[0] == f"first {run} copy"  # canonical copy untouched
        assert "tok0" not in got[1]  # duplicate span cut from doc 1

    def test_curate_ledger_rejects_descending_ids(self, spark, tmp_path, capsys):
        """A wave whose ids dip at/below the ledger's high-water id
        breaks the keep-first equivalence — the CLI must fail fast
        (exit 2) instead of silently producing non-keep-first cuts."""
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        hi, lo = str(tmp_path / "hi.parquet"), str(tmp_path / "lo.parquet")
        docs.where("doc_id >= 250").write.parquet(hi)
        docs.where("doc_id < 250").write.parquet(lo)
        led = str(tmp_path / "xs_led2")
        _run(
            capsys,
            ["--cpus", "4", "curate", hi, "-o", str(tmp_path / "o1"),
             "--min-quality", "0", "--exactsubstr", "8",
             "--exactsubstr-ledger", led],
        )
        rc = main(
            ["--cpus", "4", "curate", lo, "-o", str(tmp_path / "o2"),
             "--min-quality", "0", "--exactsubstr", "8",
             "--exactsubstr-ledger", led]
        )
        err = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 2
        assert "ascending" in err["error"]

    def test_curate_ledger_swap_recovers_from_old(self, spark, tmp_path, capsys):
        """Crash recovery: if only the .old sibling exists (a die
        between the two renames), the next run restores it and the
        incremental result still equals the one-shot cut."""
        import os as _os

        from swarm_spark.ops.curation import exactsubstr_cut
        from pyspark.sql import functions as F

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        w1p, w2p = str(tmp_path / "rw1.parquet"), str(tmp_path / "rw2.parquet")
        docs.where("doc_id < 250").write.parquet(w1p)
        docs.where("doc_id >= 250").write.parquet(w2p)
        led = str(tmp_path / "xs_led3")
        _run(
            capsys,
            ["--cpus", "4", "curate", w1p, "-o", str(tmp_path / "r1"),
             "--min-quality", "0", "--exactsubstr", "8",
             "--exactsubstr-ledger", led],
        )
        # simulate the crash window: ledger renamed aside, .next never
        # swapped in
        _os.rename(led, led + ".old")
        got = {}
        _run(
            capsys,
            ["--cpus", "4", "curate", w2p, "-o", str(tmp_path / "r2"),
             "--min-quality", "0", "--exactsubstr", "8",
             "--exactsubstr-ledger", led],
        )
        for out in ("r1", "r2"):
            for r in spark.read.parquet(str(tmp_path / out)).collect():
                got[r["doc_id"]] = r["text"]
        orig = {r["doc_id"]: r["text"] for r in docs.collect()}
        want = {
            r["doc_id"]: r["text_clean"] if r["n_removed"] else orig[r["doc_id"]]
            for r in exactsubstr_cut(docs, min_len=8)
            .where(F.col("n_removed") < F.col("n_tokens"))
            .collect()
        }
        assert got == want
        assert not _os.path.exists(led + ".old")

    def test_curate_ccnet_flag(self, spark, tmp_path, capsys):
        """--ccnet applies the per-predicted-language tercile gate:
        survivors match the library composition (grouped LM train +
        grouped scoring + per-language terciles, tail dropped) applied
        after exact dedup, in CLI order."""
        from pyspark.sql import functions as F

        from swarm_spark.ops.dedup import exact_dedup_text
        from swarm_spark.ops.lm import (
            lm_buckets_scored,
            lm_perplexity_by,
            lm_train_by,
        )
        from swarm_spark.ops.text import language_pred_expr

        out = str(tmp_path / "curated_ccnet")
        res = _run(
            capsys,
            ["--cpus", "4", "curate",
             "/root/testdata/sf0.001/documents.parquet",
             "-o", out, "--min-quality", "0", "--ccnet"],
        )
        docs = exact_dedup_text(
            spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        ).withColumn("pred_lang", language_pred_expr("text"))
        model = lm_train_by(docs, group_col="pred_lang", order=3)
        scored = lm_perplexity_by(docs, model, group_col="pred_lang", order=3)
        want = {
            r["doc_id"]
            for r in lm_buckets_scored(scored, group_col="pred_lang")
            .where(F.col("bucket") != "tail")
            .collect()
        }
        got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
        assert got == want and res["docs_kept"] == len(want) > 0

    def test_curate_gopher_repetition_flag(self, spark, tmp_path, capsys):
        out = str(tmp_path / "curated_rep")
        res = _run(
            capsys,
            [
                "--cpus", "4",
                "curate", "/root/testdata/sf0.001/documents.parquet",
                "-o", out, "--min-quality", "0",
                "--gopher-repetition",
            ],
        )
        from swarm_spark.ops.curation import gopher_repetition_gate
        from swarm_spark.ops.dedup import exact_dedup_text

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        want = {
            r["doc_id"]
            for r in gopher_repetition_gate(exact_dedup_text(docs)).collect()
        }
        got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
        assert got == want and res["docs_kept"] == len(want) > 0

    def test_curate_expect_gate_passes_and_fails(self, spark, tmp_path, capsys):
        """--expect runs the expectation report as a fail-fast
        PRE-gate: a passing spec curates normally; a failing one
        aborts with exit 2, prints the report, and writes NO output
        (r7 VERDICT task #6)."""
        import json as _json

        good = tmp_path / "good.json"
        good.write_text(
            _json.dumps([["not_null", "text"], ["unique_approx", "doc_id"]])
        )
        out = str(tmp_path / "curated")
        res = _run(
            capsys,
            ["--cpus", "4", "curate", "/root/testdata/sf0.001/documents.parquet",
             "-o", out, "--langs", "en", "--expect", str(good)],
        )
        assert res["docs_kept"] > 0

        bad = tmp_path / "bad.json"
        # sf0.001 docs have n_chars far above 5 -> guaranteed failure
        bad.write_text(_json.dumps([["in_range", "n_chars", 1, 5]]))
        out2 = str(tmp_path / "curated2")
        rc = main(
            ["--cpus", "4", "curate", "/root/testdata/sf0.001/documents.parquet",
             "-o", out2, "--expect", str(bad)]
        )
        assert rc == 2
        rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["error"] == "expectations failed" and rep["failed"] == 1
        assert rep["expectations"][0]["check"] == "in_range"
        assert not (tmp_path / "curated2").exists(), "gate must abort before writing"

    def test_quality_train_score_and_curate_gate(self, spark, tmp_path, capsys):
        """`quality train` writes a self-describing model parquet;
        `quality score` reproduces the registry scorer exactly after
        the parquet round-trip (no num_buckets threading needed); and
        `curate --nb-model` applies it as a keep-gate."""
        model_dir = str(tmp_path / "nbmodel")
        res = _run(
            capsys,
            ["--cpus", "4", "quality", "train",
             "/root/testdata/sf0.001/documents.parquet",
             "--model", model_dir, "--label-col", "lang",
             "--label-value", "en", "--buckets", "4096"],
        )
        assert res["docs"] == 500 and 0 < res["good_docs"] < 500
        scores_dir = str(tmp_path / "scores")
        res_s = _run(
            capsys,
            ["--cpus", "4", "quality", "score",
             "/root/testdata/sf0.001/documents.parquet",
             "--model", model_dir, "--output", scores_dir],
        )
        # at this corpus size Laplace smoothing dominates and all
        # scores sit below 0 (correct NB behavior); the contracts to
        # pin are the round-trip equality and the threshold gate below
        assert res_s["docs"] == 500 and res_s["pred_good"] >= 0
        back = spark.read.parquet(scores_dir)
        assert set(back.columns) == {"doc_id", "n_tokens", "score_micro", "pred_good"}
        from swarm_spark.ops_queries import q_text_nb_quality

        want = {
            (r["doc_id"], r["score_micro"])
            for r in q_text_nb_quality(spark, "/root/testdata/sf0.001").collect()
        }
        got = {(r["doc_id"], r["score_micro"]) for r in back.collect()}
        assert got == want
        out = str(tmp_path / "cur")
        res_c = _run(
            capsys,
            ["--cpus", "4", "curate",
             "/root/testdata/sf0.001/documents.parquet", "-o", out,
             "--min-quality", "0", "--nb-model", model_dir,
             "--nb-min-score", "-7000000"],  # near the corpus median
        )
        n_above = sum(1 for _, s in got if s > -7_000_000)
        assert 0 < res_c["docs_kept"] <= n_above < 500

    def test_quality_lm_order3_round_trip(self, spark, tmp_path, capsys):
        """`quality --order 3` trains/scores the trigram chain and
        reproduces the registry `text_lm_trigram` scorer exactly after
        the parquet round-trip."""
        model_dir = str(tmp_path / "lm3")
        res = _run(
            capsys,
            ["--cpus", "4", "quality", "lm-train",
             "/root/testdata/sf0.001/documents.parquet",
             "--model", model_dir, "--label-col", "lang",
             "--label-value", "en", "--order", "3"],
        )
        assert res["order"] == 3 and res["ngrams"] > res["unigrams"]
        scores_dir = str(tmp_path / "ppl3")
        _run(
            capsys,
            ["--cpus", "4", "quality", "lm-score",
             "/root/testdata/sf0.001/documents.parquet",
             "--model", model_dir, "--output", scores_dir,
             "--order", "3"],
        )
        from swarm_spark.ops_queries import q_text_lm_trigram

        want = {
            tuple(r)
            for r in q_text_lm_trigram(spark, "/root/testdata/sf0.001").collect()
        }
        got = {tuple(r) for r in spark.read.parquet(scores_dir).collect()}
        assert got == want

    def test_quality_lm_train_score_round_trip(self, spark, tmp_path, capsys):
        """`quality lm-train` writes the Stupid-Backoff count tables;
        `quality lm-score` reproduces the registry perplexity scorer
        exactly after the parquet round-trip."""
        model_dir = str(tmp_path / "lm")
        res = _run(
            capsys,
            ["--cpus", "4", "quality", "lm-train",
             "/root/testdata/sf0.001/documents.parquet",
             "--model", model_dir, "--label-col", "lang",
             "--label-value", "en"],
        )
        assert res["unigrams"] > 0 and res["ngrams"] > 0
        assert res["order"] == 2
        assert 0 < res["ref_docs"] < 500
        scores_dir = str(tmp_path / "ppl")
        res_s = _run(
            capsys,
            ["--cpus", "4", "quality", "lm-score",
             "/root/testdata/sf0.001/documents.parquet",
             "--model", model_dir, "--output", scores_dir],
        )
        assert res_s["docs"] == 500 and res_s["mean_avg_micro"] > 0
        back = spark.read.parquet(scores_dir)
        assert set(back.columns) == {
            "doc_id", "n_toks", "cost_micro", "avg_micro"
        }
        from swarm_spark.ops_queries import q_text_lm_perplexity

        want = {
            tuple(r)
            for r in q_text_lm_perplexity(
                spark, "/root/testdata/sf0.001"
            ).collect()
        }
        got = {tuple(r) for r in back.collect()}
        assert got == want
        # curate --lm-model applies the perplexity head cut: a cap at
        # the corpus median keeps roughly half, never everything
        avgs = sorted(a for *_, a in got)
        cap = avgs[len(avgs) // 2]
        out = str(tmp_path / "cur_lm")
        res_c = _run(
            capsys,
            ["--cpus", "4", "curate",
             "/root/testdata/sf0.001/documents.parquet", "-o", out,
             "--min-quality", "0", "--lm-model", model_dir,
             "--lm-max-avg", str(cap)],
        )
        n_under = sum(1 for a in avgs if a <= cap)
        assert 0 < res_c["docs_kept"] <= n_under < 500
        # `quality lm-eval` sweeps caps on a labeled holdout: the
        # confusion row at the median cap must match the scored set
        rc = main(
            ["--cpus", "4", "quality", "lm-eval",
             "/root/testdata/sf0.001/documents.parquet",
             "--model", model_dir, "--label-col", "lang",
             "--label-value", "en", "--thresholds", str(cap)],
        )
        assert rc == 0
        line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert line["threshold_micro"] == cap
        assert line["tp"] + line["fp"] == n_under
        assert line["tp"] + line["fp"] + line["fn"] + line["tn"] == 500

    def test_quality_eval_matches_registry_curve(self, spark, tmp_path, capsys):
        """`quality eval` sweeps thresholds on a labeled holdout and
        must reproduce the text_nb_eval registry operating curve: train
        on the even-doc_id half, evaluate the odd half, one JSON row
        per threshold with exact confusion counts."""
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        train_dir, hold_dir = str(tmp_path / "train"), str(tmp_path / "hold")
        docs.where("doc_id % 2 = 0").write.parquet(train_dir)
        docs.where("doc_id % 2 = 1").write.parquet(hold_dir)
        model_dir = str(tmp_path / "nb")
        _run(
            capsys,
            ["--cpus", "4", "quality", "train", train_dir,
             "--model", model_dir, "--label-col", "lang",
             "--label-value", "en", "--buckets", "4096"],
        )
        rc = main(
            ["--cpus", "4", "quality", "eval", hold_dir,
             "--model", model_dir, "--label-col", "lang", "--label-value", "en",
             "--thresholds=-12000000,-11000000,-10000000,0"]
        )
        assert rc == 0
        lines = capsys.readouterr().out.strip().splitlines()
        got = [json.loads(ln) for ln in lines]
        from swarm_spark.ops_queries import OPS

        want = [
            r.asDict()
            for r in OPS["text_nb_eval"][0](spark, "/root/testdata/sf0.001").collect()
        ]
        assert got == want
        # the curve is non-degenerate: some threshold splits the holdout
        assert any(r["tp"] > 0 and r["tn"] > 0 for r in got)

    def test_curate_quality_quantile_gate(self, spark, tmp_path, capsys):
        """--quality-quantile keeps each language's top half by quality
        — per-language counts must be about half the ungated run's and
        every kept doc at/above its language's median quality."""
        base_out = str(tmp_path / "ungated")
        _run(
            capsys,
            ["--cpus", "4", "curate", "/root/testdata/sf0.001/documents.parquet",
             "-o", base_out, "--min-quality", "0.0"],
        )
        gated_out = str(tmp_path / "gated")
        _run(
            capsys,
            ["--cpus", "4", "curate", "/root/testdata/sf0.001/documents.parquet",
             "-o", gated_out, "--min-quality", "0.0", "--quality-quantile", "500"],
        )
        import pyspark.sql.functions as F

        base = spark.read.parquet(base_out)
        gated = spark.read.parquet(gated_out)
        assert 0 < gated.count() < base.count()
        # per language: the kept minimum is that language's base median
        med = {
            r["pred_lang"]: r["m"]
            for r in base.groupBy("pred_lang")
            .agg(F.expr("percentile_approx(round(quality*1000), 0.5)").alias("m"))
            .collect()
        }
        for r in gated.groupBy("pred_lang").agg(
            F.min(F.round(F.col("quality") * 1000)).alias("lo")
        ).collect():
            assert r["lo"] >= med[r["pred_lang"]] - 1  # approx median slack

    def test_curate_cap_per_lang(self, spark, tmp_path, capsys):
        out = str(tmp_path / "capped")
        res = _run(
            capsys,
            [
                "--cpus", "4",
                "curate", "/root/testdata/sf0.001/documents.parquet",
                "-o", out,
                "--min-quality", "0.0",
                "--cap-per-lang", "3",
            ],
        )
        back = spark.read.parquet(out)
        per_lang = {r["pred_lang"]: r["n"] for r in
                    back.groupBy("pred_lang").count().withColumnRenamed("count", "n").collect()}
        assert per_lang and all(n <= 3 for n in per_lang.values())
        assert res["docs_kept"] == sum(per_lang.values())

    def test_curate_near_dup(self, spark, tmp_path, capsys):
        """With --near-dup, MinHash clusters collapse to their lowest
        id: planting clone texts via a crafted parquet must shrink
        docs_kept accordingly."""
        import pyspark.sql.functions as F  # noqa: N812

        src = str(tmp_path / "docs_src")
        base = spark.range(0, 40).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                *[F.concat(F.lit(f"w{k}x"), F.col("id")) for k in range(12)],
            ).alias("text"),
        )
        # 101 = EXACT copy of doc 0 (exact dedup removes it);
        # 100 = doc 0 plus one trailing token (only the near-dup pass
        # can remove it — most shingles shared, text digest differs)
        doc0 = base.where(F.col("doc_id") == 0).select("text")
        near = doc0.select(
            F.lit(100).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" tailword")).alias("text"),
        )
        exact = doc0.select(F.lit(101).alias("doc_id"), "text")
        base.unionByName(near).unionByName(exact).write.parquet(src)

        out = str(tmp_path / "nd")
        res = _run(
            capsys,
            [
                "--cpus", "4",
                "curate", src, "-o", out,
                "--min-quality", "0.0",
                "--near-dup", "0.5",
            ],
        )
        back = spark.read.parquet(out)
        ids = {r["doc_id"] for r in back.collect()}
        assert 0 in ids and 100 not in ids and 101 not in ids
        assert res["docs_kept"] == 40

    def test_curate_exactsubstr_ledger_string_ids(self, spark, tmp_path, capsys):
        """STRING doc ids flow through the ledger waves end-to-end:
        the high-water marker is stored raw and the ascending check
        compares in the column's native ordering (ADVICE r12 —
        ``int(...)`` used to crash a string-id wave that previously
        completed). Zero-padded ids make string order == numeric
        order, so the two-wave result must equal the one-shot cut."""
        from pyspark.sql import functions as F

        from swarm_spark.ops.curation import exactsubstr_cut

        docs = (
            spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .withColumn("doc_id", F.format_string("id%06d", F.col("doc_id")))
        )
        w1p, w2p = str(tmp_path / "s1.parquet"), str(tmp_path / "s2.parquet")
        docs.where(F.col("doc_id") < "id000250").write.parquet(w1p)
        docs.where(F.col("doc_id") >= "id000250").write.parquet(w2p)
        led = str(tmp_path / "xs_ledger_str")
        got = {}
        for i, src in enumerate((w1p, w2p)):
            out = str(tmp_path / f"swave{i}")
            _run(
                capsys,
                ["--cpus", "4", "curate", src, "-o", out,
                 "--min-quality", "0", "--exactsubstr", "8",
                 "--exactsubstr-ledger", led],
            )
            for r in spark.read.parquet(out).collect():
                got[r["doc_id"]] = r["text"]
        orig = {r["doc_id"]: r["text"] for r in docs.collect()}
        want = {
            r["doc_id"]: r["text_clean"] if r["n_removed"] else orig[r["doc_id"]]
            for r in exactsubstr_cut(docs, min_len=8)
            .where(F.col("n_removed") < F.col("n_tokens"))
            .collect()
        }
        assert got == want
        # the stored marker is the raw string
        marker = json.loads(
            (tmp_path / "xs_ledger_str" / "_max_doc_id.json").read_text()
        )
        assert marker["max_doc_id"] == max(orig)

    def test_curate_exactsubstr_ledger_id_type_mismatch(
        self, spark, tmp_path, capsys
    ):
        """A ledger written by an int-id wave fails FAST (exit 2, clear
        JSON error) when a later wave arrives with string ids, instead
        of raising a TypeError mid-comparison."""
        from pyspark.sql import functions as F

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        w1p = str(tmp_path / "m1.parquet")
        docs.where("doc_id < 100").write.parquet(w1p)
        led = str(tmp_path / "xs_ledger_mix")
        _run(
            capsys,
            ["--cpus", "4", "curate", w1p, "-o", str(tmp_path / "m_out1"),
             "--min-quality", "0", "--exactsubstr", "8",
             "--exactsubstr-ledger", led],
        )
        w2p = str(tmp_path / "m2.parquet")
        docs.where("doc_id >= 100").withColumn(
            "doc_id", F.format_string("z%06d", F.col("doc_id"))
        ).write.parquet(w2p)
        rc = main(
            ["--cpus", "4", "curate", w2p, "-o", str(tmp_path / "m_out2"),
             "--min-quality", "0", "--exactsubstr", "8",
             "--exactsubstr-ledger", led]
        )
        assert rc == 2
        err = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert err["error"] == "exactsubstr ledger id type mismatch"
        assert err["wave_id_type"] == "str"

    def test_quality_lm_train_by_matches_registry_fold(
        self, spark, tmp_path, capsys
    ):
        """`quality lm-train --by lang` persists the GROUPED count
        tables in one pass; the parquet round-trip must equal the
        `text_lm_merge_by` registry row (two-wave fold == one grouped
        train — the SUM-monoid contract, pinned through the CLI)."""
        from swarm_spark.ops.lm import load_lm

        model_dir = str(tmp_path / "lm_by")
        res = _run(
            capsys,
            ["--cpus", "4", "quality", "lm-train",
             "/root/testdata/sf0.001/documents.parquet",
             "--model", model_dir, "--by", "lang", "--order", "2"],
        )
        assert res["by"] == "lang" and res["groups"] >= 2
        from swarm_spark.ops_queries import q_text_lm_merge_by

        want = {
            tuple(r)
            for r in q_text_lm_merge_by(spark, "/root/testdata/sf0.001").collect()
        }
        got = {tuple(r) for r in load_lm(spark, model_dir).collect()}
        assert got == want and len(got) > 0

    def test_curate_ccnet_lm_model(self, spark, tmp_path, capsys):
        """`curate --ccnet --ccnet-lm-model DIR` scores the wave under
        a PERSISTED grouped model instead of retraining in-plan; with
        the model trained on the same gated frame, the survivors are
        identical to the in-plan `--ccnet` run (the production
        train-once / probe-per-wave shape)."""
        from pyspark.sql import functions as F

        from swarm_spark.ops.dedup import exact_dedup_text
        from swarm_spark.ops.lm import lm_train_by, save_lm
        from swarm_spark.ops.text import language_pred_expr

        src = "/root/testdata/sf0.001/documents.parquet"
        out_inplan = str(tmp_path / "ccnet_inplan")
        _run(
            capsys,
            ["--cpus", "4", "curate", src, "-o", out_inplan,
             "--min-quality", "0", "--ccnet"],
        )
        # the in-plan model trains on the gated frame: exact dedup +
        # pred_lang, min-quality 0 — rebuild it and persist
        kept = exact_dedup_text(spark.read.parquet(src)).withColumn(
            "pred_lang", language_pred_expr("text")
        )
        model_dir = str(tmp_path / "ccnet_model")
        save_lm(lm_train_by(kept, group_col="pred_lang", order=3), model_dir)
        out_stored = str(tmp_path / "ccnet_stored")
        _run(
            capsys,
            ["--cpus", "4", "curate", src, "-o", out_stored,
             "--min-quality", "0", "--ccnet",
             "--ccnet-lm-model", model_dir],
        )
        want = {r["doc_id"] for r in spark.read.parquet(out_inplan).collect()}
        got = {r["doc_id"] for r in spark.read.parquet(out_stored).collect()}
        assert got == want and len(got) > 0

    def test_ccnet_unmodeled_language_bypasses_tercile_cut(
        self, spark, tmp_path, capsys
    ):
        """ADVICE r13 (medium): a wave language with no rows in the
        persisted model must NOT be silently dropped — its docs cannot
        be ranked, so they bypass the tercile cut and the summary
        counts them under ``ccnet_unmodeled``."""
        from pyspark.sql import functions as F

        from swarm_spark.ops.dedup import exact_dedup_text
        from swarm_spark.ops.lm import lm_train_by, save_lm
        from swarm_spark.ops.text import language_pred_expr

        src = "/root/testdata/sf0.001/documents.parquet"
        kept = exact_dedup_text(spark.read.parquet(src)).withColumn(
            "pred_lang", language_pred_expr("text")
        )
        langs = sorted(
            r["pred_lang"] for r in kept.select("pred_lang").distinct().collect()
        )
        assert len(langs) >= 2, "fixture needs >= 2 predicted languages"
        trained_lang = langs[0]
        other_langs = set(langs[1:])
        model_dir = str(tmp_path / "one_lang_model")
        save_lm(
            lm_train_by(
                kept.where(F.col("pred_lang") == trained_lang),
                group_col="pred_lang",
                order=3,
            ),
            model_dir,
        )
        out = str(tmp_path / "ccnet_bypass")
        res = _run(
            capsys,
            ["--cpus", "4", "curate", src, "-o", out,
             "--min-quality", "0", "--ccnet",
             "--ccnet-lm-model", model_dir],
        )
        unmodeled_want = {
            r["pred_lang"]: r["n"]
            for r in kept.where(F.col("pred_lang") != trained_lang)
            .groupBy("pred_lang")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert res["ccnet_unmodeled"] == unmodeled_want
        # every unmodeled-language doc survived (bypass, not drop)
        got = spark.read.parquet(out)
        got_ids = {r["doc_id"] for r in got.collect()}
        bypass_ids = {
            r["doc_id"]
            for r in kept.where(
                F.col("pred_lang").isin(sorted(other_langs))
            ).collect()
        }
        assert bypass_ids and bypass_ids <= got_ids
        # the modeled language still gets its tail tercile cut
        n_trained_in = kept.where(
            F.col("pred_lang") == trained_lang
        ).count()
        n_trained_out = len(got_ids - bypass_ids)
        assert n_trained_out < n_trained_in

    def test_ccnet_order_above_trained_order_fails_fast(
        self, spark, tmp_path, capsys
    ):
        """ADVICE r13 (low): --ccnet-order above the persisted model's
        trained order (derived from the stored frame's max ctx arity)
        raises instead of silently paying full backoff on every
        token."""
        import pytest

        from swarm_spark.ops.dedup import exact_dedup_text
        from swarm_spark.ops.lm import lm_train_by, save_lm
        from swarm_spark.ops.text import language_pred_expr

        src = "/root/testdata/sf0.001/documents.parquet"
        kept = exact_dedup_text(spark.read.parquet(src)).withColumn(
            "pred_lang", language_pred_expr("text")
        )
        model_dir = str(tmp_path / "order2_model")
        save_lm(
            lm_train_by(kept, group_col="pred_lang", order=2), model_dir
        )
        out = str(tmp_path / "ccnet_order_fail")
        with pytest.raises(SystemExit, match="trained order 2"):
            main(
                ["--cpus", "4", "curate", src, "-o", out,
                 "--min-quality", "0", "--ccnet", "--ccnet-order", "3",
                 "--ccnet-lm-model", model_dir]
            )
        # at the trained order it runs clean
        res = _run(
            capsys,
            ["--cpus", "4", "curate", src, "-o", out,
             "--min-quality", "0", "--ccnet", "--ccnet-order", "2",
             "--ccnet-lm-model", model_dir],
        )
        assert res["docs_kept"] > 0


class TestMergeIngest:
    def test_reingest_with_merge_does_not_duplicate(self, spark, workdir, capsys):
        wh = str(workdir / "whm")
        args = ["--cpus", "4", "ingest", str(workdir / "data" / "*.ndjson"),
                "--rules", str(workdir / "policy"), "--warehouse", wh, "--merge"]
        out1 = _run(capsys, args)
        assert out1["tables"] == {"apps.logs": 10}
        # identical objects -> identical content-hash ids -> replaced
        out2 = _run(capsys, args)
        assert out2["tables"] == {"apps.logs": 10}
        out3 = _run(
            capsys,
            ["--cpus", "4", "migrate", "--warehouse", wh,
             "--src", "apps.logs", "--dst", "apps.check"],
        )
        assert out3["rows"] == 10

    def test_plain_reingest_appends(self, spark, workdir, capsys):
        wh = str(workdir / "wha")
        args = ["--cpus", "4", "ingest", str(workdir / "data" / "*.ndjson"),
                "--rules", str(workdir / "policy"), "--warehouse", wh]
        _run(capsys, args)
        _run(capsys, args)
        out = _run(
            capsys,
            ["--cpus", "4", "migrate", "--warehouse", wh,
             "--src", "apps.logs", "--dst", "apps.check"],
        )
        assert out["rows"] == 20


class TestStats:
    def test_stats_all_and_single(self, spark, workdir, capsys):
        wh = str(workdir / "whs")
        _run(
            capsys,
            ["--cpus", "4", "ingest", str(workdir / "data" / "*.ndjson"),
             "--rules", str(workdir / "policy"), "--warehouse", wh],
        )
        out = _run(capsys, ["--cpus", "4", "stats", "--warehouse", wh, "--rows"])
        assert isinstance(out, list) and len(out) >= 1
        t = next(x for x in out if x["table"] == "logs")
        assert t["files"] >= 1 and t["bytes"] > 0 and t["rows"] == 10
        one = _run(
            capsys,
            ["--cpus", "4", "stats", "--warehouse", wh, "--table", "apps.logs"],
        )
        assert one[0]["files"] == t["files"] and "rows" not in one[0]


class TestQueryCommand:
    def test_list_and_run(self, spark, capsys):
        out = _run(capsys, ["query", "--list"])
        assert "s1_scan_count" in out and len(out) >= 80
        rc = main(["--cpus", "4", "query", "s1_scan_count",
                   "--sf-dir", "/root/testdata/sf0.001"])
        assert rc == 0
        row = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert int(row["n"]) > 0

    def test_unknown_query_rejected(self):
        with pytest.raises(SystemExit):
            main(["query", "nope_nope"])

    def test_explain_prints_executed_plan(self, spark, capsys):
        rc = main(["--cpus", "4", "query", "layout_bucketed_join",
                   "--sf-dir", "/root/testdata/sf0.001", "--explain"])
        assert rc == 0
        plan = json.loads(
            capsys.readouterr().out.strip().splitlines()[-1]
        )["executed_plan"]
        # the bucketed join's headline property, visible from the CLI:
        # no hash-partitioning exchange feeds the join (the only
        # Exchange left is the registry row's final ORDER BY range
        # partitioning, which exists for oracle determinism)
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan


class TestSnapshotCli:
    def test_snapshot_lifecycle(self, spark, workdir, capsys):
        wh = str(workdir / "wh-snap")
        _run(
            capsys,
            ["--cpus", "4", "ingest", str(workdir / "data" / "*.ndjson"),
             "--rules", str(workdir / "policy"), "--warehouse", wh],
        )
        out = _run(
            capsys,
            ["--cpus", "4", "snapshot", "create", "--warehouse", wh,
             "--table", "apps.logs", "--name", "run1"],
        )
        assert out["name"] == "run1" and out["files"] >= 1
        # second ingest; snapshot count stays pinned
        _run(
            capsys,
            ["--cpus", "4", "ingest", str(workdir / "data" / "*.ndjson"),
             "--rules", str(workdir / "policy"), "--warehouse", wh],
        )
        out = _run(
            capsys,
            ["--cpus", "4", "snapshot", "count", "--warehouse", wh,
             "--table", "apps.logs", "--name", "run1"],
        )
        assert out == {"name": "run1", "rows": 10}
        out = _run(
            capsys,
            ["--cpus", "4", "snapshot", "list", "--warehouse", wh,
             "--table", "apps.logs"],
        )
        assert [s["name"] for s in out] == ["run1"]
        # compact retires the pinned slices; vacuum keeps them while
        # the snapshot exists and reclaims them after the drop
        _run(capsys, ["--cpus", "4", "compact", "--warehouse", wh,
                      "--table", "apps.logs"])
        out = _run(capsys, ["--cpus", "4", "vacuum", "--warehouse", wh,
                            "--table", "apps.logs"])
        # ingest-1's slice is pinned by the snapshot; ingest-2's
        # (unpinned) retired slice is reclaimed immediately
        assert out["files_kept"] >= 1
        _run(capsys, ["--cpus", "4", "snapshot", "drop", "--warehouse", wh,
                      "--table", "apps.logs", "--name", "run1"])
        out = _run(capsys, ["--cpus", "4", "vacuum", "--warehouse", wh,
                            "--table", "apps.logs"])
        assert out["files_removed"] >= 1 and out["files_kept"] == 0


class TestCurateBudgetAndChunks:
    def test_curate_token_budget(self, spark, tmp_path, capsys):
        import pyspark.sql.functions as F  # noqa: N812

        out = str(tmp_path / "budgeted")
        _run(
            capsys,
            [
                "--cpus", "4",
                "curate", "/root/testdata/sf0.001/documents.parquet",
                "-o", out,
                "--min-quality", "0.0",
                "--token-budget-per-lang", "500",
            ],
        )
        back = spark.read.parquet(out)
        per_lang = {
            r["pred_lang"]: r["toks"]
            for r in back.selectExpr(
                "pred_lang", "size(split(text, ' +')) AS n"
            ).groupBy("pred_lang").agg(F.sum("n").alias("toks")).collect()
        }
        assert per_lang
        # every language stops within one doc of the budget line
        for lang, toks in per_lang.items():
            mx = back.where(F.col("pred_lang") == lang).selectExpr(
                "max(size(split(text, ' +')))"
            ).head()[0]
            assert toks < 500 + mx

    def test_curate_chunked_output(self, spark, tmp_path, capsys):
        import pyspark.sql.functions as F  # noqa: N812

        out = str(tmp_path / "chunked")
        _run(
            capsys,
            [
                "--cpus", "4",
                "curate", "/root/testdata/sf0.001/documents.parquet",
                "-o", out,
                "--min-quality", "0.0",
                "--chunk-size", "16",
                "--chunk-overlap", "4",
            ],
        )
        back = spark.read.parquet(out)
        assert set(back.columns) >= {"doc_id", "chunk_id", "start_tok", "n_tok", "chunk", "split"}
        assert back.where(F.col("n_tok") > 16).count() == 0
        assert back.count() > back.select("doc_id").distinct().count()


class TestCurateShards:
    def test_curate_sharded_layout(self, spark, tmp_path, capsys):
        import pyspark.sql.functions as F  # noqa: N812

        out = str(tmp_path / "sharded")
        _run(
            capsys,
            [
                "--cpus", "4",
                "curate", "/root/testdata/sf0.001/documents.parquet",
                "-o", out,
                "--min-quality", "0.0",
                "--shards", "4",
            ],
        )
        back = spark.read.parquet(out)
        assert {"split", "shard"} <= set(back.columns)
        toks = {
            r["shard"]: r["t"]
            for r in back.selectExpr("shard", "size(split(text, ' +')) AS n")
            .groupBy("shard").agg(F.sum("n").alias("t")).collect()
        }
        assert set(toks) <= {0, 1, 2, 3} and len(toks) == 4
        total = sum(toks.values())
        mx = back.selectExpr("max(size(split(text, ' +')))").head()[0]
        cap = -(-total // 4)
        assert all(t < cap + mx for t in toks.values())


class TestQueryMetrics:
    def test_metrics_line_reports_scans(self, spark, capsys):
        rc = main(
            ["--cpus", "4", "query", "s3_prefix_filter",
             "--sf-dir", "/root/testdata/sf0.001", "--metrics"]
        )
        assert rc == 0
        lines = capsys.readouterr().out.strip().splitlines()
        m = json.loads(lines[-1])["metrics"]
        assert m["scan_nodes"] >= 1 and m["files_read"] >= 1
        assert m["files_size"] > 0 and m["output_rows"] >= 1


class TestCurateSemantic:
    def test_semantic_pass_drops_paraphrase_clones(self, spark, tmp_path, capsys):
        import pyspark.sql.functions as F  # noqa: N812

        src = str(tmp_path / "sem_src")
        base = spark.range(0, 30).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ", *[F.concat(F.lit(f"tok{k}x"), F.col("id")) for k in range(15)]
            ).alias("text"),
        )
        # 100: shares 13 of doc 0's 15 tokens reordered — high hashed
        # cosine but a different digest (exact dedup can't catch it)
        d0 = base.where(F.col("doc_id") == 0).head()["text"].split(" ")
        clone = " ".join(d0[2:] + d0[:2][:0] + ["zz1", "zz2"])
        extra = spark.createDataFrame([(100, clone)], "doc_id long, text string")
        base.unionByName(extra).write.parquet(src)

        out = str(tmp_path / "sem_out")
        res = _run(
            capsys,
            [
                "--cpus", "4",
                "curate", src, "-o", out,
                "--min-quality", "0.0",
                "--semantic", "0.8",
                "--semantic-cells", "4",
            ],
        )
        back = spark.read.parquet(out)
        ids = {r["doc_id"] for r in back.collect()}
        assert 0 in ids and 100 not in ids
        assert res["docs_kept"] == 30


class TestIndexCli:
    def test_build_then_probe(self, spark, tmp_path, capsys):
        idx = str(tmp_path / "idx")
        out = _run(
            capsys,
            ["--cpus", "4", "index", "build",
             "--input", "/root/testdata/sf0.001/embeddings.parquet",
             "--index", idx, "--cells", "8", "--iters", "3"],
        )
        assert out == {"index": idx, "vectors": 500, "cells": 8}
        rc = main(
            ["--cpus", "4", "index", "probe",
             "--input", "/root/testdata/sf0.001/embeddings.parquet",
             "--index", idx, "--k", "3", "--nprobe", "4", "--limit", "6"]
        )
        assert rc == 0
        lines = capsys.readouterr().out.strip().splitlines()
        assert len(lines) == 6
        row = json.loads(lines[0])
        assert {"query_id", "id", "cos", "rank"} <= set(row)

    def test_build_then_probe_ivfpq(self, spark, tmp_path, capsys):
        """--kind ivfpq persists (id, cell, codes) + centroids +
        codebooks and probes by cell-gated ADC; the probe must match
        the in-memory ann_topk_ivfpq composition exactly (the whole
        pipeline is deterministic)."""
        idx = str(tmp_path / "pqidx")
        out = _run(
            capsys,
            ["--cpus", "4", "index", "build", "--kind", "ivfpq",
             "--input", "/root/testdata/sf0.001/embeddings.parquet",
             "--index", idx, "--cells", "8", "--iters", "2",
             "--m", "4", "--pq-k", "8", "--pq-iters", "2"],
        )
        assert out["vectors"] == 500 and out["kind"] == "ivfpq"
        q_dir = str(tmp_path / "q")
        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        emb.where("vec_id % 100 = 0").write.parquet(q_dir)
        rc = main(
            ["--cpus", "4", "index", "probe", "--kind", "ivfpq",
             "--input", "/root/testdata/sf0.001/embeddings.parquet",
             "--queries", q_dir, "--index", idx, "--k", "5", "--nprobe", "4"]
        )
        assert rc == 0
        lines = capsys.readouterr().out.strip().splitlines()
        got = {
            (int(r["query_id"]), int(r["id"]), int(r["adc_micro"]), int(r["rank"]))
            for r in map(json.loads, lines)
        }
        from swarm_spark.ops.pq import ann_topk_ivfpq
        from pyspark.sql import functions as F

        want = {
            tuple(r)
            for r in ann_topk_ivfpq(
                emb, emb.where(F.col("vec_id") % 100 == 0), k=5,
                n_cells=8, nprobe=4, cell_iters=2, m=4, pq_k=8, pq_iters=2,
            ).collect()
        }
        assert got == want

    def test_build_then_probe_bm25(self, spark, tmp_path, capsys):
        """--kind bm25 persists postings + df stats + totals + the
        MaxScore bounds table; the probe ROUTES THROUGH bm25_pruned
        (bounds present, the serving default), reads ONLY the index
        tables, and must match the exhaustive bm25_topk ranker exactly
        at sf0.001 — the pruned==exhaustive identity pin on the CLI
        serving path."""
        from pyspark.sql import functions as F

        docs_src = "/root/testdata/sf0.001/documents.parquet"
        idx = str(tmp_path / "bmidx")
        out = _run(
            capsys,
            ["--cpus", "4", "index", "build", "--kind", "bm25",
             "--input", docs_src, "--index", idx],
        )
        assert out["kind"] == "bm25" and out["docs"] == 500 and out["tokens"] > 0
        assert out["bounds"] is True
        import os

        assert os.path.exists(os.path.join(idx, "bounds"))
        q_dir = str(tmp_path / "bq")
        docs = spark.read.parquet(docs_src)
        docs.where("doc_id % 50 = 0").write.parquet(q_dir)
        rc = main(
            ["--cpus", "4", "index", "probe", "--kind", "bm25",
             "--input", docs_src, "--queries", q_dir, "--index", idx, "--k", "5"]
        )
        assert rc == 0
        lines = capsys.readouterr().out.strip().splitlines()
        got = {
            (int(r["query_id"]), int(r["id"]), int(r["score_micro"]), int(r["rank"]))
            for r in map(json.loads, lines)
        }
        from swarm_spark.ops.retrieval import bm25_topk

        queries = docs.where(F.col("doc_id") % 50 == 0).select(
            F.col("doc_id").alias("query_id"), "text"
        )
        want = {tuple(r) for r in bm25_topk(docs, queries, k=5).collect()}
        assert got == want

    def test_probe_exhaustive_flag_identical_output(self, spark, tmp_path, capsys):
        """--exhaustive forces the plain ranker past the bounds table;
        its rows must equal the default (pruned) probe's bit for bit —
        the flag changes the plan, never the answer."""
        docs_src = "/root/testdata/sf0.001/documents.parquet"
        idx = str(tmp_path / "bmidx")
        _run(
            capsys,
            ["--cpus", "4", "index", "build", "--kind", "bm25",
             "--input", docs_src, "--index", idx],
        )
        q_dir = str(tmp_path / "bq")
        spark.read.parquet(docs_src).where("doc_id % 50 = 0").write.parquet(q_dir)
        base = ["--cpus", "4", "index", "probe", "--kind", "bm25",
                "--input", docs_src, "--queries", q_dir, "--index", idx,
                "--k", "5"]
        rows = {}
        for label, extra in (("pruned", []), ("exhaustive", ["--exhaustive"])):
            assert main(base + extra) == 0
            rows[label] = sorted(capsys.readouterr().out.strip().splitlines())
        assert rows["pruned"] == rows["exhaustive"] and rows["pruned"]

    def test_probe_bm25_index_with_lm_scorer(self, spark, tmp_path, capsys):
        """--scorer lm probes the SAME stored bm25 index with
        Dirichlet query likelihood routed through lm_pruned (bounds
        present — one bounds table serves both rankers) and must match
        the exhaustive lm_topk ranker exactly at sf0.001."""
        from pyspark.sql import functions as F

        docs_src = "/root/testdata/sf0.001/documents.parquet"
        idx = str(tmp_path / "bmidx")
        _run(
            capsys,
            ["--cpus", "4", "index", "build", "--kind", "bm25",
             "--input", docs_src, "--index", idx],
        )
        q_dir = str(tmp_path / "bq")
        docs = spark.read.parquet(docs_src)
        docs.where("doc_id % 50 = 0").write.parquet(q_dir)
        rc = main(
            ["--cpus", "4", "index", "probe", "--kind", "bm25",
             "--scorer", "lm", "--mu", "2000.0",
             "--input", docs_src, "--queries", q_dir, "--index", idx, "--k", "5"]
        )
        assert rc == 0
        lines = capsys.readouterr().out.strip().splitlines()
        got = {
            (int(r["query_id"]), int(r["id"]), int(r["score_micro"]), int(r["rank"]))
            for r in map(json.loads, lines)
        }
        from swarm_spark.ops.retrieval import lm_topk

        queries = docs.where(F.col("doc_id") % 50 == 0).select(
            F.col("doc_id").alias("query_id"), "text"
        )
        want = {tuple(r) for r in lm_topk(docs, queries, k=5, mu=2000.0).collect()}
        assert got == want

    def test_build_then_probe_positional(self, spark, tmp_path, capsys):
        """--kind positional persists (id, tok, pos); the probe
        phrase-matches without re-tokenizing the corpus and must match
        the phrase_match registry query exactly at sf0.001."""
        from pyspark.sql import functions as F

        from swarm_spark.ops.text import tokens_col

        docs_src = "/root/testdata/sf0.001/documents.parquet"
        idx = str(tmp_path / "pos")
        out = _run(
            capsys,
            ["--cpus", "4", "index", "build", "--kind", "positional",
             "--input", docs_src, "--index", idx],
        )
        assert out["kind"] == "positional" and out["positions"] > 0
        docs = spark.read.parquet(docs_src)
        q_dir = str(tmp_path / "ph")
        docs.where("doc_id % 100 = 0").select(
            "doc_id",
            F.concat_ws(" ", F.slice(tokens_col("text"), 1, 3)).alias("text"),
        ).write.parquet(q_dir)
        rc = main(
            ["--cpus", "4", "index", "probe", "--kind", "positional",
             "--input", docs_src, "--queries", q_dir, "--index", idx]
        )
        assert rc == 0
        lines = capsys.readouterr().out.strip().splitlines()
        got = {
            (int(r["phrase_id"]), int(r["id"]), int(r["n_hits"]))
            for r in map(json.loads, lines)
        }
        from swarm_spark.ops.retrieval import phrase_match

        phrases = docs.where(F.col("doc_id") % 100 == 0).select(
            F.col("doc_id").alias("phrase_id"),
            F.concat_ws(" ", F.slice(tokens_col("text"), 1, 3)).alias("text"),
        )
        want = {tuple(r) for r in phrase_match(docs, phrases).collect()}
        assert got == want and got


class TestSearchCli:
    def test_hybrid_search_matches_registry_query(self, spark, tmp_path, capsys):
        """The production serving shape: hybrid search composed from
        CLI-persisted BM25 + IVF-PQ indexes must return exactly the
        hybrid_rrf registry query's rows at sf0.001 — with shortlist >=
        corpus the cosine rerank IS the registry's brute-force semantic
        arm, so the whole composition is value-comparable end to end."""
        from pyspark.sql import functions as F

        docs_src = "/root/testdata/sf0.001/documents.parquet"
        emb_src = "/root/testdata/sf0.001/embeddings.parquet"
        bidx, vidx = str(tmp_path / "bm"), str(tmp_path / "pq")
        _run(
            capsys,
            ["--cpus", "4", "index", "build", "--kind", "bm25",
             "--input", docs_src, "--index", bidx],
        )
        _run(
            capsys,
            ["--cpus", "4", "index", "build", "--kind", "ivfpq",
             "--input", emb_src, "--index", vidx, "--cells", "8",
             "--iters", "2", "--m", "4", "--pq-k", "8", "--pq-iters", "2"],
        )
        q_dir = str(tmp_path / "q")
        docs = spark.read.parquet(docs_src)
        emb = spark.read.parquet(emb_src)
        docs.where("doc_id % 50 = 0").select(
            F.col("doc_id").alias("query_id"), "text"
        ).join(
            emb.where("vec_id % 50 = 0").select(
                F.col("vec_id").alias("query_id"), "embedding"
            ),
            "query_id",
        ).write.parquet(q_dir)
        rc = main(
            ["--cpus", "4", "search", "--bm25", bidx, "--ivfpq", vidx,
             "--vectors", emb_src, "--queries", q_dir,
             "--k", "5", "--lex-k", "10", "--sem-k", "10", "--shortlist", "500"]
        )
        assert rc == 0
        lines = capsys.readouterr().out.strip().splitlines()
        got = {
            (int(r["query_id"]), int(r["id"]), int(r["rrf_micro"]), int(r["rank"]))
            for r in map(json.loads, lines)
        }
        from swarm_spark.ops_queries import OPS

        want = {
            tuple(r) for r in OPS["hybrid_rrf"][0](spark, "/root/testdata/sf0.001").collect()
        }
        assert got == want

    def test_diversify_flag_applies_mmr_over_fusion(self, spark, tmp_path, capsys):
        """--diversify-k finishes serving with the MMR pass: the CLI
        rows must equal mmr_select over the hybrid_rrf registry output
        (rrf_micro as relevance, sims from the cold vector store)."""
        from pyspark.sql import functions as F

        docs_src = "/root/testdata/sf0.001/documents.parquet"
        emb_src = "/root/testdata/sf0.001/embeddings.parquet"
        bidx, vidx = str(tmp_path / "bm"), str(tmp_path / "pq")
        _run(
            capsys,
            ["--cpus", "4", "index", "build", "--kind", "bm25",
             "--input", docs_src, "--index", bidx],
        )
        _run(
            capsys,
            ["--cpus", "4", "index", "build", "--kind", "ivfpq",
             "--input", emb_src, "--index", vidx, "--cells", "8",
             "--iters", "2", "--m", "4", "--pq-k", "8", "--pq-iters", "2"],
        )
        q_dir = str(tmp_path / "q")
        docs = spark.read.parquet(docs_src)
        emb = spark.read.parquet(emb_src)
        docs.where("doc_id % 50 = 0").select(
            F.col("doc_id").alias("query_id"), "text"
        ).join(
            emb.where("vec_id % 50 = 0").select(
                F.col("vec_id").alias("query_id"), "embedding"
            ),
            "query_id",
        ).write.parquet(q_dir)
        rc = main(
            ["--cpus", "4", "search", "--bm25", bidx, "--ivfpq", vidx,
             "--vectors", emb_src, "--queries", q_dir,
             "--k", "5", "--lex-k", "10", "--sem-k", "10",
             "--shortlist", "500", "--diversify-k", "3",
             "--diversify-lambda", "600"]
        )
        assert rc == 0
        lines = capsys.readouterr().out.strip().splitlines()
        got = {
            (int(r["query_id"]), int(r["id"]), int(r["rank"]))
            for r in map(json.loads, lines)
        }
        from swarm_spark.ops.similarity import mmr_select
        from swarm_spark.ops_queries import OPS

        fused = OPS["hybrid_rrf"][0](spark, "/root/testdata/sf0.001")
        want = {
            tuple(r)
            for r in mmr_select(
                emb, fused, k=3, lam_permille=600, rel_col="rrf_micro"
            ).collect()
        }
        assert got == want and got


class TestLayoutCli:
    def test_zorder_rewrite_reports_locality(self, spark, tmp_path, capsys):
        src = str(tmp_path / "src.parquet")
        (
            spark.range(4096)
            .selectExpr(
                "id", "(id * 2654435761) % 256 AS x", "(id * 40503) % 256 AS y"
            )
            .write.parquet(src)
        )
        rc = main(
            ["--cpus", "4", "layout", "--src", src, "--dst",
             str(tmp_path / "dst.parquet"), "--x", "x", "--y", "y",
             "--bits", "8", "--files", "16"]
        )
        assert rc == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["files"] == 16 and rep["rows"] == 4096
        # the locality the rewrite exists for: both spans far below the
        # full 0..255 width, so either-column predicates prune files
        assert rep["x_span_avg"] < 128 and rep["y_span_avg"] < 128
        # the key survives for writer-stat auditing
        out = spark.read.parquet(str(tmp_path / "dst.parquet"))
        assert "zkey" in out.columns

    def test_bucket_mode_writes_joinable_table(self, spark, tmp_path, capsys):
        src = str(tmp_path / "bsrc.parquet")
        spark.range(512).selectExpr("id AS doc_id", "id % 5 AS v").write.parquet(src)
        rep = _run(
            capsys,
            ["--cpus", "4", "layout", "--mode", "bucket", "--src", src,
             "--dst", str(tmp_path / "bdst"), "--key", "doc_id",
             "--buckets", "8", "--table", "cli_bkt_t"],
        )
        assert rep["rows"] == 512 and rep["buckets"] == 8
        # one file per bucket: the repartition-by-bucket-hash write
        assert rep["files"] == 8
        assert spark.table("cli_bkt_t").count() == 512


class TestCurateTemperature:
    def test_curate_temperature_budget(self, spark, tmp_path, capsys):
        from math import isqrt

        out = str(tmp_path / "tempered")
        res = _run(
            capsys,
            ["--cpus", "4",
             "curate", "/root/testdata/sf0.001/documents.parquet",
             "-o", out, "--min-quality", "0", "--temperature-budget", "100"],
        )
        assert res["docs_kept"] <= 100
        back = spark.read.parquet(out)
        got = {
            r["pred_lang"]: r["n"]
            for r in back.groupBy("pred_lang").count().withColumnRenamed("count", "n").collect()
        }
        # quotas are exactly (100 * isqrt(n_lang)) // sum(isqrt): recompute
        # from the pre-sample frame the pipeline ranks (post-gates, here
        # only the quality>=0 no-op), i.e. language counts of the deduped set
        pre = (
            spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        )
        from swarm_spark.ops.dedup import exact_dedup_text
        from swarm_spark.ops.text import language_pred_expr, quality_expr
        from pyspark.sql import functions as F

        langs = (
            exact_dedup_text(pre)
            .withColumn("quality", quality_expr("text"))
            .withColumn("pred_lang", language_pred_expr("text"))
            .where(F.col("quality") >= 0)
            .groupBy("pred_lang")
            .count()
            .collect()
        )
        from swarm_spark.ops.sampling import temperature_shares

        ns = [r["count"] for r in langs]
        # a stratum with fewer docs than its quota keeps them all
        want = {
            r["pred_lang"]: min(q, r["count"])
            for r, q in zip(langs, temperature_shares(ns, 100))
            if q >= 1
        }
        assert got == want


class TestReportSketches:
    def test_distinct_and_heavy_hitters(self, spark, capsys):
        res = _run(
            capsys,
            ["--cpus", "4",
             "report", "/root/testdata/sf0.001/documents.parquet",
             "--distinct", "doc_id,lang", "--heavy-hitters", "400"],
        )
        # doc_id is unique: HLL estimate within ~5% of 500 (4 sigma at
        # m=4096 is 6.5%); lang has 5 values: small-range branch exact
        assert abs(res["distinct"]["doc_id"]["estimate"] - 500) <= 33
        assert res["distinct"]["lang"]["estimate"] == 5
        hh = res["heavy_hitters"]
        assert hh and all(est >= 400 for est in hh.values())
        # one-sided contract: every token with TRUE count >= 400 is in
        from pyspark.sql import functions as F
        from swarm_spark.ops.text import tokens_col

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        truth = {
            r["tok"]
            for r in docs.select(F.explode(tokens_col("text")).alias("tok"))
            .groupBy("tok").count().where(F.col("count") >= 400).collect()
        }
        assert truth <= set(hh)


class TestTokenizerCli:
    def test_train_then_encode_matches_library(self, spark, tmp_path, capsys):
        """`tokenizer train` writes the (rank, a, b) merge-table
        parquet; `tokenizer encode` round-trips it and reproduces the
        library counts exactly; --segments emits the full rendering."""
        model = str(tmp_path / "bpe")
        res = _run(
            capsys,
            ["--cpus", "4", "tokenizer", "train",
             "/root/testdata/sf0.001/documents.parquet",
             "--model", model, "--merges", "12"],
        )
        assert res["merges"] == 12 and res["vocab_words"] > 0
        out_dir = str(tmp_path / "counts")
        res_e = _run(
            capsys,
            ["--cpus", "4", "tokenizer", "encode",
             "/root/testdata/sf0.001/documents.parquet",
             "--model", model, "--output", out_dir],
        )
        assert res_e["docs"] == 500 and res_e["merges"] == 12
        # BPE merges can only shrink the char-level count toward the
        # word count: n_ws <= n_bpe always (a word is >= 1 subword)
        assert res_e["bpe_tokens"] >= res_e["ws_tokens"] > 0
        back = spark.read.parquet(out_dir)
        from swarm_spark.ops.bpe import bpe_token_counts, load_bpe

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        want = sorted(
            map(tuple, bpe_token_counts(docs, load_bpe(spark, model)).collect())
        )
        assert sorted(map(tuple, back.collect())) == want
        seg_dir = str(tmp_path / "segs")
        res_g = _run(
            capsys,
            ["--cpus", "4", "tokenizer", "encode",
             "/root/testdata/sf0.001/documents.parquet",
             "--model", model, "--output", seg_dir, "--segments"],
        )
        assert res_g["bpe_tokens"] == res_e["bpe_tokens"]
        segs = spark.read.parquet(seg_dir)
        assert "seg_text" in segs.columns and segs.count() == 500


class TestTokBucketedIndexCli:
    def test_bucketed_build_probe_matches_unbucketed(self, spark, tmp_path, capsys):
        import json as _json

        docs = "/root/testdata/sf0.001/documents.parquet"
        flat, bkt = str(tmp_path / "flat"), str(tmp_path / "bkt")
        _run(capsys, ["--cpus", "4", "index", "build", "--kind", "bm25",
                      "--input", docs, "--index", flat])
        _run(capsys, ["--cpus", "4", "index", "build", "--kind", "bm25",
                      "--input", docs, "--index", bkt, "--tok-buckets", "16"])

        def probe(ix, extra=()):
            rc = main(["--cpus", "4", "index", "probe", "--kind", "bm25",
                       "--input", docs, "--index", ix, "--queries", docs,
                       "--k", "3", "--limit", "0", *extra])
            assert rc == 0
            return sorted(capsys.readouterr().out.strip().splitlines())

        a = probe(flat)
        b = probe(bkt, ("--tok-buckets", "16"))
        assert a == b and len(a) > 0
        # the bucketed layout actually partitioned the files
        import os

        assert any(
            d.startswith("tbkt=") for d in os.listdir(os.path.join(bkt, "postings"))
        )
