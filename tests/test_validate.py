"""Data-expectation checks: every check kind must count planted
violations exactly, from one scan."""

from __future__ import annotations

import pytest

from swarm_spark.ops.validate import expectations_report


@pytest.fixture()
def dirty(spark):
    rows = [
        # (id, text, n_chars, lang, source)
        (1, "ok", 2, "en", "src1"),
        (1, "dup id", 6, "de", "src2"),          # duplicate id
        (2, None, 0, "xx", "bad-source"),        # null text, 0 chars,
        #                                          bad lang, bad source
        (3, "fine", 4, "en", "src3"),
        (None, "null id", 7, "fr", "src4"),      # null id (not a dup)
        (4, "big", 200_000, "es", "src5"),       # out of range
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, n_chars long, lang string, source string"
    )


class TestExpectations:
    def test_planted_violations_counted_exactly(self, dirty):
        out = {
            (r["check"], r["column"]): (r["n_violations"], r["passed"])
            for r in expectations_report(
                dirty,
                [
                    ("not_null", "text"),
                    ("unique", "doc_id"),
                    ("in_range", "n_chars", 1, 100_000),
                    ("accepted", "lang", ["en", "de", "fr", "es", "zh"]),
                    ("matches", "source", "^src[0-9]+$"),
                ],
            ).collect()
        }
        assert out[("not_null", "text")] == (1, False)
        # 5 non-null ids, 4 distinct -> 1 surplus duplicate; null id ignored
        assert out[("unique", "doc_id")] == (1, False)
        # 0 and 200000 both out of [1, 100000]
        assert out[("in_range", "n_chars")] == (2, False)
        assert out[("accepted", "lang")] == (1, False)
        assert out[("matches", "source")] == (1, False)

    def test_clean_table_passes_and_n_rows(self, spark):
        df = spark.createDataFrame(
            [(1, "a"), (2, "b")], "doc_id long, text string"
        )
        rows = expectations_report(
            df, [("not_null", "text"), ("unique", "doc_id")]
        ).collect()
        assert all(r["passed"] and r["n_rows"] == 2 for r in rows)

    def test_single_scan_single_aggregation(self, dirty):
        df = expectations_report(
            dirty, [("not_null", "text"), ("unique", "doc_id")]
        )
        df.collect()
        plan = (
            df._jdf.queryExecution().executedPlan().toString()
            .split("+- == Initial Plan ==")[0]
        )
        # in-memory fixture: no parquet, but exactly one scan of the
        # local relation and no join/window anywhere
        assert plan.count("Scan ExistingRDD") + plan.count("LocalTableScan") <= 1
        assert "Join" not in plan and "Window" not in plan

    def test_bad_checks_rejected(self, dirty):
        with pytest.raises(ValueError):
            expectations_report(dirty, [])
        with pytest.raises(ValueError):
            expectations_report(dirty, [("frobnicate", "text")])
        # arity is validated up front, not at collect time (ADVICE r7)
        with pytest.raises(ValueError, match="elements"):
            expectations_report(dirty, [("in_range", "n_chars", 1)])
        with pytest.raises(ValueError, match="elements"):
            expectations_report(dirty, [("not_null", "text", "extra")])
        with pytest.raises(ValueError, match="column name"):
            expectations_report(dirty, [("not_null", 42)])

    def test_quoted_column_name_survives(self, spark):
        """ADVICE r7: names travel as lit values, not SQL text — a
        column containing a quote must neither break the plan nor
        inject into it."""
        from pyspark.sql import functions as F

        df = spark.createDataFrame([(1,), (None,)], "x long").select(
            F.col("x").alias("it's")
        )
        rows = expectations_report(df, [("not_null", "it's")]).collect()
        assert rows[0]["column"] == "it's"
        assert rows[0]["n_violations"] == 1 and not rows[0]["passed"]


class TestUniqueApprox:
    def _df(self, spark, n=400, dups=25):
        rows = [(i, f"val{i}") for i in range(n)] + [
            (10_000 + i, f"val{i % 5}") for i in range(dups)
        ]
        return spark.createDataFrame(rows, "doc_id long, v string")

    def test_tracks_exact_surplus(self, spark):
        df = self._df(spark)
        out = {
            (r["check"], r["column"]): r
            for r in expectations_report(
                df, [("unique", "v"), ("unique_approx", "v")]
            ).collect()
        }
        exact = out[("unique", "v")]["n_violations"]
        approx = out[("unique_approx", "v")]["n_violations"]
        assert exact == 25
        # deterministic sketch at ~400 distinct into 253952 bits: the
        # estimate is within a couple of counts of exact
        assert approx is not None and abs(approx - exact) <= 3
        assert out[("unique_approx", "v")]["passed"] is False

    def test_unique_column_passes(self, spark):
        df = self._df(spark, dups=0)
        rows = expectations_report(df, [("unique_approx", "doc_id")]).collect()
        assert rows[0]["n_violations"] == 0 and rows[0]["passed"] is True

    def test_saturated_sketch_is_null_not_green(self, spark):
        """A saturated bitmap must yield NULL violations / NULL passed
        — never a silent pass (the linear-count contract)."""
        df = self._df(spark)
        rows = expectations_report(
            df, [("unique_approx", "v")], approx_n_blocks=1
        ).collect()
        assert rows[0]["n_violations"] is None
        assert rows[0]["passed"] is None

    def test_two_scans_total_no_value_shuffle(self, spark):
        """Exact checks keep their single scan; the whole approx batch
        adds exactly one more — and no exchange carries corpus values
        (the sketch shuffle is block-keyed metadata)."""
        df = self._df(spark)
        rep = expectations_report(
            df,
            [
                ("not_null", "v"),
                ("unique_approx", "v"),
                ("unique_approx", "doc_id"),
            ],
        )
        rep.collect()
        plan = (
            rep._jdf.queryExecution().executedPlan().toString()
            .split("+- == Initial Plan ==")[0]
        )
        scans = plan.count("Scan ExistingRDD") + plan.count("LocalTableScan")
        assert scans <= 3  # wide agg scan + sketch scan (+ lit seed rows)
        assert "CartesianProduct" not in plan
