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
