"""Data-expectation checks over a table — the ingest-side quality gate
(deequ/Great-Expectations shape, reduced to its scale-safe core): a
pipeline asserts properties of a 100-TB table in ONE conditional-
aggregation pass and fails fast with counts, instead of discovering
bad rows in a training run.

Check kinds (each a tuple; ``col`` is a column name):

- ``("not_null", col)`` — violations = rows where col IS NULL
- ``("unique", col)`` — violations = non-null rows minus distinct
  non-null values (the number of surplus duplicate rows)
- ``("in_range", col, lo, hi)`` — violations = non-null rows outside
  [lo, hi]
- ``("accepted", col, values)`` — violations = non-null rows whose
  value is not in ``values``
- ``("matches", col, regex)`` — violations = non-null rows not
  matching ``regex`` (Spark ``rlike`` / RE2-ish subset that also runs
  in DuckDB ``regexp_matches``)

Scale shape: every check compiles to a conditional sum (or a two-phase
exact distinct) inside ONE map-side-combined aggregation over ONE scan
— adding checks adds aggregate columns, never passes. The one-row
aggregate is then unpivoted driver-free with ``stack`` into the
(check, column, n_rows, n_violations, passed) report.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_KINDS = ("not_null", "unique", "in_range", "accepted", "matches")


def _violations(check: tuple) -> Column:
    kind, col = check[0], check[1]
    c = F.col(col)
    if kind == "not_null":
        return F.sum(c.isNull().cast("long"))
    if kind == "unique":
        return F.sum(c.isNotNull().cast("long")) - F.count_distinct(c)
    if kind == "in_range":
        lo, hi = check[2], check[3]
        return F.sum((c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi)))).cast("long"))
    if kind == "accepted":
        return F.sum((c.isNotNull() & ~c.isin(list(check[2]))).cast("long"))
    if kind == "matches":
        return F.sum((c.isNotNull() & ~c.rlike(check[2])).cast("long"))
    raise ValueError(f"unknown check kind {kind!r}; expected one of {_KINDS}")


def expectations_report(df: DataFrame, checks: list[tuple]) -> DataFrame:
    """(check, column, n_rows, n_violations, passed) — one row per
    declared expectation, all counts from a single scan (see module
    docstring for the check vocabulary and the scale argument)."""
    if not checks:
        raise ValueError("checks must be non-empty")
    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    for i, check in enumerate(checks):
        aggs.append(F.coalesce(_violations(check), F.lit(0)).cast("long").alias(f"__v{i}"))
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{check[0]}', '{check[1]}', __v{i}" for i, check in enumerate(checks)
    )
    return (
        wide.select(
            "__n",
            F.expr(
                f"stack({len(checks)}, {stack_args}) AS (check, column, n_violations)"
            ),
        )
        .select(
            "check",
            "column",
            F.col("__n").alias("n_rows"),
            "n_violations",
            (F.col("n_violations") == 0).alias("passed"),
        )
        .orderBy("check", "column")
    )
