"""Data-expectation checks over a table — the ingest-side quality gate
(deequ/Great-Expectations shape, reduced to its scale-safe core): a
pipeline asserts properties of a 100-TB table in ONE conditional-
aggregation pass and fails fast with counts, instead of discovering
bad rows in a training run.

Check kinds (each a tuple; ``col`` is a column name):

- ``("not_null", col)`` — violations = rows where col IS NULL
- ``("unique", col)`` — violations = non-null rows minus distinct
  non-null values (the number of surplus duplicate rows); EXACT, so
  each such check pays a full distinct aggregation over the column
- ``("unique_approx", col)`` — the same audit via the deterministic
  linear-counting sketch (:mod:`swarm_spark.ops.dedup`): violations ≈
  non-null rows − sketch estimate (clamped at 0). The whole batch of
  approx checks costs ONE extra column-pruned scan whose shuffle is
  ≤ checks×n_blocks metadata rows — no value-space shuffle — which is
  what makes a WIDE uniqueness audit affordable at 100 TB. A saturated
  sketch yields NULL violations / NULL passed (never silently wrong);
  size ``approx_n_blocks`` ≳ distinct/30. md5-derived bits make even
  the approximate count value-oracle-checkable.
- ``("in_range", col, lo, hi)`` — violations = non-null rows outside
  [lo, hi]
- ``("accepted", col, values)`` — violations = non-null rows whose
  value is not in ``values``
- ``("matches", col, regex)`` — violations = non-null rows not
  matching ``regex`` (Spark ``rlike`` / RE2-ish subset that also runs
  in DuckDB ``regexp_matches``)

Scale shape: every exact check compiles to a conditional sum (or a
two-phase exact distinct) inside ONE map-side-combined aggregation
over ONE scan — adding checks adds aggregate columns, never passes.
``unique_approx`` checks share one more scan (all sketches built from
a single ``explode`` projection). The one-row aggregate is unpivoted
driver-free with ``explode(array(struct(...)))`` — check names and
column names travel as ``lit`` values, never interpolated into SQL
text, so no identifier can break or inject the plan (ADVICE r7).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_KINDS = ("not_null", "unique", "unique_approx", "in_range", "accepted", "matches")
_ARITY = {
    "not_null": 2,
    "unique": 2,
    "unique_approx": 2,
    "in_range": 4,
    "accepted": 3,
    "matches": 3,
}


def _validate(checks: list[tuple]) -> None:
    if not checks:
        raise ValueError("checks must be non-empty")
    for check in checks:
        if not isinstance(check, (tuple, list)) or not check:
            raise ValueError(f"each check must be a non-empty tuple, got {check!r}")
        kind = check[0]
        if kind not in _KINDS:
            raise ValueError(f"unknown check kind {kind!r}; expected one of {_KINDS}")
        if len(check) != _ARITY[kind]:
            raise ValueError(
                f"{kind!r} check takes {_ARITY[kind]} elements, got {len(check)}: "
                f"{check!r}"
            )
        if not isinstance(check[1], str):
            raise ValueError(f"check column must be a column name, got {check[1]!r}")


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


def _approx_estimates(
    df: DataFrame, approx: list[tuple[int, str]], n_blocks: int, seed: str
) -> DataFrame:
    """(ci, set_bits) per unique_approx check — every check's
    linear-count bitmap built from ONE column-pruned scan: each row
    explodes into one (check, md5) entry per audited non-null column,
    then one map-side-combined bit_or shuffle of ≤ checks×n_blocks
    rows. The corpus is never shuffled by value."""
    from .dedup import _bloom_exprs, _bloom_hash

    entries = F.array(
        *[
            F.when(
                F.col(col).isNotNull(),
                F.struct(
                    F.lit(ci).alias("ci"), _bloom_hash(col, seed).alias("__bloom_h")
                ),
            )
            for ci, col in approx
        ]
    )
    block, mask = _bloom_exprs(n_blocks, k=1)
    return (
        df.select(F.explode(entries).alias("e"))
        .where(F.col("e").isNotNull())
        .select(F.col("e.ci").alias("ci"), F.col("e.__bloom_h").alias("__bloom_h"))
        .select("ci", block.alias("block"), mask.alias("mask"))
        .groupBy("ci", "block")
        .agg(F.bit_or("mask").alias("mask"))
        .groupBy("ci")
        .agg(F.coalesce(F.sum(F.bit_count("mask")), F.lit(0)).alias("set_bits"))
    )


def expectations_report(
    df: DataFrame,
    checks: list[tuple],
    approx_n_blocks: int = 4096,
    approx_seed: str = "swarm-lc",
) -> DataFrame:
    """(check, column, n_rows, n_violations, passed) — one row per
    declared expectation, all exact counts from a single scan and all
    ``unique_approx`` sketches from one more (see module docstring for
    the check vocabulary and the scale argument)."""
    _validate(checks)
    approx = [(i, c[1]) for i, c in enumerate(checks) if c[0] == "unique_approx"]
    flat = [(i, c) for i, c in enumerate(checks) if c[0] != "unique_approx"]

    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    for i, check in flat:
        aggs.append(
            F.coalesce(_violations(check), F.lit(0)).cast("long").alias(f"__v{i}")
        )
    for ci, col in approx:
        aggs.append(F.sum(F.col(col).isNotNull().cast("long")).alias(f"__nn{ci}"))
    wide = df.agg(*aggs)

    # ONE explode over the one-row aggregate (a union of per-kind
    # branches would re-execute the wide agg — and its scan — once per
    # branch); approx rows carry a check index to pick up their sketch
    # estimate through one broadcast join
    null_l = F.lit(None).cast("long")
    entries = []
    for i, check in flat:
        entries.append(
            F.struct(
                F.lit(check[0]).alias("check"),
                F.lit(check[1]).alias("column"),
                F.col(f"__v{i}").cast("long").alias("v"),
                F.lit(None).cast("int").alias("ci"),
                null_l.alias("nn"),
            )
        )
    for ci, col in approx:
        entries.append(
            F.struct(
                F.lit("unique_approx").alias("check"),
                F.lit(col).alias("column"),
                null_l.alias("v"),
                F.lit(ci).cast("int").alias("ci"),
                F.col(f"__nn{ci}").cast("long").alias("nn"),
            )
        )
    long = wide.select(
        F.col("__n").alias("n_rows"), F.explode(F.array(*entries)).alias("e")
    ).select("e.check", "e.column", "n_rows", "e.v", "e.ci", "e.nn")

    if approx:
        m = 62 * int(approx_n_blocks)
        est = _approx_estimates(df, approx, approx_n_blocks, approx_seed)
        long = long.join(F.broadcast(est), "ci", "left")
        set_bits = F.coalesce(F.col("set_bits"), F.lit(0))  # no rows -> empty bitmap
        zero = F.lit(m) - set_bits
        estimate = F.when(zero <= 0, F.lit(None).cast("long")).otherwise(
            F.round(-F.lit(float(m)) * F.log(zero / F.lit(float(m)))).cast("long")
        )
        # explicit NULL gate: Spark's greatest() IGNORES nulls, so a
        # saturated (NULL) estimate would otherwise read as 0 violations
        approx_viol = F.when(estimate.isNull(), null_l).otherwise(
            F.greatest(F.lit(0).cast("long"), (F.col("nn") - estimate).cast("long"))
        )
        viol = F.when(F.col("check") == "unique_approx", approx_viol).otherwise(
            F.col("v")
        )
    else:
        viol = F.col("v")
    return (
        long.select(
            "check",
            "column",
            "n_rows",
            viol.alias("n_violations"),
            # saturated sketch -> NULL, never false-green
            (viol == 0).alias("passed"),
        )
        .orderBy("check", "column")
    )
