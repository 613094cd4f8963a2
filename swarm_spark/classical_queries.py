"""Classical relational-operator queries + DuckDB oracles.

SURVEY §2.2 notes the reference has NO joins/windows/sorts/set-ops —
Spark supplies that machinery. These queries pin that surface against
the oracle so "full Spark SQL comes free" is a checked claim, not an
asserted one: event-time windowing, sessionization, top-k per group,
set operations, pivot, and rollup over the synthetic tables.

Determinism: counts and integral sums only; timestamps bucketed with
identical arithmetic; tie-breaks made explicit everywhere.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Window
from pyspark.sql import functions as F

from .sources.tables import load_table


def _t(spark, sf, name):
    return load_table(spark, sf, name)


# ---------------------------------------------------- event-time window
def q_window_hourly(spark, sf):
    """Tumbling 1-hour event-time window aggregation (the batch
    expression of a streaming windowed agg)."""
    ev = _t(spark, sf, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour").start.alias("bucket"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
        .orderBy("bucket", "event_type")
    )


SQL_WINDOW_HOURLY = """
SELECT cast(time_bucket(INTERVAL 1 HOUR, ts) AS TIMESTAMP) AS bucket, event_type,
       count(*) AS n,
       cast(sum(cast(round(value * 100) AS bigint)) AS BIGINT) AS value_cents
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""


# ------------------------------------------------- sliding event-time window
def q_window_sliding(spark, sf):
    """Sliding window (1 hour long, 30-minute slide): every event lands
    in exactly two windows. ``F.window`` with a slide duration is the
    streaming-compatible construct; the oracle reproduces it by
    unnesting each event into its two covering window starts."""
    ev = _t(spark, sf, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "30 minutes").start.alias("bucket"),
            F.col("event_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("bucket", "event_type")
    )


SQL_WINDOW_SLIDING = """
WITH slid AS (
  SELECT cast(time_bucket(INTERVAL 30 MINUTE, ts) AS TIMESTAMP)
           - to_minutes(30 * off.o) AS bucket,
         event_type
  FROM events, (SELECT unnest([0, 1]) AS o) off
)
SELECT bucket, event_type, count(*) AS n
FROM slid GROUP BY 1, 2 ORDER BY 1, 2
"""


# -------------------------------------------------------- sessionization
def q_sessionize(spark, sf):
    """Per-user session counts with a 30-minute inactivity gap
    (lag + gap-flag cumulative sum — the batch sessionization idiom).

    Gap arithmetic is integral microseconds (``unix_micros`` vs the
    oracle's ``epoch_us``): second-truncating ``unix_timestamp`` would
    disagree with a fractional-``epoch()`` oracle for true gaps in
    (1800, 1801) s — the same silent-boundary class as the ns→µs
    loader bug."""
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.when(
        F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
        > 1_800_000_000,
        1,
    ).otherwise(0)
    sess = ev.select("user_id", "ts", "event_id").withColumn(
        "session_no", F.sum(gap).over(w)
    )
    return (
        sess.groupBy("user_id")
        .agg(
            (F.max("session_no") + 1).alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


SQL_SESSIONIZE = """
WITH g AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS gap
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id,
         sum(gap) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS session_no
  FROM g
)
SELECT user_id, cast(max(session_no) + 1 AS BIGINT) AS n_sessions, count(*) AS n_events
FROM s GROUP BY 1 ORDER BY 1
"""


# --------------------------------------------------- native session window
def q_session_window(spark, sf):
    """Spark's native ``session_window`` (the Structured-Streaming
    session-gap operator, run here in batch) cross-checked against the
    independent lag+cumsum islands construction in the oracle: two
    different algorithms must produce identical session partitions.

    Boundary semantics pinned exactly: a new session starts iff the
    inter-event gap is ≥ the 30-min window (session windows are
    half-open ``[start, last+gap)``), in integral microseconds on both
    sides. ``max_span_us`` = longest session's ``end - start`` =
    last-first + gap."""
    ev = _t(spark, sf, "events")
    sess = ev.groupBy(
        "user_id", F.session_window("ts", "30 minutes").alias("w")
    ).agg(F.count(F.lit(1)).alias("n_ev"))
    return (
        sess.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.sum("n_ev").cast("long").alias("n_events"),
            # session_window yields TIMESTAMP_NTZ fields on NTZ input
            # (Spark 4.1); unix_micros requires TIMESTAMP. The session
            # timezone is pinned UTC, so the cast is offset-free — and the
            # subtraction cancels any uniform shift regardless.
            F.max(
                F.unix_micros(F.col("w.end").cast("timestamp"))
                - F.unix_micros(F.col("w.start").cast("timestamp"))
            ).alias("max_span_us"),
        )
        .orderBy("user_id")
    )


SQL_SESSION_WINDOW = """
WITH g AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
              THEN 1 ELSE 0 END AS gap
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts,
         sum(gap) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS sn
  FROM g
), b AS (
  SELECT user_id, sn, count(*) AS n_ev, min(ts) AS fs, max(ts) AS ls
  FROM s GROUP BY 1, 2
)
SELECT user_id, cast(count(*) AS bigint) AS n_sessions,
       cast(sum(n_ev) AS bigint) AS n_events,
       cast(max(epoch_us(ls) - epoch_us(fs) + 1800000000) AS bigint) AS max_span_us
FROM b GROUP BY 1 ORDER BY 1
"""


# ------------------------------------------------------- top-k per group
def q_topk_per_group(spark, sf):
    """Top-3 line items by price within each return flag (dense top-k
    with explicit tie-break).

    Scale shape: TWO-PHASE salted top-k, not one window over the group
    key — l_returnflag has 3 distinct values, so a plain
    `row_number().over(partitionBy(l_returnflag))` serializes a third
    of the table through one unsplittable task. Phase 1 takes top-k
    inside (group, salt) partitions (salt = deterministic hash bucket,
    count-scaled, so per-task rows are bounded); a row in the global
    top-k is necessarily in its salt partition's top-k, so phase 2
    re-ranks only the ≤ groups·salts·k survivors. Identical output,
    identical oracle."""
    from .ops.sampling import hash_bucket

    li = _t(spark, sf, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    base = li.select(
        "l_returnflag", "l_orderkey", "l_linenumber", cents.alias("price_cents")
    )
    n_salts = max(16, li.count() // 2_000_000)  # ≤ ~2M rows per salt task
    salt = (
        hash_bucket(
            F.concat_ws("|", F.col("l_orderkey"), F.col("l_linenumber")),
            "swarm-topk",
        )
        % n_salts
    ).cast("int")
    order = (
        F.col("price_cents").desc(),
        F.col("l_orderkey"),
        F.col("l_linenumber"),
    )
    w1 = Window.partitionBy("l_returnflag", "salt").orderBy(*order)
    survivors = (
        base.withColumn("salt", salt)
        .withColumn("rk", F.row_number().over(w1))
        .where(F.col("rk") <= 3)
        .drop("rk", "salt")
    )
    w2 = Window.partitionBy("l_returnflag").orderBy(*order)
    return (
        survivors.withColumn("rank", F.row_number().over(w2).cast("long"))
        .where(F.col("rank") <= 3)
        .orderBy("l_returnflag", "rank")
    )


SQL_TOPK = """
SELECT l_returnflag, l_orderkey, l_linenumber, price_cents, rank FROM (
  SELECT l_returnflag, l_orderkey, l_linenumber,
         cast(round(l_extendedprice * 100) AS bigint) AS price_cents,
         cast(row_number() OVER (PARTITION BY l_returnflag
              ORDER BY cast(round(l_extendedprice * 100) AS bigint) DESC,
                       l_orderkey, l_linenumber) AS bigint) AS rank
  FROM lineitem) t
WHERE rank <= 3 ORDER BY l_returnflag, rank
"""


# ------------------------------------------------------------- set ops
def q_set_ops(spark, sf):
    """INTERSECT / EXCEPT over customer key sets: customers with orders
    vs the full customer list."""
    cust = _t(spark, sf, "customer").select(F.col("c_custkey").alias("k"))
    buyers = _t(spark, sf, "orders").select(F.col("o_custkey").alias("k"))
    with_orders = cust.intersect(buyers)
    without_orders = cust.exceptAll(buyers.distinct())
    return spark.createDataFrame(
        [("with_orders",), ("without_orders",)], "which string"
    ).join(
        with_orders.agg(F.count(F.lit(1)).alias("n")).select(
            F.lit("with_orders").alias("which"), "n"
        ).unionByName(
            without_orders.agg(F.count(F.lit(1)).alias("n")).select(
                F.lit("without_orders").alias("which"), "n"
            )
        ),
        "which",
    ).orderBy("which")


SQL_SET_OPS = """
SELECT 'with_orders' AS which,
       (SELECT count(*) FROM (SELECT c_custkey FROM customer
                              INTERSECT SELECT o_custkey FROM orders)) AS n
UNION ALL
SELECT 'without_orders',
       (SELECT count(*) FROM (SELECT c_custkey FROM customer
                              EXCEPT SELECT o_custkey FROM orders))
ORDER BY which
"""


# --------------------------------------------------------------- pivot
def q_pivot_status_priority(spark, sf):
    """Orders pivoted: rows = status, columns = priority class counts."""
    o = _t(spark, sf, "orders")
    pri = F.substring("o_orderpriority", 1, 1)
    return (
        o.select("o_orderstatus", pri.alias("p"))
        .groupBy("o_orderstatus")
        .pivot("p", ["1", "2", "3", "4", "5"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
        .select(
            "o_orderstatus",
            *[F.col(c).alias(f"p{c}") for c in ["1", "2", "3", "4", "5"]],
        )
        .orderBy("o_orderstatus")
    )


SQL_PIVOT = """
SELECT o_orderstatus,
       count(*) FILTER (substr(o_orderpriority,1,1) = '1') AS p1,
       count(*) FILTER (substr(o_orderpriority,1,1) = '2') AS p2,
       count(*) FILTER (substr(o_orderpriority,1,1) = '3') AS p3,
       count(*) FILTER (substr(o_orderpriority,1,1) = '4') AS p4,
       count(*) FILTER (substr(o_orderpriority,1,1) = '5') AS p5
FROM orders GROUP BY 1 ORDER BY 1
"""


# -------------------------------------------------------------- rollup
def q_rollup(spark, sf):
    """ROLLUP over (returnflag, linestatus) with null grouping markers
    normalized to sentinel strings for cross-engine value equality."""
    li = _t(spark, sf, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("ls"),
            "n",
        )
        .orderBy("rf", "ls")
    )


SQL_ROLLUP = """
SELECT coalesce(l_returnflag, '<all>') AS rf,
       coalesce(l_linestatus, '<all>') AS ls,
       count(*) AS n
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus) ORDER BY rf, ls
"""


# ---------------------------------------------------------------- cube
def q_cube(spark, sf):
    """CUBE over (returnflag, linestatus): every grouping-set
    combination, null markers normalized to sentinels."""
    li = _t(spark, sf, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
                "price_cents"
            ),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("ls"),
            "n",
            "price_cents",
        )
        .orderBy("rf", "ls")
    )


SQL_CUBE = """
SELECT coalesce(l_returnflag, '<all>') AS rf,
       coalesce(l_linestatus, '<all>') AS ls,
       count(*) AS n,
       cast(sum(cast(round(l_extendedprice * 100) AS bigint)) AS BIGINT)
           AS price_cents
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus) ORDER BY rf, ls
"""


# ------------------------------------------------------------ quantiles
def q_quantiles(spark, sf):
    """Exact interpolated percentiles per group (integral-valued
    doubles → the linear interpolation is engine-exact)."""
    li = _t(spark, sf, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_quantity, 0.5)").alias("p50"),
            F.expr("percentile(l_quantity, 0.9)").alias("p90"),
            F.max("l_quantity").alias("mx"),
        )
        .orderBy("l_returnflag")
    )


SQL_QUANTILES = """
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.5) AS p50,
       quantile_cont(l_quantity, 0.9) AS p90,
       max(l_quantity) AS mx
FROM lineitem GROUP BY 1 ORDER BY 1
"""


# ------------------------------------------- rolling per-entity features
def q_rolling_user_features(spark, sf):
    """Trailing-1h per-user features on every event (count + spend sum
    over a RANGE frame) — the classic streaming-feature-backfill shape.

    Scale note: the per-user window is taxonomy class (b) — per-key
    ordered processing IS the semantics (each row's frame is defined
    relative to its own timestamp within its user's history), so the
    window is irreducible; per-user row counts bound the task and
    Spark's window sort spills. Sums are integral cents so the result
    is independent of intra-frame order."""
    ev = _t(spark, sf, "events")
    base = ev.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts")).alias("us"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-3_600_000_000, 0)
    )
    return (
        base.select(
            "event_id",
            "user_id",
            F.count(F.lit(1)).over(w).cast("long").alias("n_1h"),
            F.sum("cents").over(w).cast("long").alias("sum_cents_1h"),
        )
        .orderBy("event_id")
    )


SQL_ROLLING = """
WITH b AS (
  SELECT event_id, user_id, epoch_us(ts) AS us,
         cast(round(value * 100) AS bigint) AS cents
  FROM events
)
SELECT event_id, user_id,
       cast(count(*) OVER w AS bigint) AS n_1h,
       cast(sum(cents) OVER w AS bigint) AS sum_cents_1h
FROM b
WINDOW w AS (PARTITION BY user_id ORDER BY us
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""


# ------------------------------------------------------ cohort retention
def q_cohort_retention(spark, sf):
    """Classic cohort-retention matrix over orders: customers grouped
    by first-order month, distinct actives per month offset.

    Scale shape: the cohort assignment is a min() aggregate per
    customer (map-side combined), re-attached by a customer-key join;
    the matrix is one distinct-count aggregate — no windows, shuffles
    ∝ customers + (cohort, offset) cells."""
    orders = _t(spark, sf, "orders").select(
        "o_custkey", F.date_trunc("month", F.col("o_orderdate")).alias("m")
    )
    first = orders.groupBy("o_custkey").agg(F.min("m").alias("cohort"))
    joined = orders.join(first, "o_custkey")
    offset = (
        (F.year("m") - F.year("cohort")) * 12 + (F.month("m") - F.month("cohort"))
    ).cast("long")
    return (
        joined.select(
            F.col("cohort").cast("date").alias("cohort_month"),
            offset.alias("month_offset"),
            "o_custkey",
        )
        .groupBy("cohort_month", "month_offset")
        .agg(F.count_distinct("o_custkey").cast("long").alias("n_active"))
        .orderBy("cohort_month", "month_offset")
    )


SQL_COHORT = """
WITH o AS (SELECT o_custkey, date_trunc('month', o_orderdate) AS m FROM orders),
f AS (SELECT o_custkey, min(m) AS cohort FROM o GROUP BY 1),
j AS (SELECT o.o_custkey, f.cohort,
             (date_part('year', o.m) - date_part('year', f.cohort)) * 12
           + (date_part('month', o.m) - date_part('month', f.cohort)) AS off
      FROM o JOIN f USING (o_custkey))
SELECT cast(cohort AS date) AS cohort_month,
       cast(off AS bigint) AS month_offset,
       cast(count(DISTINCT o_custkey) AS bigint) AS n_active
FROM j GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------- funnel steps
def q_funnel_steps(spark, sf):
    """Ordered funnel (view -> click -> purchase) with 24-hour
    conversion windows: a click counts only within a day of the
    user's first view, a purchase within a day of that click.

    Scale shape: each stage is a min() aggregate re-joined on the user
    key — conditional sequencing without any per-user ordered window;
    three events scans (one per stage filter, predicate pushed down) +
    user-keyed shuffles ∝ distinct users."""
    ev = _t(spark, sf, "events").select(
        "user_id", "event_type", F.unix_micros(F.col("ts")).alias("us")
    )
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("us").alias("v_us"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(
            (F.col("us") >= F.col("v_us"))
            & (F.col("us") <= F.col("v_us") + 86_400_000_000)
        )
        .groupBy("user_id")
        .agg(F.min("us").alias("c_us"))
    )
    pu = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(
            (F.col("us") >= F.col("c_us"))
            & (F.col("us") <= F.col("c_us") + 86_400_000_000)
        )
        .groupBy("user_id")
        .agg(F.min("us").alias("p_us"))
    )

    # one chain, computed once: v ⊇ c ⊇ p by construction, so stage
    # counts are non-null counts of one left-joined frame (no union of
    # three branches re-deriving the earlier stages' subtrees)
    flags = v.join(c, "user_id", "left").join(pu, "user_id", "left")
    counts = flags.agg(
        F.count(F.lit(1)).cast("long").alias("nv"),
        F.count("c_us").cast("long").alias("nc"),
        F.count("p_us").cast("long").alias("np"),
    )
    return counts.selectExpr(
        "stack(3, '1_view', nv, '2_click', nc, '3_purchase', np) AS (stage, n_users)"
    ).orderBy("stage")


SQL_FUNNEL = """
WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
v AS (SELECT user_id, min(us) AS v_us FROM e WHERE event_type = 'view' GROUP BY 1),
c AS (SELECT e.user_id, min(us) AS c_us
      FROM e JOIN v USING (user_id)
      WHERE event_type = 'click' AND us >= v_us
        AND us <= v_us + 86400000000 GROUP BY 1),
p AS (SELECT e.user_id, min(us) AS p_us
      FROM e JOIN c USING (user_id)
      WHERE event_type = 'purchase' AND us >= c_us
        AND us <= c_us + 86400000000 GROUP BY 1)
SELECT '1_view' AS stage, cast(count(*) AS bigint) AS n_users FROM v
UNION ALL
SELECT '2_click', cast(count(*) AS bigint) FROM c
UNION ALL
SELECT '3_purchase', cast(count(*) AS bigint) FROM p
ORDER BY stage
"""


def q_event_transitions(spark, sf):
    """First-order event-type transition counts (the Markov-chain /
    clickstream-path report): per user, order events by time and count
    (previous type -> type) pairs corpus-wide. Lag rides a per-user
    window — bounded by ONE user's events, the same taxonomy class as
    sessionize — and the count is a map-side-combined aggregate over
    |types|² keys."""
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id",
            F.lag("event_type").over(w).alias("prev_type"),
            F.col("event_type").alias("next_type"),
        )
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy("prev_type", "next_type")
    )


SQL_TRANSITIONS = """
WITH o AS (SELECT user_id, event_type,
                  lag(event_type) OVER (PARTITION BY user_id
                      ORDER BY ts, event_id) AS prev_type
           FROM events)
SELECT prev_type, event_type AS next_type, cast(count(*) AS bigint) AS n
FROM o WHERE prev_type IS NOT NULL
GROUP BY 1, 2 ORDER BY 1, 2
"""


CLASSICAL: dict[str, tuple[Callable, str | None]] = {
    "event_transitions": (q_event_transitions, SQL_TRANSITIONS),
    "funnel_steps": (q_funnel_steps, SQL_FUNNEL),
    "cohort_retention": (q_cohort_retention, SQL_COHORT),
    "rolling_user_features": (q_rolling_user_features, SQL_ROLLING),
    "window_hourly": (q_window_hourly, SQL_WINDOW_HOURLY),
    "window_sliding": (q_window_sliding, SQL_WINDOW_SLIDING),
    "sessionize": (q_sessionize, SQL_SESSIONIZE),
    "session_window_stats": (q_session_window, SQL_SESSION_WINDOW),
    "topk_per_group": (q_topk_per_group, SQL_TOPK),
    "set_ops": (q_set_ops, SQL_SET_OPS),
    "pivot_status_priority": (q_pivot_status_priority, SQL_PIVOT),
    "rollup_counts": (q_rollup, SQL_ROLLUP),
    "cube_counts": (q_cube, SQL_CUBE),
    "quantiles": (q_quantiles, SQL_QUANTILES),
}
