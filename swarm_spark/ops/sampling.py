"""Deterministic hash-based sampling and dataset splits.

``df.sample()`` is seed-dependent per partition layout — repartition
the input and the sample changes, which is unacceptable for training
corpora (the split must be a pure function of the RECORD, not of the
physical plan). These operators hash a key column instead:

    bucket(key) = first 8 hex digits of md5(seed | key)  ∈ [0, 2^32)

so membership is reproducible across runs, engines, partitionings, and
cluster sizes, and composable (a 10% sample of a 50% split is stable).
All arithmetic is integral and expressible in any SQL dialect — the
DuckDB oracles mirror it digit for digit.

Scale shape: pure codegen'd projection + filter, no shuffle, no RNG
state; sampling pushes through scans like any other filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SPACE = 1 << 32


def hash_bucket(key: Column | str, seed: str = "swarm") -> Column:
    """Deterministic uniform bucket in [0, 2^32) from md5(seed|key)."""
    c = F.col(key) if isinstance(key, str) else key
    h = F.md5(F.concat_ws("|", F.lit(seed), c.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long")


def hash_sample(
    df: DataFrame, fraction: float, key: str, seed: str = "swarm"
) -> DataFrame:
    """Keep ~``fraction`` of rows, deterministically by key hash."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.where(hash_bucket(key, seed) < int(fraction * _SPACE))


def stratified_hash_sample(
    df: DataFrame,
    strata: str,
    fractions: dict[str, float],
    key: str,
    default: float = 0.0,
    seed: str = "swarm",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample boilerplate
    docs, keep all rare-language docs)."""
    cut: Column = F.lit(int(default * _SPACE))
    for value, frac in sorted(fractions.items()):
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {value!r} must be in [0, 1]")
        cut = F.when(F.col(strata) == value, F.lit(int(frac * _SPACE))).otherwise(cut)
    return df.where(hash_bucket(key, seed) < cut)


def stratified_cap(
    df: DataFrame,
    strata: str,
    cap: int | None,
    key: str,
    seed: str = "swarm-strat",
    n_salts: int | None = None,
    approx_rows: int | None = None,
) -> DataFrame:
    """Keep at most ``cap`` rows per stratum — EXACT counts, chosen
    deterministically by hash order (so the kept set is a pure function
    of the records, stable under growth of OTHER strata and under any
    partitioning). ``cap=None`` balances every stratum down to the
    smallest stratum's count (domain/language rebalancing).

    Rate-based :func:`stratified_hash_sample` keeps *approximately*
    fraction·n per stratum; this keeps *exactly* min(cap, n) — the
    shape training-mix specs ("at most N docs per language") need.

    Scale shape: TWO-PHASE salted rank, not one window per stratum — a
    hot stratum (half the corpus in `en`) would otherwise land on one
    unsplittable window task. Phase 1 ranks inside (stratum, salt)
    partitions; a stratum's global hash-order top-cap rows are each in
    their salt partition's top-cap, so phase 2 re-ranks only the
    ≤ n_salts·cap survivors. Adds a ``rk`` column (1-based hash-order
    rank within the stratum).

    ``approx_rows``: sizes the salt count without an extra ``count()``
    action (at 100 TB every redundant action is a full file listing) —
    a rough estimate is fine, salting only needs the right order of
    magnitude. With ``cap=None`` the stratum-count pass already yields
    the total, so no extra scan happens either way.
    """
    from pyspark.sql import Window

    if cap is None:
        # metadata-sized: one row per stratum to the driver
        counts = df.groupBy(strata).count().collect()
        if not counts:
            return df.withColumn("rk", F.lit(1).cast("long")).limit(0)
        cap = min(r["count"] for r in counts)
        if approx_rows is None:  # reuse the pass we already paid for
            approx_rows = sum(r["count"] for r in counts)
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    if n_salts is None:
        n = approx_rows if approx_rows is not None else df.count()
        n_salts = max(16, n // 2_000_000)
    order = (hash_bucket(key, seed).asc(), F.col(key).asc())
    salt = (hash_bucket(key, seed + "-salt") % n_salts).cast("int")
    w1 = Window.partitionBy(strata, "__salt").orderBy(*order)
    survivors = (
        df.withColumn("__salt", salt)
        .withColumn("__rk", F.row_number().over(w1))
        .where(F.col("__rk") <= cap)
        .drop("__rk", "__salt")
    )
    w2 = Window.partitionBy(strata).orderBy(*order)
    return (
        survivors.withColumn("rk", F.row_number().over(w2).cast("long"))
        .where(F.col("rk") <= cap)
    )


def token_budget_sample(
    df: DataFrame,
    strata: str,
    budget: int | dict[str, int],
    key: str,
    text_col: str = "text",
    seed: str = "swarm-budget",
    n_ranges: int | None = None,
) -> DataFrame:
    """Per-stratum TOKEN-budget sampling: walk each stratum's docs in
    deterministic hash order and keep every doc that STARTS before the
    stratum's cumulative token count reaches ``budget`` (so each
    non-empty stratum keeps ≥ 1 doc and total kept tokens land in
    [budget, budget + max_doc)). Doc-count caps (:func:`stratified_cap`)
    don't control what a training mix actually spends — tokens; this is
    the "N tokens per language/domain" shape of a sampling spec, still
    a pure function of the records (stable under growth of other
    strata, partitioning, and cluster size).

    Scale shape: the per-stratum running total is a TWO-PHASE prefix
    sum, not one window per stratum (a hot stratum — half the corpus
    in `en` — would land on one unsplittable window task). The hash
    bucket is uniform in [0, 2^32), so its top bits cut each stratum
    into ``n_ranges`` even, literally-bounded, hash-order-monotone
    ranges: phase 1 cumsums inside (stratum, range) in parallel;
    per-(stratum, range) subtotals (metadata-sized: strata cardinality
    × ranges) come back as exclusive offsets through a broadcast join.
    Same contract as ops.packing's prefix sum, minus the id sampling —
    the range id here is pure arithmetic on the hash.

    ``n_ranges`` defaults to a fixed 1024 — a LITERAL, so no sizing
    ``count()`` action runs (r6 VERDICT: every redundant action is a
    full scan at 100 TB). Expected rows per (stratum, range) window
    task are rows(stratum)/1024; raise ``n_ranges`` explicitly past
    ~2B-row strata. Driver traffic stays strata × n_ranges rows.

    Adds ``n_tok`` (whitespace tokens) and ``cum_tok`` (inclusive
    running total in stratum hash order) to the surviving rows.

    ``budget`` may be a dict of per-stratum budgets (a mixture plan's
    ``take_tokens``); strata absent from the dict get budget 0 and are
    excluded entirely — see :func:`sample_to_mixture`.
    """
    from .text import tokens_col

    if isinstance(budget, dict):
        if any(v < 0 for v in budget.values()):
            raise ValueError("per-stratum budgets must be >= 0")
        cut: Column = F.lit(0).cast("long")
        for val, b in sorted(budget.items()):
            cut = F.when(F.col(strata) == val, F.lit(int(b)).cast("long")).otherwise(
                cut
            )
    elif budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    else:
        cut = F.lit(int(budget)).cast("long")
    spark = df.sparkSession
    if n_ranges is None:
        n_ranges = 1024
    bucket = hash_bucket(key, seed)
    base = (
        df.withColumn("n_tok", F.size(tokens_col(text_col)).cast("long"))
        .withColumn("__b", bucket)
        # monotone in __b, uniform, literal-bounded: no sampling pass
        .withColumn(
            "__rng", F.expr(f"cast(__b * {int(n_ranges)} div {_SPACE} as int)")
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy(strata, "__rng").orderBy("__b", key)
    local = base.withColumn("__cum", F.sum("n_tok").over(w))
    subtotals = (
        base.groupBy(strata, "__rng").agg(F.sum("n_tok").alias("tot")).collect()
    )
    by_stratum: dict = {}
    for r in sorted(subtotals, key=lambda r: (str(r[strata]), r["__rng"])):
        off = by_stratum.setdefault(str(r[strata]), [0, []])
        off[1].append((r[strata], r["__rng"], off[0]))
        off[0] += r["tot"]
    rows = [t for _, (_, triples) in sorted(by_stratum.items()) for t in triples]
    stype = dict(df.dtypes)[strata]
    off_df = spark.createDataFrame(
        rows, f"{strata} {stype}, __rng int, __off long"
    )
    return (
        local.join(F.broadcast(off_df), [strata, "__rng"])
        .withColumn("cum_tok", F.col("__off") + F.col("__cum"))
        .where(F.col("cum_tok") - F.col("n_tok") < cut)
        .drop("__b", "__rng", "__cum", "__off")
    )


def sample_to_mixture(
    df: DataFrame,
    strata: str,
    weights_ppm: dict[str, int],
    key: str,
    text_col: str = "text",
    seed: str = "swarm-budget",
) -> DataFrame:
    """Materialize a data mixture end-to-end: :func:`mixture_plan`
    computes the largest budget the corpus serves at the target
    weights, then each stratum keeps its hash-order prefix up to its
    ``take_tokens`` allocation (:func:`token_budget_sample` with the
    plan's per-stratum budgets). The plan round-trips the driver as
    one row per stratum — metadata, like IVF centroids."""
    plan = mixture_plan(df, strata, weights_ppm, text_col).collect()
    budgets = {r[strata]: int(r["take_tokens"]) for r in plan}
    return token_budget_sample(df, strata, budgets, key, text_col, seed)


def mixture_plan(
    df: DataFrame,
    strata: str,
    weights_ppm: dict[str, int],
    text_col: str = "text",
) -> DataFrame:
    """Data-mixture plan: given target mixture weights (parts per
    million, integral so the arithmetic is engine-exact), find the
    largest total token budget the corpus can serve AT those weights
    and each stratum's token allocation.

    budget = min over strata of floor(tokens_s · 10^6 / ppm_s) — the
    stratum that runs out first caps the whole mix (no implicit
    up-weighting of what's left, the standard mixture-spec semantics).
    Output per stratum: tokens_avail, weight_ppm, budget_tokens (the
    global cap, repeated), take_tokens = floor(ppm_s · budget / 10^6).
    Pair with :func:`token_budget_sample` (budget=take_tokens per
    stratum) to materialize the mix.

    Scale shape: one map-side-combined aggregation to strata
    cardinality, then a broadcast of the single-row min. Strata absent
    from ``weights_ppm`` are excluded (weight 0).
    """
    from .text import tokens_col

    spark = df.sparkSession
    for s, ppm in weights_ppm.items():
        if not 0 < ppm <= 1_000_000:
            raise ValueError(f"weight for {s!r} must be in (0, 1e6], got {ppm}")
    avail = df.groupBy(strata).agg(
        F.sum(F.size(tokens_col(text_col)).cast("long")).alias("tokens_avail")
    )
    stype = dict(df.dtypes)[strata]
    wdf = spark.createDataFrame(
        sorted(weights_ppm.items()), f"{strata} {stype}, weight_ppm int"
    )
    j = avail.join(F.broadcast(wdf), strata).withColumn(
        "__cap", F.expr("tokens_avail * 1000000 div weight_ppm")
    )
    budget = j.agg(F.min("__cap").alias("budget_tokens"))
    return (
        j.crossJoin(F.broadcast(budget))
        .select(
            strata,
            "tokens_avail",
            "weight_ppm",
            "budget_tokens",
            F.expr("weight_ppm * budget_tokens div 1000000").alias("take_tokens"),
        )
        .orderBy(strata)
    )


# auto-sizing targets for global_shuffle_order: ~2M rows per range
# window task (the _salts_for bound), floor 1024 ranges, and a fixed
# fine counting granularity the no-hint path measures the corpus at
_RANGE_ROWS = 2_000_000
_RANGE_FLOOR = 1024
_FINE_RANGES = 65536


def global_shuffle_order(
    df: DataFrame,
    key: str,
    seed: str = "swarm-shuffle",
    n_ranges: int | None = None,
    approx_rows: int | None = None,
) -> DataFrame:
    """Reproducible global training-shuffle order: every row gets
    ``pos`` (0-based) — its rank under ``(md5-hash, key)`` ordering — a
    deterministic permutation that looks random but is a pure function
    of the records. The property a training pipeline needs from its
    shuffle: identical across reruns/partitionings/engines (so a
    crashed run resumes at a position), changeable by ``seed`` per
    epoch, and defined WITHOUT materializing an ordering column ahead
    of time. The output is IDENTICAL for any range count — ``n_ranges``
    only sets the parallelism of the rank phase.

    Scale shape: no global sort. The hash is uniform in [0, 2^32), so
    its top bits cut the corpus into hash-order-monotone, literal-
    bounded ranges (the token_prefix contract): phase 1 ranks inside
    each range in parallel, per-range counts (metadata rows) come back
    as exclusive offsets through a broadcast join. Ties on the full
    hash break by ``key``, so the permutation is total and stable.

    Range-count sizing (~``2M`` rows per window task, floor 1024):
    pass ``n_ranges`` to pin it, or ``approx_rows`` (order of magnitude
    suffices) to derive it without any extra action. With NEITHER hint
    there is still NO sizing scan: rows are counted at a fixed fine
    granularity (65536 hash ranges — the pass the offsets need anyway),
    the range count is chosen from the measured total as a power of
    two, and fine counts fold into the coarser offsets exactly. The
    fine granularity caps the auto-scaled parallelism at 65536 tasks
    (~2M rows per task at ~10^11 rows); beyond that, pass
    ``approx_rows``.
    """
    if n_ranges is not None and n_ranges < 1:
        raise ValueError(f"n_ranges must be >= 1, got {n_ranges}")
    from pyspark.sql import Window

    spark = df.sparkSession
    if n_ranges is None and approx_rows is not None:
        n_ranges = max(_RANGE_FLOOR, approx_rows // _RANGE_ROWS)
    # fine counting granularity: the requested ranges, or the fixed
    # power-of-two grid the auto path coarsens from
    fine = int(n_ranges) if n_ranges is not None else _FINE_RANGES

    b = hash_bucket(key, seed)
    base = df.withColumn("__b", b).withColumn(
        "__rng", F.expr(f"cast(__b * {fine} div {_SPACE} as int)")
    )
    counts = {
        r["__rng"]: r["n"]
        for r in base.groupBy("__rng").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    if n_ranges is None:
        # derive from the count pass already paid: smallest power of
        # two >= floor covering ~_RANGE_ROWS rows per range. Power of
        # two, so coarse(b) = fine(b) div (fine/n_ranges) EXACTLY and
        # the fine counts fold into coarse offsets without re-scanning.
        total = sum(counts.values())
        n_ranges = _RANGE_FLOOR
        while n_ranges < _FINE_RANGES and n_ranges * _RANGE_ROWS < total:
            n_ranges *= 2
        fold = _FINE_RANGES // n_ranges
        coarse: dict[int, int] = {}
        for rng_id, n in counts.items():
            coarse[rng_id // fold] = coarse.get(rng_id // fold, 0) + n
        counts = coarse
        base = base.withColumn(
            "__rng", F.expr(f"cast(__b * {int(n_ranges)} div {_SPACE} as int)")
        )
    w = Window.partitionBy("__rng").orderBy("__b", key)
    local = base.withColumn("__rk", F.row_number().over(w))
    running, offsets = 0, []
    for rng_id in sorted(counts):  # ranges are monotone in hash order
        offsets.append((rng_id, running))
        running += counts[rng_id]
    off_df = spark.createDataFrame(offsets or [(0, 0)], "__rng int, __off long")
    return (
        local.join(F.broadcast(off_df), "__rng")
        .withColumn("pos", (F.col("__off") + F.col("__rk") - 1).cast("long"))
        .drop("__b", "__rng", "__rk", "__off")
    )


def split_column(
    key: str,
    test_fraction: float = 0.1,
    val_fraction: float = 0.1,
    seed: str = "swarm-split",
) -> Column:
    """'train' / 'val' / 'test' label, a pure function of the key —
    records never migrate between splits as the corpus grows."""
    b = hash_bucket(key, seed)
    test_cut = int(test_fraction * _SPACE)
    val_cut = test_cut + int(val_fraction * _SPACE)
    return (
        F.when(b < test_cut, F.lit("test"))
        .when(b < val_cut, F.lit("val"))
        .otherwise(F.lit("train"))
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    key: str,
    n_target: int,
    total_weight: int | None = None,
    seed: str = "swarm-wt",
) -> DataFrame:
    """Deterministic weighted Bernoulli sampling: keep each row with
    probability min(1, n_target * w / W) — expected sample size
    ~``n_target``, inclusion probability proportional to the row's
    integer ``weight_col`` (importance weights, token counts, quality
    scores). Like every sampler here, membership is a pure function of
    the RECORD: keep iff

        hash_bucket(key) < floor(w * n_target * 2^32 / W)

    so the kept set is stable under partitioning, engine, and cluster
    size, and reproduces in SQL (the cut is one double multiply +
    divide of exact integers — IEEE-deterministic on both engines).

    ``total_weight``: pass the stored statistic to skip the sizing
    aggregation (at 100 TB every redundant action is a full scan);
    ``None`` computes it in-plan (one map-side-combined scan, a 1-row
    broadcast — the driver never sees data). Weights must be >= 0.
    Precision note: past ``w * n_target ~ 2^20`` the scaled cut's
    double product exceeds the 2^53 mantissa and rounds — still
    IEEE-deterministic on every engine (the membership contract
    holds), just a < 2^-32 relative skew of the intended
    probability.

    Scale shape: a codegen'd filter under a 1-row broadcast join — no
    shuffle of the corpus, pushes through scans like any filter.
    """
    return (
        weighted_keep_flag(df, weight_col, key, n_target, total_weight, seed)
        .where(F.col("keep"))
        .drop("keep")
    )


def weighted_keep_flag(
    df: DataFrame,
    weight_col: str,
    key: str,
    n_target: int,
    total_weight: int | None = None,
    seed: str = "swarm-wt",
) -> DataFrame:
    """:func:`weighted_sample`'s membership decision as a boolean
    ``keep`` column instead of a filter — the audit/report shape: one
    pass computes per-stratum kept-vs-total aggregates with conditional
    sums, where filter-then-join-back would re-scan the corpus."""
    if n_target < 1:
        raise ValueError(f"n_target must be >= 1, got {n_target}")
    scale = float(int(n_target) * _SPACE)
    if total_weight is None:
        tot = df.agg(F.sum(F.col(weight_col)).cast("long").alias("__w_tot"))
    else:
        if total_weight < 1:
            raise ValueError(f"total_weight must be >= 1, got {total_weight}")
        tot = df.sparkSession.createDataFrame(
            [(int(total_weight),)], "__w_tot long"
        )
    cut = F.floor(F.col(weight_col).cast("double") * F.lit(scale) / F.col("__w_tot"))
    return (
        df.crossJoin(F.broadcast(tot))
        .withColumn("keep", hash_bucket(key, seed) < cut)
        .drop("__w_tot")
    )


def temperature_quotas(
    df: DataFrame, strata: str, budget: int, alpha_half: bool = True
) -> DataFrame:
    """(strata, n_docs, quota): per-stratum document quotas for a
    temperature-flattened mixture — quota_s proportional to
    n_s^alpha with alpha = 1/2 (the multilingual-pretraining shape:
    upsample rare strata, damp the head; alpha=1 is proportional,
    alpha=0 uniform). Fixing alpha at 1/2 keeps the whole plan
    integer-exact: s_s = floor(sqrt(n_s)) (IEEE sqrt is correctly
    rounded, so this reproduces bit-for-bit in any engine) and
    quota_s = (budget * s_s) div (sum_t s_t) in pure bigint
    arithmetic. Strata-cardinality-sized output; the corpus is scanned
    once for the counts."""
    import math

    from pyspark.sql import types as T

    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    if not alpha_half:
        raise ValueError("only alpha = 1/2 is supported (integer-exact contract)")
    # metadata-sized by definition of a mixture: one row per stratum to
    # the driver (the stratified_cap precedent) — the sqrt scaling and
    # division then run in exact Python integers, with NO second pass
    # over the counts subtree (a distributed total would re-scan it).
    # math.isqrt is exact at any size; a SQL mirror's floor(sqrt(n)) is
    # guaranteed identical below n = 2^26 per stratum (IEEE sqrt is
    # correctly rounded; above that the nearest double to sqrt(k^2 - 1)
    # can be k itself).
    counts = (
        df.groupBy(strata).agg(F.count(F.lit(1)).cast("long").alias("n_docs")).collect()
    )
    ns = [r["n_docs"] for r in counts]
    rows = [
        (r[strata], n, q)
        for r, n, q in zip(counts, ns, temperature_shares(ns, int(budget)))
    ]
    schema = T.StructType(
        [
            df.schema[strata],
            T.StructField("n_docs", T.LongType(), False),
            T.StructField("quota", T.LongType(), False),
        ]
    )
    return df.sparkSession.createDataFrame(rows, schema)


def temperature_shares(counts: list[int], budget: int) -> list[int]:
    """The pure integer core of :func:`temperature_quotas`:
    quota_i = (budget * isqrt(n_i)) div (sum_j isqrt(n_j)). Exposed for
    property testing — monotone in n_i, sum(quotas) <= budget, equal
    counts get equal quotas, and the alpha = 1/2 flattening guarantee:
    a stratum's quota share never exceeds its count share for strata
    above the mean, never falls below for strata below it."""
    import math

    if any(n < 1 for n in counts):
        raise ValueError("stratum counts must be >= 1")
    scaled = [math.isqrt(n) for n in counts]
    st = sum(scaled)
    return [(budget * s) // st for s in scaled] if st else []


def sample_temperature(
    df: DataFrame,
    strata: str,
    key: str,
    budget: int,
    seed: str = "swarm-temp",
    n_salts: int = 16,
) -> DataFrame:
    """Temperature-flattened mixture sample: EXACTLY quota_s rows per
    stratum (quotas from :func:`temperature_quotas`, alpha = 1/2),
    chosen in deterministic hash order — the kept set is a pure
    function of the records, so the mix is stable under growth of
    other strata, partitioning, and cluster size. Adds ``rk`` (1-based
    hash-order rank within the stratum).

    Scale shape: same TWO-PHASE salted rank as :func:`stratified_cap`
    (no hot-stratum single-window task), with the per-stratum quota
    arriving through a strata-cardinality broadcast join instead of a
    literal cap.
    """
    from pyspark.sql import Window

    quotas = temperature_quotas(df, strata, budget).where(F.col("quota") >= 1)
    order = (hash_bucket(key, seed).asc(), F.col(key).asc())
    salt = (hash_bucket(key, seed + "-salt") % n_salts).cast("int")
    base = df.join(F.broadcast(quotas.select(strata, "quota")), strata)
    w1 = Window.partitionBy(strata, "__salt").orderBy(*order)
    survivors = (
        base.withColumn("__salt", salt)
        .withColumn("__rk", F.row_number().over(w1))
        .where(F.col("__rk") <= F.col("quota"))
        .drop("__rk", "__salt")
    )
    w2 = Window.partitionBy(strata).orderBy(*order)
    return (
        survivors.withColumn("rk", F.row_number().over(w2).cast("long"))
        .where(F.col("rk") <= F.col("quota"))
        .drop("quota")
    )


def weighted_sample_exact(
    df: DataFrame,
    weight_col: str,
    key: str,
    n: int,
    seed: str = "swarm-wtk",
    n_salts: int = 16,
) -> DataFrame:
    """EXACTLY ``n`` rows, weighted WITHOUT replacement (Efraimidis &
    Spirakis 2006, algorithm A-ES): each row draws the deterministic
    uniform u = (hash_bucket(key) + 1) / 2^32 and competes with the
    exponential clock r = -ln(u) / w; the n smallest clocks win, which
    realizes inclusion odds sequentially proportional to the integer
    ``weight_col``. Complements :func:`weighted_sample` (Bernoulli,
    ~n expected) when the sample size must be exact. Zero-weight rows
    never win (their clock is +inf by convention — they are filtered).

    Still a pure function of the records: the hash is the only
    randomness, so the kept set survives repartitioning, growth
    re-runs, and cluster size. NOT value-oracled like the Bernoulli
    form: the ORDER key is a transcendental double (one ln per row),
    and a last-ulp ln difference between engines could flip a
    near-tie; within Spark the ranking is deterministic. Ties broken
    by ``key``.

    Scale shape: the global top-n is the salted TWO-PHASE rank — phase
    1 keeps n per (salt) partition, phase 2 ranks only the
    <= n_salts * n survivors (a literal bound), so no task ever holds
    the corpus."""
    from pyspark.sql import Window

    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    # denominator is 2^32 + 1 so u < 1.0 strictly even for the max
    # bucket (u = 1.0 would make the clock 0 for ANY positive weight,
    # unconditionally outranking every other row)
    u = (hash_bucket(key, seed) + F.lit(1)).cast("double") / F.lit(float(_SPACE) + 1.0)
    clock = -F.log(u) / F.col(weight_col).cast("double")
    base = df.where(F.col(weight_col) > 0).withColumn("__clk", clock)
    order = (F.col("__clk").asc(), F.col(key).asc())
    salt = (hash_bucket(key, seed + "-salt") % n_salts).cast("int")
    w1 = Window.partitionBy("__salt").orderBy(*order)
    survivors = (
        base.withColumn("__salt", salt)
        .withColumn("__rk", F.row_number().over(w1))
        .where(F.col("__rk") <= n)
        .drop("__rk", "__salt")
    )
    w2 = Window.partitionBy().orderBy(*order)
    return (
        survivors.withColumn("__rk", F.row_number().over(w2))
        .where(F.col("__rk") <= n)
        .drop("__rk", "__clk")
    )
