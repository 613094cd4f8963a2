"""Deduplication operators for training-data pipelines.

Five tiers, all expressed as DataFrame compositions (no Python in the
row path) with deterministic, SQL-oracle-checkable outputs:

- exact           — hash-groupBy on content digest
- ngram-jaccard   — shared-shingle candidate join → exact Jaccard
- minhash + LSH   — per-permutation min(md5(seed|shingle)) signatures,
                    banded; candidates = docs sharing a band key
- simhash         — 16-bit tf-weighted hash-majority sketch; near-dups
                    by Hamming distance
- embedding cosine— near-dup pairs within an IVF-style cell (label)

Scale notes (100 TB): every operator shuffles once on its blocking key
(digest / shingle / band key / simhash-cross / cell) and aggregates
map-side first. The candidate joins are equi-joins on high-selectivity
keys, so AQE handles skew; nothing materializes O(n²) except the
explicitly-bounded simhash cross (use the banded variants upstream of
pair verification at scale).

MinHash math: sig_p(doc) = min over shingles of md5(p || '|' ||
shingle); P(sig equal) = Jaccard. Band key b = md5 of the r
signatures in the band; sharing any band key ⇒ candidate pair
(standard LSH banding, Broder '97 / MMDS ch.3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens_col


# --------------------------------------------------------------- exact
def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id row per exact content digest (md5), all
    columns preserved.

    ONE map-side-combinable shuffle: ``min_by(struct(row), id)`` per
    digest group picks the winning row during partial aggregation, so a
    massively-duplicated document collapses per map task and no second
    full-frame shuffle (the old agg + left-semi join shape) is needed.
    """
    cols = df.columns
    return (
        df.withColumn("__h", F.md5(F.col(text_col)))
        .groupBy("__h")
        .agg(F.min_by(F.struct(*cols), F.col(id_col)).alias("__r"))
        .select("__r.*")
    )


def exact_dedup_text(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One-shuffle exact dedup projecting only ``(id, text)``.

    groupBy the content digest with map-side-combinable ``min(id)`` /
    ``first(text)`` — every row in a digest group carries the SAME text
    (that is what the digest means), so ``first`` is value-determined,
    and a massively-duplicated document (empty pages, "404" bodies)
    collapses to one row per map task before the shuffle. Use this
    instead of :func:`exact_dedup` when downstream only needs id+text:
    it replaces the generic keep-all-columns semi-join (agg shuffle +
    join shuffle of the full frame) with a single exchange.
    """
    return (
        df.select(
            F.col(id_col), F.col(text_col), F.md5(F.col(text_col)).alias("h")
        )
        .groupBy("h")
        .agg(F.min(id_col).alias(id_col), F.first(text_col).alias(text_col))
        .select(id_col, text_col)
    )


def exact_dup_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    h = F.md5(F.col(text_col))
    return df.select(h.alias("h")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("h").alias("n_unique"),
    )


# ------------------------------------------------------- shingle frame
def doc_shingles(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """(doc_id, shingle) distinct pairs — the base relation for
    jaccard/minhash.

    Formulated as explode-positions + element_at projection instead of
    exploding a ``transform``-built array: higher-order functions are
    interpreted row-at-a-time outside whole-stage codegen, while
    explode+project stays fully codegen'd — measured 11× faster at
    sf0.1 (0.4s vs 4.2s for the 260k-shingle frame). Same output rows.
    """
    ws = tokens_col(text_col)
    base = df.select(F.col(id_col).alias("doc_id"), ws.alias("ws")).where(
        F.size("ws") >= n
    )
    pos = base.select(
        "doc_id",
        "ws",
        F.explode(F.sequence(F.lit(1), F.size("ws") - (n - 1))).alias("i"),
    )
    return pos.select(
        "doc_id",
        F.concat_ws(
            " ", *[F.element_at("ws", F.col("i") + k) for k in range(n)]
        ).alias("sh"),
    ).distinct()


def prune_by_df(
    shingles: DataFrame, max_df: int, broadcast_overcap: bool = True
) -> DataFrame:
    """Drop shingles whose document frequency exceeds ``max_df``.

    Standard DF-pruning before a shared-shingle candidate join: a
    shingle present in d documents contributes O(d²) candidate rows, so
    ubiquitous shingles ("of the and"-type) make a skewed corpus
    quadratic. Near-dup pairs share many *rare* shingles, so pruning
    the ubiquitous ones bounds the join at negligible recall cost
    (the cap must exceed the largest true duplicate-cluster size).

    Scale shape: two-phase map-side-combined ``groupBy(sh).count()``
    (the hot shingle collapses to ONE row per map task before the agg
    shuffle), then a broadcast LEFT ANTI join against the over-cap key
    set. The over-cap set holds at most rows/max_df distinct shingles —
    tiny for any sane cap — so the big shingle frame is never shuffled
    here at all; its one shuffle stays with the downstream candidate
    join. The earlier window formulation (`count().over(partitionBy
    (sh))`) put every row of the hot shingle on ONE task — a window
    partition can never be split by AQE, and a DF≈N shingle is exactly
    the input ``max_df`` exists for. ``broadcast_overcap=False`` falls
    back to a shuffle anti-join (AQE can skew-split a join, never a
    window) for the pathological corpus whose over-cap set itself
    exceeds the broadcast threshold.
    """
    over = (
        shingles.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") > max_df)
        .select("sh")
    )
    if broadcast_overcap:
        over = F.broadcast(over)
    return shingles.join(over, "sh", "left_anti")


def shared_substring_runs(
    df: DataFrame,
    k: int = 8,
    min_run: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int = 100,
) -> DataFrame:
    """Exact shared-substring runs of ≥ ``min_run`` tokens between
    document pairs — the ExactSubstr dedup signal (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"):
    verbatim passages copied across documents, which set-based Jaccard
    underweights and MinHash can miss entirely when the rest of the
    documents differ.

    Method: every k-token gram is hashed with its position; matching
    grams across a pair lie on a DIAGONAL (pos_a − pos_b constant),
    and consecutive positions on one diagonal merge into a maximal
    run via the gaps-and-islands rule (pos − row_number constant ⇔
    contiguous). A run of m matching grams is m + k − 1 shared tokens.
    Output (doc_a, doc_b, start_a, start_b, run_tokens).

    Scale shape: gram hashing is the codegen explode-project shape of
    winnowing; DF pruning caps the candidate join exactly as the
    Jaccard tier does (a boilerplate gram in d docs is O(d²) —
    ``max_df`` bounds it); the islands window partitions by (pair,
    diagonal), so a window partition is bounded by one PAIR's matches
    on one alignment — per-document-pair-bounded, the same taxonomy
    class as winnowing's per-doc window, never corpus-keyed.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if min_run < k:
        raise ValueError(f"min_run must be >= k, got {min_run} < {k}")
    from pyspark.sql import Window

    ws = tokens_col(text_col)
    base = df.select(F.col(id_col).alias("doc_id"), ws.alias("ws")).where(
        F.size("ws") >= k
    )
    pos = base.select(
        "doc_id",
        "ws",
        F.explode(F.sequence(F.lit(0), F.size("ws") - k)).alias("i"),
    )
    gram = F.concat_ws(
        " ", *[F.element_at("ws", F.col("i") + j + 1) for j in range(k)]
    )
    hashed = pos.select(
        "doc_id", F.col("i").cast("long").alias("i"), F.md5(gram).alias("sh")
    )
    pruned = prune_by_df(hashed, max_df)
    a = pruned.select(
        F.col("doc_id").alias("doc_a"), F.col("i").alias("pa"), "sh"
    )
    b = pruned.select(
        F.col("doc_id").alias("doc_b"), F.col("i").alias("pb"), "sh"
    )
    m = (
        a.join(b, "sh")
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "pa", "pb", (F.col("pa") - F.col("pb")).alias("diag"))
    )
    w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pa")
    return (
        m.withColumn("island", F.col("pa") - F.row_number().over(w))
        .groupBy("doc_a", "doc_b", "diag", "island")
        .agg(
            F.min("pa").alias("start_a"),
            F.min("pb").alias("start_b"),
            F.count(F.lit(1)).alias("nm"),
        )
        .where(F.col("nm") + (k - 1) >= min_run)
        .select(
            "doc_a",
            "doc_b",
            "start_a",
            "start_b",
            (F.col("nm") + (k - 1)).cast("long").alias("run_tokens"),
        )
        .orderBy("doc_a", "doc_b", "start_a")
    )


def auto_max_df(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    budget_pairs_per_row: int = 8,
    floor: int = 16,
    cap_max: int = 1 << 30,
    shingles: DataFrame | None = None,
) -> int:
    """Derive the DF cap for the Jaccard/MinHash candidate join from
    the MEASURED shingle-df distribution instead of corpus row count
    (the r8 SCALING.md guidance, encoded: "scale the cap with corpus
    growth only when the shingle vocabulary grows too — never on a
    saturated key space").

    A shingle in d docs contributes min(d, cap)² candidate rows, so
    the cap is exactly the knob bounding the join's quadratic term.
    This picks the LARGEST power-of-two cap whose conservative
    candidate estimate Σ_sh min(df, cap)² stays within a LINEAR budget
    of ``budget_pairs_per_row`` × (total shingle rows):

    - real Zipfian corpora: vocabulary grows with the corpus, dfs stay
      flat, the estimate stays small at any cap → the cap floats up
      (no recall lost to pruning);
    - saturated key spaces (tiny vocab — the synthetic-corpus worst
      case): every df grows ∝ N, so the budget only admits a cap
      ≈ √(budget·rows/vocab) — growing as √N, never ∝ N — and the
      candidate volume stays LINEAR in corpus rows by construction
      (a max_df ∝ N rule makes it quadratic here; that was the r8
      scale probe's 17.3× row).

    Cost: the same one map-side-combined ``groupBy(sh).count()`` the
    pruning pass already pays, folded to a ≤ ~40-row log₂ df histogram
    (driver traffic = metadata). The estimate uses each bin's upper
    bound, so it over-counts (never under-protects). Returns
    ``max(floor, chosen)`` clamped to ``cap_max``; pass the result as
    ``max_df`` to :func:`ngram_jaccard_pairs` /
    :func:`minhash_signatures`."""
    if budget_pairs_per_row < 1 or floor < 1:
        raise ValueError(
            f"budget_pairs_per_row and floor must be >= 1, got "
            f"{budget_pairs_per_row}, {floor}"
        )
    s = doc_shingles(df, text_col, id_col, n) if shingles is None else shingles
    hist = (
        s.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("df"))
        .select(F.ceil(F.log2("df")).cast("int").alias("b"), "df")
        .groupBy("b")
        .agg(
            F.count(F.lit(1)).alias("n_sh"),
            F.sum("df").alias("rows"),
        )
        .collect()
    )
    if not hist:
        return floor
    total_rows = sum(int(r["rows"]) for r in hist)
    bins = sorted((int(r["b"]), int(r["n_sh"])) for r in hist)
    return _select_df_cap(bins, total_rows, budget_pairs_per_row, floor, cap_max)


def _select_df_cap(
    bins: list[tuple[int, int]],
    total_rows: int,
    budget_pairs_per_row: int,
    floor: int,
    cap_max: int,
) -> int:
    """Pure cap selection from a log₂ df histogram (``bins`` =
    [(⌈log₂ df⌉, n_shingles)]): the largest power-of-two cap whose
    conservative candidate estimate Σ n·min(2^b, cap)² stays within
    ``budget_pairs_per_row × total_rows``, clamped to [floor, cap_max].
    Factored out of :func:`auto_max_df` so the selection invariants
    (bounds, budget-maximality, budget monotonicity) are directly
    property-testable without a Spark session."""

    budget = budget_pairs_per_row * total_rows

    def est(cap: int) -> int:
        return sum(n_sh * min(1 << b, cap) ** 2 for b, n_sh in bins)

    cap = 1
    while cap < cap_max and est(cap * 2) <= budget:
        cap *= 2
    return min(max(cap, floor), cap_max)


# ------------------------------------------------------ ngram jaccard
def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    max_df: int | None = None,
) -> DataFrame:
    """Exact Jaccard over word n-gram shingle sets, candidate-limited
    to pairs sharing ≥1 shingle (the only pairs with J > 0).

    ``max_df`` applies :func:`prune_by_df` to the shingle frame first —
    sizes, intersections, and Jaccard are then all over the pruned
    shingle space (consistent set semantics, oracle-mirrorable). At
    100-TB scale always set it: it is what bounds the candidate join
    on a skewed corpus.

    Output: (doc_a, doc_b, inter, union, jaccard) with doc_a < doc_b,
    jaccard rounded to 6 digits (ints in, bit-stable across engines).
    """
    s = doc_shingles(df, text_col, id_col, n)
    if max_df is not None:
        s = prune_by_df(s, max_df)
    # Per-doc set sizes via groupBy(doc_id) — a map-side-combined
    # partial count collapses each doc to one (doc_id, partial) row
    # per task BEFORE its shuffle, so a pathological giant document
    # costs nothing extra (the earlier `count().over(partitionBy
    # (doc_id))` window shuffled that doc's every shingle row onto ONE
    # unsplittable task). Sizes re-attach to the candidate frame AFTER
    # the pair aggregation — the joins touch |candidate_pairs| rows,
    # not |shingles| — and because the sizes branch and both self-join
    # sides are the same canonical subtree, AQE stage reuse computes
    # the pruned shingle frame once (3 ReusedExchange in the final
    # plan; measured 25-45% faster than the window formulation at
    # sf0.1). Sizes are over the pruned shingle space, matching the
    # intersection (consistent set semantics, oracle-mirrorable).
    sizes = s.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = s.alias("a")
    b = s.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    j = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "inter",
            (F.col("na") + F.col("nb") - F.col("inter")).alias("un"),
            F.round(j, 6).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
        .orderBy("doc_a", "doc_b")
    )


# ------------------------------------------------------- minhash + LSH
def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_perm: int = 12,
    max_df: int | None = None,
) -> DataFrame:
    """(doc_id, sigs array<string>) — per-permutation minima of
    md5(perm || '|' || shingle). String-min keeps the whole pipeline
    portable (no 64-bit hash semantics to match across engines).

    ``max_df`` DF-prunes the shingle frame first (signatures are then
    MinHash over the pruned sets — set it when the downstream band join
    must stay bounded on a corpus with huge duplicate clusters).

    All ``num_perm`` hashes are computed as columns of ONE row per
    shingle and folded with per-column min aggregates — a single
    map-side-combined shuffle of the shingle frame, instead of
    exploding ×num_perm first."""
    s = doc_shingles(df, text_col, id_col, n)
    if max_df is not None:
        s = prune_by_df(s, max_df)
    hashed = s.select(
        "doc_id",
        *[
            F.md5(F.concat_ws("|", F.lit(str(p)), F.col("sh"))).alias(f"h{p}")
            for p in range(num_perm)
        ],
    )
    mins = hashed.groupBy("doc_id").agg(
        *[F.min(f"h{p}").alias(f"m{p}") for p in range(num_perm)]
    )
    return mins.select(
        "doc_id", F.array(*[F.col(f"m{p}") for p in range(num_perm)]).alias("sigs")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_perm: int = 12,
    bands: int = 4,
    max_df: int | None = None,
) -> DataFrame:
    """LSH candidate pairs: (doc_a, doc_b, shared_bands, est_jaccard).

    est_jaccard = fraction of equal signature components (unbiased
    MinHash estimate). rows-per-band r = num_perm / bands.
    """
    if num_perm % bands:
        raise ValueError("num_perm must be divisible by bands")
    r = num_perm // bands
    sigs = minhash_signatures(df, text_col, id_col, n, num_perm, max_df)
    # The signature array (~num_perm × 32-hex ≈ 400 B/doc) RIDES the
    # band-key shuffle: carrying it costs bands×|sigs| per doc, far
    # cheaper than re-running the signature aggregation (a full
    # shingle-frame shuffle at ~|shingles|×|sigs| per doc) for
    # re-attach joins. Executed-plan shape (verified at sf0.1, AQE
    # on): the self-join's second side reads the FIRST side's
    # partial-min exchange via AQE stage reuse (ReusedExchange on the
    # hash(doc_id) shuffle), so signatures aggregate once even when
    # the band join is broadcast; Catalyst additionally pushes the
    # DF-prune anti-join below the shingle distinct and then drops the
    # distinct entirely on this path (min() is duplicate-agnostic), so
    # the probe pipeline is scan → explode → hash → map-side partial
    # min with NO full-row shuffle at all. Total corpus scans ≤ 2 (the
    # probe + the DF-stats branch of prune_by_df) — pinned by the
    # scan-budget sweep in tests/test_plans.py.
    banded = sigs.select(
        "doc_id",
        "sigs",
        F.posexplode(
            F.array(
                *[
                    F.md5(F.concat_ws("|", F.slice("sigs", b * r + 1, r)))
                    for b in range(bands)
                ]
            )
        ).alias("band", "key"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.key") == F.col("b.key"))
            & (F.col("a.band") == F.col("b.band"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(
            F.countDistinct("a.band").alias("shared_bands"),
            F.first("a.sigs").alias("sa"),  # equal across the group
            F.first("b.sigs").alias("sb"),
        )
    )
    est = F.size(F.filter(F.zip_with("sa", "sb", lambda x, y: x == y), lambda e: e)) / float(
        num_perm
    )
    return pairs.select(
        "doc_a", "doc_b", "shared_bands", F.round(est, 6).alias("est_jaccard")
    ).orderBy("doc_a", "doc_b")


# ------------------------------------------------------------- simhash
def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 16,
) -> DataFrame:
    """tf-weighted SimHash sketch (Charikar '02): per bit, sum
    tf·(bit(md5(token))? +1 : −1); sketch bit = majority sign.

    Bit extraction goes through hex-digit arithmetic (portable to any
    SQL engine; no 64-bit integer-hash parity needed). Integral tf
    weights keep the per-bit sums exact.

    ``bits`` may go up to 62 (md5 supplies 128; the sketch packs into a
    signed long, and Σ 2^b for b ≤ 62 is the max that fits). Use ≥ 48
    at ≫10⁶-doc scale so the pigeonhole blocks in
    :func:`simhash_pairs_blocked` stay selective.
    """
    if not 1 <= bits <= 62:
        raise ValueError(f"bits must be in [1, 62] (long-packed sketch), got {bits}")
    ws = tokens_col(text_col)
    tf = (
        df.select(F.col(id_col).alias("doc_id"), F.explode(ws).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("h", F.md5("w"))
    )
    # One ±tf sum PER BIT as aggregate columns — no 62-way row explode:
    # the shuffle carries (doc_id, `bits` longs) with map-side combine,
    # and every bit extraction is whole-stage-codegen hex arithmetic.
    # Hex digits decoded once per (doc, token) via conv(); bit b of the
    # sketch is bit b%4 of hex digit b//4 (LSB-first, matching the
    # oracle's instr-based decode).
    digits = [
        F.conv(F.substring("h", d + 1, 1), 16, 10).cast("int").alias(f"d{d}")
        for d in range((bits + 3) // 4)
    ]
    keyed = tf.select("doc_id", "tf", *digits)
    sums = [
        F.sum(
            F.col("tf")
            * (F.shiftright(F.col(f"d{b // 4}"), b % 4).bitwiseAND(F.lit(1)) * 2 - 1)
        ).alias(f"s{b}")
        for b in range(bits)
    ]
    per_doc = keyed.groupBy("doc_id").agg(*sums)
    sketch = None
    for b in range(bits):
        term = F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sketch = term if sketch is None else sketch + term
    return per_doc.select("doc_id", sketch.cast("long").alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 16,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance.

    The pair join blocks on the top half of the sketch (any pair within
    Hamming ≤ bits/2 of all-top-bits shares it with good recall at
    these thresholds is NOT guaranteed — so this uses the exact cross
    within sketch-value buckets ordered doc_a < doc_b; at 100-TB scale
    put the banded MinHash in front and use this as the verifier).
    """
    s = simhash(df, text_col, id_col, bits)
    a = s.alias("a")
    b = s.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.cast("long").alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .orderBy("doc_a", "doc_b")
    )


def simhash_pairs_blocked(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 16,
    max_hamming: int = 3,
) -> DataFrame:
    """EXACT same output as ``simhash_pairs`` without the O(n²) cross.

    Pigeonhole blocking (Manku et al., WWW'07): split the sketch into
    ``max_hamming + 1`` bit-blocks — any pair within Hamming distance
    ``max_hamming`` differs in at most that many blocks, so it agrees
    exactly on at least one block. Candidates = pairs sharing a
    (block, block-value) key; the Hamming filter then verifies.

    Scale shape: one slim (doc_id, block, value, sketch) shuffle for
    the candidate join — the 8-byte sketch rides along, so no
    re-attach joins and the sketch aggregate is computed once (the
    self-join's two identical exchanges collapse via ReusedExchange).
    Distinct pair aggregation has map-side combine. Recall is exact
    (not probabilistic); with wider sketches the block keys get more
    selective and candidate volume drops super-linearly.
    """
    nblocks = max_hamming + 1
    width = (bits + nblocks - 1) // nblocks
    mask = (1 << width) - 1
    s = simhash(df, text_col, id_col, bits)
    keyed = s.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("simhash", b * width).bitwiseAND(F.lit(mask))
                    for b in range(nblocks)
                ]
            )
        ).alias("blk", "val"),
    )
    a = keyed.alias("a")
    b = keyed.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.cast("long").alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
        .orderBy("doc_a", "doc_b")
    )


# ------------------------------------------- embedding cosine near-dup
def dot_expr(x: Column | str, y: Column | str) -> Column:
    """Sequential-fold dot product of two float arrays in double.

    Left-to-right accumulation (F.aggregate) matches DuckDB's
    list_dot_product fold, so results are bit-identical across the
    engines — no rounding fudge needed beyond a final round().
    """
    cx = F.col(x) if isinstance(x, str) else x
    cy = F.col(y) if isinstance(y, str) else y
    return F.aggregate(
        F.zip_with(cx, cy, lambda p, q: p.cast("double") * q.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_expr(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity via sequential-fold dots (see dot_expr)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return dot_expr(ca, cb) / F.sqrt(dot_expr(ca, ca) * dot_expr(cb, cb))


def embedding_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cell_col: str = "label",
    threshold: float = 0.98,
    vectorized: bool = True,
) -> DataFrame:
    """Near-duplicate pairs by cosine, blocked on an IVF-style cell
    column (same-cell pairs only — the scale path; a learned
    cell assignment plugs into ``cell_col``).

    ``vectorized=True`` (default) scores each cell's pairs with ONE
    numpy gram-matrix product inside ``applyInPandas`` — the within-
    cell quadratic runs as a BLAS matmul instead of ~dim interpreted
    fold steps per pair (measured ~6× at sf0.1; the gap widens with
    cell size). ``vectorized=False`` keeps the pure-DataFrame join
    whose sequential-fold dot is bit-identical to the DuckDB oracle's
    ``list_dot_product`` — use it as the parity verifier. Both paths
    emit the same rows (cos agrees to well past the 9 rounded digits).

    At 100 TB, cap cell populations before this operator: a cell must
    fit one worker's memory and its pair count is quadratic. Split hot
    cells with a secondary blocking key — see
    :func:`embedding_signlsh_pairs` for the sign-LSH refinement.
    """
    if vectorized:
        types = dict(df.dtypes)
        out_schema = (
            f"id_a {types[id_col]}, id_b {types[id_col]}, "
            f"cell {types[cell_col]}, cos double"
        )
        base = df.select(
            F.col(id_col).alias("id"),
            F.col(cell_col).alias("cell"),
            F.col(vec_col).alias("v"),
        )
        thr = float(threshold)

        # nested so cloudpickle ships it by value (workers don't have
        # swarm_spark on their path under the grading session)
        def _cell_pairs(pdf):
            import numpy as np
            import pandas as pd

            pdf = pdf.sort_values("id")
            ids = pdf["id"].to_numpy()
            n = len(ids)
            if n < 2:
                return pd.DataFrame(
                    {"id_a": ids[:0], "id_b": ids[:0], "cell": pdf["cell"][:0], "cos": []}
                )
            V = np.array([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            n2 = np.einsum("ij,ij->i", V, V)
            C = (V @ V.T) / np.sqrt(np.outer(n2, n2))
            ia, ib = np.triu_indices(n, 1)
            cos = np.round(C[ia, ib], 9)
            m = cos >= thr
            return pd.DataFrame(
                {
                    "id_a": ids[ia[m]],
                    "id_b": ids[ib[m]],
                    "cell": pdf["cell"].iloc[0],
                    "cos": cos[m],
                }
            )

        return (
            base.groupBy("cell")
            .applyInPandas(_cell_pairs, out_schema)
            .orderBy("id_a", "id_b")
        )

    base = df.select(
        F.col(id_col).alias("id"),
        F.col(cell_col).alias("cell"),
        F.col(vec_col).alias("v"),
        dot_expr(vec_col, vec_col).alias("n2"),
    )
    a = base.select(
        F.col("id").alias("id_a"), "cell", F.col("v").alias("va"), F.col("n2").alias("n2a")
    )
    b = base.select(
        F.col("id").alias("id_b"), "cell", F.col("v").alias("vb"), F.col("n2").alias("n2b")
    )
    cos = F.round(dot_expr("va", "vb") / F.sqrt(F.col("n2a") * F.col("n2b")), 9)
    return (
        a.join(b, "cell")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.col("cell"), cos.alias("cos"))
        .where(F.col("cos") >= threshold)
        .orderBy("id_a", "id_b")
    )


# ------------------------------------------- embedding sign-LSH (Charikar)
def rademacher_planes(num_planes: int, dim: int) -> list[list[int]]:
    """Deterministic ±1 hyperplanes: sign p,d = parity of the first hex
    digit of md5(f"{p}|{d}"). Pure-Python + hashlib, so the SAME literal
    planes can be embedded in the Spark plan and in an oracle SQL string
    — no cross-engine hash-function parity needed at query time."""
    import hashlib

    return [
        [
            1 if int(hashlib.md5(f"{p}|{d}".encode()).hexdigest()[0], 16) % 2 else -1
            for d in range(dim)
        ]
        for p in range(num_planes)
    ]


def embedding_signlsh_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_planes: int = 16,
    bands: int = 4,
    threshold: float = 0.98,
    dim: int | None = None,
    vectorized: bool = True,
) -> DataFrame:
    """Cosine near-dup pairs via random-hyperplane (sign) LSH —
    Charikar '02: P(sign_p(a) = sign_p(b)) = 1 − θ(a,b)/π, so vectors
    at high cosine agree on almost every plane. Pairs are candidates
    when they share ANY band of sign bits (num_planes / bands bits per
    band), then verified with the exact sequential-fold cosine.

    This is the cell-free scale path for embedding dedup: the wide
    stage ships (id, band, key, vector) — carrying the vector costs
    bands×dim floats per doc but saves TWO full corpus re-scans that
    re-attach joins would need, and lets the self-join's identical
    exchanges collapse via ReusedExchange (the 32-projection sketch is
    computed exactly once). No cell population cap is needed because
    band keys refine automatically (doubling planes squares band
    selectivity).

    Output: (id_a, id_b, shared_bands, cos) with cos ≥ threshold.
    """
    if num_planes % bands:
        raise ValueError("num_planes must be divisible by bands")
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    r = num_planes // bands
    planes = rademacher_planes(num_planes, dim)
    if vectorized:
        # Arrow-batched numpy sketch with FOLD-EXACT arithmetic: the
        # accumulation is vectorized ACROSS rows but sequential ACROSS
        # dimensions (one fused multiply-add per dim), so every
        # projection and norm is bit-identical to the interpreted
        # aggregate(zip_with(...)) fold — and to DuckDB's sequential
        # list_dot_product — while running ~num_planes× fewer
        # interpreter steps (measured ~4× end-to-end at 16×64).
        import numpy as np

        P = np.asarray(planes, dtype=np.float64)  # (num_planes, dim)
        n_pl = num_planes

        def _sketch_batches(it):
            import numpy as _np
            import pandas as _pd

            for pdf in it:
                if not len(pdf):
                    continue  # np.array([]).reshape(0, -1) raises
                V = _np.array(
                    [_np.asarray(x, dtype=_np.float64) for x in pdf["v"]]
                ).reshape(len(pdf), -1)
                acc = _np.zeros((len(pdf), n_pl))
                n2 = _np.zeros(len(pdf))
                for d in range(V.shape[1]):  # sequential over dims = fold order
                    col = V[:, d]
                    acc += col[:, None] * P[:, d][None, :]
                    n2 += col * col
                out = _pd.DataFrame({"id": pdf["id"], "v": pdf["v"], "n2": n2})
                for p in range(n_pl):
                    out[f"s{p}"] = (acc[:, p] > 0).astype("int32")
                yield out

        types = dict(df.dtypes)
        sk_schema = (
            f"id {types[id_col]}, v {types[vec_col]}, n2 double, "
            + ", ".join(f"s{p} int" for p in range(num_planes))
        )
        sketch = df.select(
            F.col(id_col).alias("id"), F.col(vec_col).alias("v")
        ).mapInPandas(_sketch_batches, sk_schema)
    else:
        v = F.col(vec_col)
        # Rademacher projection = dot with the ±1.0 literal plane, as a
        # left-to-right fold over double-cast elements — bit-identical
        # to DuckDB's sequential list_dot_product against the same
        # literal. (A flat Σ ±v[d] expression tree is algebraically the
        # same but its 64-term × num_planes Add tree stalls
        # Catalyst/codegen.) Built as ONE parsed SQL string per plane:
        # the Column-object equivalent is num_planes × dim F.lit py4j
        # round trips (~5 s of driver time at 16×64); parsing is a
        # single call and yields the same aggregate(zip_with(...))
        # expression as dot_expr.
        def _plane_proj(p: int) -> Column:
            arr = ", ".join(f"{float(s)}D" for s in planes[p])
            return F.expr(
                f"aggregate(zip_with(`{vec_col}`, array({arr}), "
                "(p, q) -> CAST(p AS DOUBLE) * CAST(q AS DOUBLE)), "
                "0.0D, (acc, x) -> acc + x)"
            )

        projs = [_plane_proj(p) for p in range(num_planes)]
        sketch = df.select(
            F.col(id_col).alias("id"),
            v.alias("v"),
            dot_expr(v, v).alias("n2"),
            *[(projs[p] > 0).cast("int").alias(f"s{p}") for p in range(num_planes)],
        )
    banded = sketch.select(
        "id",
        "v",
        "n2",
        F.posexplode(
            F.array(
                *[
                    F.concat_ws(
                        "", *[F.col(f"s{b * r + i}").cast("string") for i in range(r)]
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "key"),
    )
    slim = banded.select("id", "v", "n2", "band", "key")
    a = slim.alias("a")
    b = slim.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.key") == F.col("b.key"))
            & (F.col("a.band") == F.col("b.band"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(
            F.countDistinct("a.band").alias("shared_bands"),
            F.first("a.v").alias("va"),  # equal across the group
            F.first("a.n2").alias("n2a"),
            F.first("b.v").alias("vb"),
            F.first("b.n2").alias("n2b"),
        )
    )
    cos = F.round(dot_expr("va", "vb") / F.sqrt(F.col("n2a") * F.col("n2b")), 9)
    return pairs.select(
        "id_a", "id_b", "shared_bands", cos.alias("cos")
    ).where(F.col("cos") >= threshold).orderBy("id_a", "id_b")


# -------------------------------------------------- incremental dedup
def content_digests(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", fp_n: int = 5
) -> DataFrame:
    """(doc_id, h, fp) in ONE pass over the text column: h = md5 of the
    full text, fp = winnowing fingerprint (min-md5 over rolling
    ``fp_n``-gram windows; NULL for docs shorter than ``fp_n`` tokens
    — same contract as :func:`~swarm_spark.ops.text.fingerprint`).

    ``explode_outer`` keeps short docs as a single null-window row, so
    one map-side-combined groupBy yields both digests without a second
    scan — this is the frame a real deployment materializes as its
    corpus digest table.
    """
    ws = tokens_col(text_col)
    base = df.select(
        F.col(id_col).alias("doc_id"), F.md5(F.col(text_col)).alias("h"), ws.alias("ws")
    )
    pos = base.select(
        "doc_id",
        "h",
        "ws",
        F.explode_outer(
            F.when(
                F.size("ws") >= fp_n,
                F.sequence(F.lit(1), F.size("ws") - (fp_n - 1)),
            )
        ).alias("i"),
    )
    gram = F.when(
        F.col("i").isNotNull(),
        F.md5(
            F.concat_ws(
                " ", *[F.element_at("ws", F.col("i") + k) for k in range(fp_n)]
            )
        ),
    )
    return pos.groupBy("doc_id").agg(
        F.first("h").alias("h"), F.min(gram).alias("fp")
    )


def _bloom_exprs(n_blocks: int, k: int) -> tuple[Column, Column]:
    """(block, mask) Columns over a ``__bloom_h`` md5-hex column, all
    integer arithmetic: block = first 8 hex digits mod n_blocks; mask =
    OR of ``k`` bits, bit_j = hex[8+4j : 12+4j] mod 62. 62-bit masks
    keep every shift in signed-positive bigint range on BOTH engines
    (the repo's simhash 62-bit trick), so the whole filter is
    engine-exact — a Bloom filter with a DuckDB oracle."""
    if not 1 <= k <= 6:
        raise ValueError(f"k must be in [1, 6] (md5 has 32 hex chars), got {k}")
    if n_blocks < 1:
        raise ValueError(f"n_blocks must be >= 1, got {n_blocks}")
    block = (
        F.conv(F.substring("__bloom_h", 1, 8), 16, 10).cast("long") % n_blocks
    ).cast("int")
    terms = " | ".join(
        "shiftleft(cast(1 as bigint), "
        f"cast(conv(substring(__bloom_h, {9 + 4 * j}, 4), 16, 10) % 62 as int))"
        for j in range(k)
    )
    return block, F.expr(terms)


def _bloom_hash(key_col: str, seed: str) -> Column:
    return F.md5(F.concat_ws("|", F.lit(seed), F.col(key_col).cast("string")))


def build_block_bloom(
    df: DataFrame,
    key_col: str = "text",
    n_blocks: int = 1024,
    k: int = 4,
    seed: str = "swarm-bloom",
) -> DataFrame:
    """(block, mask): split-block Bloom filter over ``key_col`` — the
    approximate-membership pre-filter for wave-vs-history dedup. A
    100-TB history's digest ledger is corpus-sized; this filter is
    ``n_blocks`` longs (n_blocks × 12 bytes), broadcastable, with NO
    false negatives by construction: probe the wave against it first
    and only the flagged sliver pays the exact anti-join against the
    full ledger.

    Blocked layout (Putze/Sanders/Singler 2007 "Cache-, Hash- and
    Space-Efficient Bloom Filters"; the parquet split-block bloom
    spec's shape): each key sets ``k`` bits inside ONE 62-bit block
    chosen by its hash, so a probe touches one long. Build is a single map-side-combined ``bit_or`` shuffle of
    ≤ n_blocks rows. FPR ≈ (1 − e^(−k·n/m))^k with m = 62·n_blocks
    bits — size n_blocks ≈ n/6 for ~1% at k=4; oversizing only costs
    12 bytes per block. Deterministic (md5-derived bits), so the same
    corpus always builds the identical filter on any engine — pinned by
    the ``dedup_bloom_gate`` oracle.
    """
    block, mask = _bloom_exprs(n_blocks, k)
    return (
        df.select(_bloom_hash(key_col, seed).alias("__bloom_h"))
        .select(block.alias("block"), mask.alias("mask"))
        .groupBy("block")
        .agg(F.bit_or("mask").alias("mask"))
    )


def bloom_contains(
    items: DataFrame,
    bloom: DataFrame,
    key_col: str = "text",
    n_blocks: int = 1024,
    k: int = 4,
    seed: str = "swarm-bloom",
) -> DataFrame:
    """``items`` + ``might_contain`` boolean: probe a
    :func:`build_block_bloom` filter (built with the SAME
    n_blocks/k/seed). The filter broadcasts (≤ n_blocks rows); the
    probe is one codegen projection + broadcast left join — no shuffle
    of the probed frame. ``might_contain=False`` is definitive (no
    false negatives); ``True`` means "check exactly"."""
    # probe-side temporaries use collision-safe __bloom_* names:
    # 'block' is build_block_bloom's OWN output column, so a frame
    # derived from bloom tooling is a plausible probe input and a bare
    # withColumn("block", ...) would silently destroy it (ADVICE r7)
    block, mask = _bloom_exprs(n_blocks, k)
    probed = (
        items.withColumn("__bloom_h", _bloom_hash(key_col, seed))
        .withColumn("__bloom_block", block)
        .withColumn("__bloom_m", mask)
    )
    filt = F.broadcast(
        bloom.select(
            F.col("block").alias("__bloom_block"), F.col("mask").alias("__bloom_bmask")
        )
    )
    return (
        probed.join(filt, "__bloom_block", "left")
        .withColumn(
            "might_contain",
            F.coalesce(
                F.col("__bloom_bmask").bitwiseAND(F.col("__bloom_m"))
                == F.col("__bloom_m"),
                F.lit(False),
            ),
        )
        .drop("__bloom_h", "__bloom_m", "__bloom_bmask", "__bloom_block")
    )


def linear_count_bitmap(
    df: DataFrame,
    key_col: str,
    n_blocks: int = 4096,
    seed: str = "swarm-lc",
) -> DataFrame:
    """(block, mask): the linear-counting bitmap of ``key_col`` — the
    MATERIALIZABLE form of the sketch (≤ n_blocks rows; store it next
    to the corpus like the vocab counts). Bitmaps are a bit_or monoid:
    :func:`merge_count_bitmaps` of two waves' bitmaps equals the
    full-recompute bitmap exactly, so incremental maintenance never
    rescans history (pinned by the ``corpus_sketch_incremental``
    oracle). One codegen projection + one map-side-combined ``bit_or``
    shuffle of ≤ n_blocks rows; the corpus is never shuffled by key."""
    block, mask = _bloom_exprs(n_blocks, k=1)
    return (
        df.select(_bloom_hash(key_col, seed).alias("__bloom_h"))
        .select(block.alias("block"), mask.alias("mask"))
        .groupBy("block")
        .agg(F.bit_or("mask").alias("mask"))
    )


def merge_count_bitmaps(stored: DataFrame, delta: DataFrame) -> DataFrame:
    """Fold a wave's bitmap into a stored bitmap — union + per-block
    ``bit_or`` over ≤ 2·n_blocks rows (metadata-sized). Exactly the
    incremental contract of :func:`~swarm_spark.ops.text.vocab_merge`,
    for cardinality instead of counts."""
    return (
        stored.select("block", "mask")
        .unionByName(delta.select("block", "mask"))
        .groupBy("block")
        .agg(F.bit_or("mask").alias("mask"))
    )


def linear_count_estimate(bitmap: DataFrame, n_blocks: int = 4096) -> DataFrame:
    """One-row (m_bits, set_bits, zero_bits, estimate) from a
    :func:`linear_count_bitmap` frame: estimate =
    round(−m · ln(zero_bits / m)) over m = 62·n_blocks bits (Whang et
    al. 1990) — within ~1% while the bitmap is < ~half full (size
    n_blocks ≳ distinct/30); NULL when saturated (never silently
    wrong). All md5-derived integer arithmetic — unlike HLL sketches
    (engine-private bytes), the sketch AND the estimate reproduce
    exactly in DuckDB."""
    m = 62 * int(n_blocks)
    bits = bitmap.agg(
        F.coalesce(F.sum(F.bit_count("mask")), F.lit(0)).alias("set_bits")
    )
    zero = F.lit(m) - F.col("set_bits")
    return bits.select(
        F.lit(m).cast("long").alias("m_bits"),
        F.col("set_bits").cast("long"),
        zero.cast("long").alias("zero_bits"),
        F.when(zero <= 0, F.lit(None).cast("long"))  # saturated: undefined
        .otherwise(F.round(-F.lit(float(m)) * F.log(zero / F.lit(float(m)))).cast("long"))
        .alias("estimate"),
    )


def linear_count_distinct(
    df: DataFrame,
    key_col: str,
    n_blocks: int = 4096,
    seed: str = "swarm-lc",
) -> DataFrame:
    """One-row linear-counting distinct estimate of ``key_col`` —
    :func:`linear_count_bitmap` + :func:`linear_count_estimate` in one
    call (see those for the scale/determinism contract)."""
    return linear_count_estimate(
        linear_count_bitmap(df, key_col, n_blocks, seed), n_blocks
    )


def incremental_dup_flags(
    new_df: DataFrame,
    corpus_df: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    fp_n: int = 5,
    *,
    new_digests: DataFrame | None = None,
    corpus_digests: DataFrame | None = None,
) -> DataFrame:
    """Flag documents in a NEW batch that duplicate an EXISTING corpus
    — the every-crawl-cycle operation: dedup the increment against the
    accumulated corpus without re-deduplicating the corpus itself.

    Two levels, both slim equi-joins:

    - ``exact_dup``: the new doc's md5 content digest exists in the
      corpus (byte-identical duplicate);
    - ``fp_dup``: the new doc's winnowing fingerprint exists in the
      corpus (shares its rarest window — near-duplicate at
      boilerplate/suffix-edit level).

    Scale shape: ONE text scan per side (:func:`content_digests`
    computes both digests in a single pass; the digest frames are
    persisted for their two consumers), then only (id, 32-hex-digest)
    pairs shuffle — the text never moves through a join. In a real
    deployment the corpus side is the pre-materialized digest table,
    so each increment costs one scan of the increment plus two
    digest-keyed semi-joins — pass it via ``corpus_digests`` (and/or
    ``new_digests``) to skip the scan entirely; digest frames the
    caller supplies are never persisted or unpersisted here.

    Cache lifecycle: digest frames computed internally are persisted
    for their multiple consumers, the slim result (doc_id + 2 bools)
    is materialized eagerly via ``localCheckpoint``, and the digest
    caches are dropped before returning — repeated calls leave no
    CacheManager residue (the checkpoint blocks are freed when the
    returned frame is garbage-collected).
    """
    own_nd = new_digests is None
    own_cd = corpus_digests is None
    nd = (
        content_digests(new_df, text_col, id_col, fp_n).persist()
        if own_nd
        else new_digests
    )
    cd = (
        content_digests(corpus_df, text_col, id_col, fp_n).persist()
        if own_cd
        else corpus_digests
    )
    exact = (
        nd.select("doc_id", "h")
        .join(cd.select("h").distinct(), "h", "left_semi")
        .select("doc_id")
        .withColumn("e", F.lit(True))
    )
    near = (
        nd.where(F.col("fp").isNotNull())
        .select("doc_id", "fp")
        .join(cd.select("fp").where(F.col("fp").isNotNull()).distinct(), "fp", "left_semi")
        .select("doc_id")
        .withColumn("f", F.lit(True))
    )
    out = (
        nd.select("doc_id")
        .join(exact, "doc_id", "left")
        .join(near, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("e", F.lit(False)).alias("exact_dup"),
            F.coalesce("f", F.lit(False)).alias("fp_dup"),
        )
    )
    if own_nd or own_cd:
        out = out.localCheckpoint(eager=True)
        if own_nd:
            nd.unpersist()
        if own_cd:
            cd.unpersist()
    return out


# ------------------------------------------------------ decontamination
def decontaminate(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    word ``n``-gram with an evaluation set (the standard guard against
    test-set leakage — GPT-3 used 13-gram overlap; the principle is
    identical at any n).

    Scale shape: both sides reduce to (id, md5(shingle)) — the only
    wide stage joins 32-hex keys, never text; the benchmark side is
    distinct-deduped first and is typically small enough that AQE
    broadcasts it, making the scan over the training corpus the only
    big input. Same DF-prunable shingle frame as the dedup tier.

    Output: (doc_id, n_hits, contaminated) for EVERY input doc —
    n_hits = number of distinct leaked n-grams, 0 = clean.
    """
    doc_sh = doc_shingles(df, text_col, id_col, n).select(
        "doc_id", F.md5("sh").alias("h")
    )
    bench_sh = (
        doc_shingles(benchmark, text_col, id_col, n)
        .select(F.md5("sh").alias("h"))
        .distinct()
    )
    hits = (
        doc_sh.join(bench_sh, "h")
        .groupBy("doc_id")
        .agg(F.countDistinct("h").alias("n_hits"))
    )
    ids = df.select(F.col(id_col).alias("doc_id"))
    return (
        ids.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def dup_ngram_coverage(
    df: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document duplicate-shingle coverage — the RefinedWeb-style
    "how much of this doc is shared text" signal: for each doc, the
    fraction of its DISTINCT n-gram shingles whose corpus document
    frequency exceeds 1. Output (doc_id, n_shingles, n_dup, dup_frac),
    dup_frac rounded to 6 digits.

    Scale shape: one doc_shingles frame feeds BOTH the per-shingle DF
    aggregate and the per-doc rollup (the same canonical subtree, so
    the exchange is reused); all counts are integral, the only float is
    the final ratio. No window, no self-join — shuffle ∝ distinct
    shingles.
    """
    sh = doc_shingles(df, text_col=text_col, id_col=id_col, n=n)
    dfreq = sh.groupBy("sh").agg(F.count(F.lit(1)).cast("long").alias("dfreq"))
    return (
        sh.join(dfreq, "sh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum((F.col("dfreq") > 1).cast("long")).cast("long").alias("n_dup"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_dup",
            F.round(F.col("n_dup") / F.col("n_shingles"), 6).alias("dup_frac"),
        )
        .orderBy("doc_id")
    )


def split_leakage(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: str = "swarm-split",
) -> DataFrame:
    """Train/val/test leakage audit: exact-duplicate texts whose copies
    land in DIFFERENT splits (the deterministic split_column assignment)
    leak eval data into training. Output one row per leaking content
    digest: (digest, n_docs, n_splits, splits) with splits a sorted
    comma-joined list.

    Scale shape: one digest groupBy (map-side combined; set aggregation
    is bounded by the 3 split labels), then a post-aggregation filter —
    shuffle ∝ distinct digests, never a self-join.
    """
    from .sampling import split_column

    labeled = df.select(
        F.md5(F.col(text_col)).alias("digest"),
        split_column(id_col, seed=seed).alias("split"),
    )
    return (
        labeled.groupBy("digest")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.size(F.collect_set("split")).cast("long").alias("n_splits"),
            F.array_join(F.array_sort(F.collect_set("split")), ",").alias("splits"),
        )
        .where(F.col("n_splits") > 1)
        .orderBy("digest")
    )


def ngram_containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.9,
    max_df: int | None = None,
) -> DataFrame:
    """Asymmetric containment over word n-gram shingle sets: pairs
    where EITHER doc's shingles are ≥ ``threshold`` contained in the
    intersection (inter/|A| or inter/|B|) — catches subset duplicates
    (a doc quoted whole inside a larger one) that symmetric Jaccard
    misses at any threshold.

    Same candidate-bounded shape as :func:`ngram_jaccard_pairs` (shared
    shingle self-join, sizes re-attached after the pair aggregation,
    ``max_df`` pruning bounds skew); only the final filter differs.
    Output (doc_a, doc_b, inter, na, nb, cont_a, cont_b), containments
    rounded to 6 digits.
    """
    s = doc_shingles(df, text_col, id_col, n)
    if max_df is not None:
        s = prune_by_df(s, max_df)
    sizes = s.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = s.alias("a")
    b = s.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    ca = F.round(F.col("inter") / F.col("na"), 6)
    cb = F.round(F.col("inter") / F.col("nb"), 6)
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", "inter", "na", "nb",
                ca.alias("cont_a"), cb.alias("cont_b"))
        .where((F.col("cont_a") >= threshold) | (F.col("cont_b") >= threshold))
        .orderBy("doc_a", "doc_b")
    )


def winnow_pairs(
    df: DataFrame,
    k: int = 3,
    w: int = 4,
    min_shared: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int | None = None,
) -> DataFrame:
    """Winnowing candidate pairs: documents sharing ≥ ``min_shared``
    selected fingerprints (ops.text.winnow_fingerprints). Because
    winnowing guarantees any shared token run of ≥ w+k-1 length shares
    a fingerprint, this is the MOSS-style local-overlap detector at
    ~2/(w+1) of the full shingle-join cost.

    Same candidate-bounding discipline as the shingle joins: ``max_df``
    DF-prunes ubiquitous fingerprints before the self-join (at 100 TB
    always set it). Output (doc_a, doc_b, shared_fp), doc_a < doc_b.
    """
    from .text import winnow_fingerprints

    fp = winnow_fingerprints(df, k=k, w=w, text_col=text_col, id_col=id_col)
    if max_df is not None:
        fp = prune_by_df(fp.select("doc_id", F.col("fp").alias("sh")), max_df).select(
            "doc_id", F.col("sh").alias("fp")
        )
    a = fp.alias("a")
    b = fp.alias("b")
    return (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("shared_fp"))
        .where(F.col("shared_fp") >= min_shared)
        .orderBy("doc_a", "doc_b")
    )


def minhash_incremental_pairs(
    corpus: DataFrame,
    increment: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_perm: int = 12,
    bands: int = 4,
    max_df: int | None = None,
) -> DataFrame:
    """Directional MinHash/LSH: near-dup candidates between a NEW batch
    and the existing corpus only — the production shape at 100 TB,
    where each ingest wave is deduped against history without ever
    re-running the corpus self-join. Candidate volume is bounded by the
    increment's band keys (∝ |increment|·bands), not the corpus pair
    space.

    Signatures are per-document (each side's own shingles), so stored
    corpus signatures can be reused verbatim across waves; ``max_df``
    prunes each side's shingle frame independently (set it in
    production). Output (inc_id, corpus_id, shared_bands, est_jaccard).
    """
    if num_perm % bands:
        raise ValueError("num_perm must be divisible by bands")
    r = num_perm // bands
    sig_c = minhash_signatures(corpus, text_col, id_col, n, num_perm, max_df)
    sig_i = minhash_signatures(increment, text_col, id_col, n, num_perm, max_df)

    def banded(sigs: DataFrame, idname: str, signame: str) -> DataFrame:
        return sigs.select(
            F.col("doc_id").alias(idname),
            F.col("sigs").alias(signame),
            F.posexplode(
                F.array(
                    *[
                        F.md5(F.concat_ws("|", F.slice("sigs", b * r + 1, r)))
                        for b in range(bands)
                    ]
                )
            ).alias("band", "key"),
        )

    a = banded(sig_i, "inc_id", "sa")
    b = banded(sig_c, "corpus_id", "sb")
    pairs = (
        a.join(b, ["band", "key"])
        .where(F.col("inc_id") != F.col("corpus_id"))
        .groupBy("inc_id", "corpus_id")
        .agg(
            F.countDistinct("band").cast("long").alias("shared_bands"),
            F.first("sa").alias("sa"),
            F.first("sb").alias("sb"),
        )
    )
    est = F.size(
        F.filter(F.zip_with("sa", "sb", lambda x, y: x == y), lambda e: e)
    ) / float(num_perm)
    return pairs.select(
        "inc_id", "corpus_id", "shared_bands", F.round(est, 6).alias("est_jaccard")
    ).orderBy("inc_id", "corpus_id")


def simhash_incremental_pairs(
    corpus: DataFrame,
    increment: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 62,
    max_hamming: int = 3,
) -> DataFrame:
    """Directional SimHash near-dup: each NEW document's Manku block
    keys probe the corpus's — the wave-vs-corpus form of
    :func:`simhash_pairs_blocked`, with the same EXACT (pigeonhole,
    non-probabilistic) recall. Stored corpus sketches are reusable
    across waves; candidates are bounded by the increment's block
    keys. Output (inc_id, corpus_id, hamming).
    """
    nblocks = max_hamming + 1
    width = (bits + nblocks - 1) // nblocks
    mask = (1 << width) - 1

    def keyed(frame: DataFrame, idname: str, shname: str) -> DataFrame:
        s = simhash(frame, text_col, id_col, bits)
        return s.select(
            F.col("doc_id").alias(idname),
            F.col("simhash").alias(shname),
            F.posexplode(
                F.array(
                    *[
                        F.shiftright("simhash", b * width).bitwiseAND(F.lit(mask))
                        for b in range(nblocks)
                    ]
                )
            ).alias("blk", "val"),
        )

    a = keyed(increment, "inc_id", "sa")
    b = keyed(corpus, "corpus_id", "sb")
    ham = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return (
        a.join(b, ["blk", "val"])
        .where(F.col("inc_id") != F.col("corpus_id"))
        .select("inc_id", "corpus_id", ham.cast("long").alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .distinct()
        .orderBy("inc_id", "corpus_id")
    )


def lsh_tune(
    threshold: float,
    num_perm: int,
    fn_weight: float = 0.5,
    grid: int = 200,
) -> tuple[int, int]:
    """Pick (bands, rows_per_band) for MinHash-LSH at a target Jaccard
    ``threshold`` — the standard S-curve optimization (public
    technique; Leskovec–Rajaraman–Ullman, *Mining of Massive
    Datasets* §3.4): candidate probability at similarity s is
    P(s) = 1 − (1 − s^r)^b, and the best (b, r) with b·r ≤ num_perm
    minimizes the weighted false-positive area below the threshold
    plus the false-negative area above it (midpoint rule on a fixed
    ``grid`` — deterministic, no RNG).

    ``fn_weight`` > 0.5 biases toward recall (costlier to MISS a
    duplicate than to verify a candidate — the usual dedup economics
    since candidates get verified exactly anyway).

    Returns (bands, rows_per_band) with bands · rows == a divisor-
    aligned budget ≤ num_perm, ready for :func:`minhash_lsh_pairs`
    (pass ``num_perm=bands*rows``).
    """
    if not 0.0 < threshold < 1.0:
        raise ValueError(f"threshold must be in (0, 1), got {threshold}")
    if num_perm < 2:
        raise ValueError(f"num_perm must be >= 2, got {num_perm}")
    if not 0.0 <= fn_weight <= 1.0:
        raise ValueError(f"fn_weight must be in [0, 1], got {fn_weight}")
    fp_w = 1.0 - fn_weight
    best: tuple[float, int, int] | None = None
    for r in range(1, num_perm + 1):
        b = num_perm // r
        if b < 1:
            break
        step = 1.0 / grid
        fp = fn = 0.0
        for i in range(grid):
            s = (i + 0.5) * step
            p = 1.0 - (1.0 - s**r) ** b
            if s < threshold:
                fp += p * step
            else:
                fn += (1.0 - p) * step
        cost = fp_w * fp + fn_weight * fn
        # strict < keeps the first (smallest r) optimum: deterministic
        if best is None or cost < best[0] - 1e-12:
            best = (cost, b, r)
    assert best is not None
    return best[1], best[2]
