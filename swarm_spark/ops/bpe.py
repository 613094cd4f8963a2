"""Deterministic byte-pair-encoding subword tokenizer (train + encode).

Every token-based operator in this repo (``token_stats``, the packing
tier, BM25 dl) counts WHITESPACE tokens — a proxy. A training-data
pipeline budgets in subword tokens; this module supplies them with the
classical BPE of Sennrich, Haddow & Birch 2016 ("Neural Machine
Translation of Rare Words with Subword Units"), constrained to stay
integer/string-deterministic so training AND encoding value-oracle in
SQL (no engine-private tokenizer state):

- **Train** (:func:`bpe_train`): iterate ``n_merges`` rounds over the
  WORD HISTOGRAM (word, count) — each round one vocab-sized groupBy
  over adjacent-symbol pairs weighted by word count, pick the most
  frequent pair (ties: lexicographically smallest (a, b) — the
  determinism contract), merge it left-to-right in every word's
  segmentation. The merge table is ≤ n_merges rows — a persistable
  model like the NB quality scorer.
- **Encode** (:func:`bpe_encode_words`): apply the merge table in rank
  order, one left-to-right non-overlapping pass per merge (a merged
  symbol is strictly longer than its left part, so a pass can never
  re-trigger its own pair — single pass per rank is exact).
- **Count** (:func:`bpe_token_counts`): per-document subword totals by
  encoding each DISTINCT word once and joining back through the
  per-doc word counts — the corpus is never re-segmented row by row.

Everything is built-in column arithmetic (``aggregate`` folds over
token arrays — whole-stage codegen'd, no Python UDF); the driver sees
only the ≤ n_merges best-pair rows (one metadata-sized action per
round, like the PQ subspace means).

Scale shape at 100 TB: the word histogram is ONE map-side-combined
shuffle of the corpus (vocab-sized output — the only corpus-sized
step); each training round then touches the HISTOGRAM only (vocab-
sized aggregations, ``localCheckpoint`` per round to keep the plan
flat); encoding joins the corpus's distinct words against the
vocab-sized segmentation map. No per-row Python, no corpus-sized
driver traffic.

End-of-word markers are intentionally omitted: segmentations are per
word (subwords never cross word boundaries), so the marker would only
rename the last symbol.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens_col

# 61-bit symbol bloom over a segmentation: one OR'd crc32 bit per
# symbol, folded in codegen (no Python). 61 keeps every bit strictly
# inside a positive long; zlib.crc32 computes the identical bit
# driver-side (both are CRC-32/ADCCP), so batch masks need no action.
_MSK_EXPR = (
    "aggregate(seg, 0L, (acc, x) -> "
    "acc | shiftleft(1L, int(crc32(encode(x, 'utf-8')) % 61)))"
)


def segment_chars(word: Column | str) -> Column:
    """array<string> of the word's single characters — the round-0
    segmentation. Callers must filter zero-length words first
    (sequence(1, 0) would run descending)."""
    w = F.col(word) if isinstance(word, str) else word
    return F.transform(
        F.sequence(F.lit(1), F.length(w)), lambda i: F.substring(w, i, F.lit(1))
    )


def bpe_merge_pass(seg: Column, a: str, b: str) -> Column:
    """One left-to-right non-overlapping merge of adjacent (a, b) →
    a||b over a segmentation array — the exact BPE application rule
    ('a a a' under (a, a) becomes ['aa', 'a']). A codegen'd aggregate
    fold: the merged symbol a||b is strictly longer than a, so a fold
    step can never treat its own output as a fresh left operand of the
    same pair — fold == scan."""
    if not a or not b:
        raise ValueError("merge symbols must be non-empty")
    return F.aggregate(
        seg,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(a + b))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_merge_pass_multi(seg: Column, pairs: list[tuple[str, str]]) -> Column:
    """One left-to-right pass applying a BATCH of symbol-disjoint
    merges simultaneously — constant expression depth however large
    the batch (two literal maps + one fold), where chaining
    :func:`bpe_merge_pass` per merge would nest one aggregate per
    pair. Correctness needs the :func:`_select_merge_batch`
    disjointness contract: no symbol (nor any merged symbol a||b)
    appears in two batch pairs, so each fold step can consult the
    left-symbol map unambiguously and a merge output can never
    trigger another batch pair."""
    if not pairs:
        raise ValueError("empty merge batch")
    for a, b in pairs:
        if not a or not b:
            raise ValueError("merge symbols must be non-empty")
    mb = F.create_map(*[x for a, b in pairs for x in (F.lit(a), F.lit(b))])
    mab = F.create_map(*[x for a, b in pairs for x in (F.lit(a), F.lit(a + b))])
    return F.aggregate(
        seg,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(mb, F.element_at(acc, -1)) == x),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.element_at(mab, F.element_at(acc, -1))),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _select_merge_batch(
    top: list, limit: int, min_count: int, window_truncated: bool = False
) -> list[tuple[str, str]]:
    """Pick the maximal batch of merges provably IDENTICAL to serial
    rounds, from this round's pair table sorted by (count desc, a, b)
    — the classical non-interacting-merge speedup, made exact:

    - Walk the sorted prefix, selecting pairs while every selected
      pair is symbol-DISJOINT from all earlier selections — including
      their merged symbols a||b (a new ``ab`` colliding with an
      existing ``ab`` symbol would let one batch merge mint
      occurrences of another).
    - Stop at the first interacting (or sub-``min_count``) pair; its
      count is the STOP COUNT. A selected SELF-pair (a, a) also
      terminates the batch (its minted pairs are bounded by its own
      count, not the stop count — see the inline note), with the next
      sorted pair as the stop. Running off a TRUNCATED scan window
      uses the window tail's count (unseen pairs tie it at worst);
      off the full table, every selection stands. Truncate the
      selection to pairs with count STRICTLY above the stop count,
      then slice to ``limit`` (a prefix cut — still serial-equal).

    Why this equals serial: batch pairs are a sorted prefix, so at
    step i every unselected original pair orders after p_i and its
    count can only have decreased. Disjointness keeps each batch
    pair's own count unchanged while earlier batch merges apply. Any
    NEW pair minted by a batch merge borrows an adjacency from a
    context pair sharing a symbol with the batch — a pair that sorts
    at/after the stop pair, so its count <= stop count < c(p_i):
    serial's argmax at step i is exactly p_i. Ties inside the batch
    keep the sorted order; a tie WITH the stop pair is truncated away
    (strictness is what shuts out the lex-order edge cases). When
    truncation empties the batch, the round degenerates to the plain
    serial step [p_1] — always valid.
    """
    sel: list[tuple[str, str, int]] = []
    blocked: set[str] = set()
    stop = None
    for i, (a, b, c) in enumerate(top):
        if c < min_count or {a, b, a + b} & blocked:
            stop = c
            break
        sel.append((a, b, c))
        blocked.update((a, b, a + b))
        if a == b:
            # a SELF-pair (a,a) mints pairs around its own merged
            # symbol ((a,aa)/(aa,a)/(aa,aa)) whose counts are bounded
            # by ITS OWN count, not by the stop pair's — they can beat
            # any later batch element (serial would pick them next).
            # Terminate the batch here; the next sorted pair supplies
            # the stop count for the ordinary strict truncation.
            if i + 1 < len(top):
                stop = top[i + 1][2]
            break
    if stop is None:
        # ran off the scanned window: if the window held the WHOLE
        # pair table nothing is left to interact (stop below every
        # count); otherwise unseen pairs tie the window tail at worst
        stop = (min_count - 1) if not window_truncated else (
            top[-1][2] if top else min_count - 1
        )
    batch = [(a, b) for a, b, c in sel if c > stop]
    if not batch and top and top[0][2] >= min_count:
        batch = [(top[0][0], top[0][1])]  # serial fallback on a head tie
    return batch[:limit] if limit > 0 else batch


def bpe_word_histogram(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt): the corpus word histogram BPE trains on — one
    map-side-combined shuffle, vocab-sized output (training never
    rescans the corpus). Zero-length split artifacts are dropped."""
    return (
        df.select(F.explode(tokens_col(text_col)).alias("word"))
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def _train_histogram_py(
    words: list[str],
    cnts: list[int],
    n_merges: int,
    min_count: int,
) -> tuple[list[tuple[str, str]], list[list[str]]]:
    """The whole merge loop over an in-memory (word, cnt) histogram —
    the classical incremental BPE trainer (Sennrich et al. 2016's
    released reference keeps exactly these structures): a pair→count
    table, a pair→{word index} occurrence index, and a lazy-deletion
    heap. Each merge touches ONLY the words containing the winning
    pair; a stale heap head is re-pushed with its current count, so
    the first VALID pop is the true maximum. Ordering on the heap is
    (-count, (a, b)): count descending, ties by lexicographically
    smallest pair — bit-for-bit the distributed rounds' argmax rule,
    which the equivalence test pins.

    Pure function of the multiset of (word, cnt) rows: counts are
    summed and ties broken on pair values only, so partition order
    cannot leak into the result."""
    import heapq
    from collections import defaultdict

    segs = [list(w) for w in words]
    stats: dict[tuple[str, str], int] = defaultdict(int)
    where: dict[tuple[str, str], set[int]] = defaultdict(set)
    for idx, (seg, c) in enumerate(zip(segs, cnts)):
        for p in zip(seg, seg[1:]):
            stats[p] += c
            where[p].add(idx)
    heap = [(-n, p) for p, n in stats.items()]
    heapq.heapify(heap)
    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges and heap:
        neg, pair = heapq.heappop(heap)
        cur = stats.get(pair, 0)
        if cur != -neg:
            # stale entry: re-enter at the current count and retry
            if cur > 0:
                heapq.heappush(heap, (-cur, pair))
            continue
        if cur < min_count:
            break
        a, b = pair
        merges.append(pair)
        ab = a + b
        touched: set[tuple[str, str]] = set()
        for idx in where[pair].copy():
            seg, c = segs[idx], cnts[idx]
            for p in zip(seg, seg[1:]):
                stats[p] -= c
                where[p].discard(idx)
                touched.add(p)
            # one left-to-right non-overlapping pass — the exact
            # semantics of bpe_merge_pass's fold
            out: list[str] = []
            i = 0
            while i < len(seg):
                if i + 1 < len(seg) and seg[i] == a and seg[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(seg[i])
                    i += 1
            segs[idx] = out
            for p in zip(out, out[1:]):
                stats[p] += c
                where[p].add(idx)
                touched.add(p)
        for p in touched:
            if stats.get(p, 0) > 0:
                heapq.heappush(heap, (-stats[p], p))
    return merges, segs


def _bpe_train_local_frame(
    words: DataFrame, n_merges: int, min_count: int
) -> DataFrame:
    """Run :func:`_train_histogram_py` in ONE executor-side
    ``applyInPandas`` group over the vocab-sized histogram, returning a
    tagged union frame: model rows (rank, a, b — ``word IS NULL``) +
    trained segmentation rows (word, cnt, seg — ``rank IS NULL``).
    The histogram never visits the driver; only the ≤ n_merges model
    rows do (the same metadata contract as the distributed rounds'
    per-round argmax)."""

    def _fn(pdf):
        import pandas as pd

        ws = pdf["word"].tolist()
        cs = [int(c) for c in pdf["cnt"].tolist()]
        merges, segs = _train_histogram_py(ws, cs, n_merges, min_count)
        model = pd.DataFrame(
            {
                "word": pd.Series([None] * len(merges), dtype="object"),
                "cnt": pd.Series([None] * len(merges), dtype="object"),
                "seg": pd.Series([None] * len(merges), dtype="object"),
                "rank": pd.Series(range(len(merges)), dtype="int64"),
                "a": [a for a, _ in merges],
                "b": [b for _, b in merges],
            }
        )
        seg = pd.DataFrame(
            {
                "word": ws,
                "cnt": pd.Series(cs, dtype="int64"),
                "seg": segs,
                "rank": pd.Series([None] * len(ws), dtype="object"),
                "a": pd.Series([None] * len(ws), dtype="object"),
                "b": pd.Series([None] * len(ws), dtype="object"),
            }
        )
        return pd.concat([model, seg], ignore_index=True)

    return (
        words.select("word", F.col("cnt").cast("long").alias("cnt"))
        .groupBy(F.lit(1).alias("__g"))
        .applyInPandas(
            _fn,
            "word string, cnt long, seg array<string>, "
            "rank long, a string, b string",
        )
    )


# One Arrow group holds the whole histogram on the local path: ~2M
# distinct words x ~20 chars stays well under both executor memory and
# Arrow's per-batch limits (the pack_greedy_bins auto-sizing bound).
BPE_LOCAL_MAX_WORDS = 2_000_000


def bpe_train(
    words: DataFrame,
    n_merges: int,
    min_count: int = 1,
    local_max_words: int | None = BPE_LOCAL_MAX_WORDS,
    max_batch_merges: int = 256,
    stats_out: dict | None = None,
    pair_maintenance: str = "incremental",
    seg_maintenance: str = "overlay",
    overlay_compact_rows: int = 1_000_000,
    overlay_compact_depth: int = 16,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """(merges, seg): train ``n_merges`` BPE merge rounds over a
    (word, cnt) histogram. Stops early when no pair reaches
    ``min_count``.

    Two equivalent paths (equivalence-pinned by
    ``tests/test_bpe.py::test_local_trainer_equals_distributed``):

    - **histogram-local** (the default whenever the histogram holds at
      most ``local_max_words`` rows — one cheap vocab-sized count): the
      ENTIRE merge loop runs in one executor-side ``applyInPandas``
      group with the classical incremental pair index, so a
      production-sized vocab (10k-50k merges) costs ONE Spark job
      instead of 10k+ sequential driver rounds — the driver round-trip
      was the scale ceiling, each round being cheap but serial.
    - **batched distributed rounds** (above the bound, or
      ``local_max_words=None`` — the 100-TB vocabulary path, r11
      VERDICT #2): one vocab-sized adjacent-pair aggregation per
      round, then up to ``max_batch_merges`` NON-INTERACTING merges
      selected from the sorted head and applied in ONE constant-depth
      fold pass (:func:`_select_merge_batch` /
      :func:`bpe_merge_pass_multi` — provably bit-identical to serial
      rounds, the classical batching speedup made exact). A Zipf pair
      spectrum batches tens-to-hundreds of merges per round, so 10k
      merges cost ~dozens of distributed rounds instead of 10k serial
      driver round-trips. ``max_batch_merges=1`` recovers the plain
      serial rounds (the equivalence tests' referee).

    Returns the ordered merge list (the model — persist with
    :func:`save_bpe`) and the trained segmentation frame
    (word, cnt, seg) — the training corpus's words are already encoded,
    so counting/packing over the SAME corpus needs no re-encoding.
    ``stats_out`` (a dict, mutated in place) records ``rounds`` — the
    number of distributed rounds actually run (1 on the local path) —
    for scale probes reporting the batching rounds-reduction.

    ``pair_maintenance``: ``"incremental"`` (default) keeps the pair
    table as a maintained frame — built once from the full adjacent-
    pair explode, then per round updated with the DELTA of the touched
    words only (old multiset negative, post-pass multiset positive; a
    word is touched iff it holds a batch-pair adjacency, the identity
    of the pass everywhere else makes the delta exact). The per-round
    shuffle then follows the touched words + the pair table instead of
    re-exploding every segmentation. ``"recount"`` re-aggregates from
    scratch each round — the referee the equivalence test pins the
    incremental ledger against.

    ``seg_maintenance``: ``"overlay"`` (default) applies the
    incremental-ledger idea to the SEGMENTATION FRAME itself (r12
    VERDICT #1 — the per-round floor was the full-frame rewrite):
    the base frame is checkpointed ONCE and stays immutable; words a
    merge has touched since the last compaction live in a small
    OVERLAY frame (latest seg wins), and each round rewrites only the
    overlay. The view is ``base.where(NOT stale) ∪ overlay`` where
    staleness is a PREDICATE over the immutable base seg (a word's
    first touch happens while current seg == base seg, so "some
    batch-since-compaction's adjacency map matches the base seg" is
    exact) — zero joins, zero broadcasts, one map-side base scan per
    round. The per-round materialization is the touched-word frame +
    the overlay instead of every row of a 5M-type histogram. The
    overlay COMPACTS into a fresh base checkpoint when it outgrows
    ``overlay_compact_rows`` (bounds the per-round overlay rewrite)
    or when ``overlay_compact_depth`` batches have stacked onto the
    stale predicate (each base scan evaluates the whole stack, so
    unbounded depth would turn the view scan quadratic across
    rounds); the full-frame write is then paid once per stride, not
    every round. The base scan itself is PRUNED two ways (r13
    VERDICT #1 — the remaining per-round floor was evaluating the
    stack on every row): batch pairs whose symbols were minted after
    the last compaction are dropped from the base-side predicates
    (frozen base segs cannot contain them — driver-side set test),
    and base rows carry a 61-bit crc32 symbol bloom (``msk``,
    recomputed per compaction) so only rows holding BOTH symbols'
    bits of some live pair run the adjacency fold. Both prunes are
    sound supersets — results stay bit-identical to ``"rewrite"``,
    the old full-frame-per-round behavior kept as the equivalence
    referee."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    if max_batch_merges < 1:
        raise ValueError(f"max_batch_merges must be >= 1, got {max_batch_merges}")
    if pair_maintenance not in ("incremental", "recount"):
        raise ValueError(f"unknown pair_maintenance: {pair_maintenance!r}")
    if seg_maintenance not in ("overlay", "rewrite"):
        raise ValueError(f"unknown seg_maintenance: {seg_maintenance!r}")
    if overlay_compact_rows < 1:
        raise ValueError(
            f"overlay_compact_rows must be >= 1, got {overlay_compact_rows}"
        )
    if overlay_compact_depth < 1:
        raise ValueError(
            f"overlay_compact_depth must be >= 1, got {overlay_compact_depth}"
        )
    if local_max_words is not None and words.count() <= local_max_words:
        frame = _bpe_train_local_frame(
            words, n_merges, min_count
        ).localCheckpoint()
        merges = [
            (r["a"], r["b"])
            for r in frame.where(F.col("rank").isNotNull())
            .orderBy("rank")
            .select("a", "b")
            .collect()
        ]
        seg = frame.where(F.col("rank").isNull()).select("word", "cnt", "seg")
        if stats_out is not None:
            stats_out["rounds"] = 1
        return merges, seg
    base = words.select(
        "word", F.col("cnt").cast("long").alias("cnt"),
        segment_chars("word").alias("seg"),
    )
    if seg_maintenance == "overlay":
        base = base.withColumn("msk", F.expr(_MSK_EXPR))
    base = base.localCheckpoint()
    merges: list[tuple[str, str]] = []
    pair_structs = F.expr(
        "transform(sequence(0, size(seg) - 2), i -> struct(seg[i] AS a, seg[i+1] AS b))"
    )

    def _pairs_of(frame):
        return (
            frame.where(F.size("seg") >= 2)
            .select("cnt", F.explode(pair_structs).alias("p"))
            .groupBy("p.a", "p.b")
            .agg(F.sum("cnt").cast("long").alias("n"))
        )

    incremental = pair_maintenance == "incremental"
    overlay = seg_maintenance == "overlay"

    def _adj_any(maps: list) -> Column:
        """TRUE iff the segmentation holds an adjacency of ANY of the
        given batch maps — one pass over the array however many maps
        (each position ORs the per-batch lookups). Null-SAFE compare:
        element_at misses yield NULL, and a NULL verdict under ``~``
        would silently DROP fresh rows from the filtered view."""

        def hit(s):
            c = None
            for m in maps:
                e = F.element_at(m, F.element_at("seg", s)).eqNullSafe(
                    F.element_at("seg", s + 1)
                )
                c = e if c is None else (c | e)
            return c

        return F.when(
            F.size("seg") >= 2,
            F.exists(F.sequence(F.lit(1), F.size("seg") - 1), hit),
        ).otherwise(F.lit(False))

    # overlay state: `base` is an immutable checkpoint; `ovl` holds the
    # CURRENT segmentation of every word a merge has ever touched since
    # the last compaction (latest wins). A base row is served only
    # while FRESH, and freshness is a PREDICATE, not a join: a word's
    # first touch happens while its current seg still equals its base
    # seg, so "stale" == "some batch-since-compaction's adjacency map
    # matches the base seg" — exact, and evaluated map-side with zero
    # shuffles/broadcasts (the r13 first cut anti-joined a broadcast
    # overlay word set: collecting+shipping ~1M words per round cost
    # more than the full rewrite it replaced, measured 13.8 s/round).
    # Every overlay checkpoint is COALESCED to a bounded partition
    # count: the union shapes otherwise ADD partition counts each
    # round — exponential task explosion by round ~10 (8k empty tasks
    # per stage, measured).
    #
    # r13 VERDICT #1 (the remaining per-round floor): the one base
    # scan evaluated the full stale-predicate stack on EVERY row —
    # 5M seg-array folds per round even when a tail batch could only
    # ever touch a handful of words. Two sound prunes cut that work:
    #
    # - **eligibility**: base segs are FROZEN at compaction, so a
    #   batch pair whose symbol was created by a post-compaction
    #   merge can NEVER match a base seg — those pairs are dropped
    #   from the base-side predicate stack entirely (driver-side set
    #   test: a symbol can be in the base iff it is a single char or
    #   a merged symbol minted before the last compaction). Tail
    #   batches merge mostly freshly-minted symbols, so their
    #   base-side maps often empty out.
    # - **per-row symbol bloom**: base rows carry `msk`, a 61-bit
    #   OR-fold of crc32(symbol) bits computed once per compaction
    #   (codegen'd SQL fold — no Python). A pair (a, b) can match a
    #   row only if BOTH symbols' bits are present, so the expensive
    #   adjacency fold runs under a `when(bloom_hit, ...)` guard:
    #   rows without the bits short-circuit to two long-compares.
    #   Python's zlib.crc32 == Spark's crc32 (both CRC-32/ADCCP), so
    #   the driver computes batch masks with no extra action. False
    #   positives only cost the fold they would have run anyway;
    #   false negatives are impossible (exact OR of exact bits).
    ovl: DataFrame | None = None
    # base-side stale stack: per stacked batch, the base-ELIGIBLE
    # pairs (see above); empty entries stack nothing
    stale_pairs: list[list[tuple[str, str]]] = []
    base_minted: set[str] = set()  # merged symbols minted pre-compaction
    n_small = words.sparkSession.sparkContext.defaultParallelism
    n_base = max(base.rdd.getNumPartitions(), n_small)

    def _bit(sym: str) -> int:
        import zlib

        return 1 << (zlib.crc32(sym.encode("utf-8")) % 61)

    def _eligible(sym: str) -> bool:
        return len(sym) == 1 or sym in base_minted

    def _bloom_pre(pairs: list[tuple[str, str]]) -> Column:
        """Necessary condition for a base row to hold ANY of the
        pairs' adjacencies, from `msk` alone. Small pair sets get the
        exact per-pair both-bits test (literal long array, one scan);
        large sets (merge-head batches, where most rows match anyway)
        collapse to the two-mask coarse test."""
        masks = sorted({_bit(a) | _bit(b) for a, b in pairs})
        if len(masks) > 64:
            am = 0
            bm = 0
            for a, b in pairs:
                am |= _bit(a)
                bm |= _bit(b)
            return (F.col("msk").bitwiseAND(F.lit(am)) != 0) & (
                F.col("msk").bitwiseAND(F.lit(bm)) != 0
            )
        arr = ",".join(f"{m}L" for m in masks)
        return F.expr(f"exists(array({arr}), m -> (msk & m) = m)")

    def _map_of(pairs: list[tuple[str, str]]) -> Column:
        return F.create_map(
            *[x for a, b in pairs for x in (F.lit(a), F.lit(b))]
        )

    def _base_fresh() -> Column:
        """TRUE while the base row's seg is still current: no stacked
        batch's base-eligible adjacency matches it. Bloom-guarded —
        rows lacking the pair bits never run the fold."""
        live = [p for p in stale_pairs if p]
        if not live:
            return F.lit(True)
        stale = F.when(
            _bloom_pre([pr for p in live for pr in p]),
            _adj_any([_map_of(p) for p in live]),
        ).otherwise(F.lit(False))
        return ~stale

    def _view() -> DataFrame:
        if ovl is None:
            return base.drop("msk")
        return (
            base.where(_base_fresh())
            .drop("msk")
            .unionByName(ovl.drop("msk"))
        )

    pairs_f = _pairs_of(base).localCheckpoint() if incremental else None
    # scan window: a few times the batch cap so disjoint pairs behind
    # an early interactor still batch; the collect stays metadata-sized
    scan = max(4 * max_batch_merges, 64)
    rounds = 0
    compactions = 0
    # per-phase wall accounting (stats_out["phase_s"]): where a round
    # actually spends its time — the scale probes read this to aim
    # the next optimization at the measured floor, not a guessed one
    import time as _time

    phase_s = {"topk": 0.0, "touch": 0.0, "pairs": 0.0, "ovl": 0.0,
               "compact": 0.0}
    while len(merges) < n_merges:
        pairs = pairs_f if incremental else _pairs_of(_view())
        _t0 = _time.perf_counter()
        top = [
            (r["a"], r["b"], int(r["n"]))
            for r in pairs.orderBy(F.col("n").desc(), "a", "b")
            .limit(scan)
            .collect()
        ]
        phase_s["topk"] += _time.perf_counter() - _t0
        if not top or top[0][2] < min_count:
            break
        rounds += 1
        batch = _select_merge_batch(
            top,
            min(max_batch_merges, n_merges - len(merges)),
            min_count,
            window_truncated=len(top) == scan,
        )
        merges.extend(batch)
        napply = bpe_merge_pass_multi(F.col("seg"), batch)
        # ONLY words holding a batch-pair adjacency change this round
        # (the pass is the identity everywhere else): `touched` routes
        # both the pair-table delta and the overlay update
        mb = F.create_map(
            *[x for a, b in batch for x in (F.lit(a), F.lit(b))]
        )
        touched = _adj_any([mb])
        if overlay:
            # overlay rows carry `msk` as well (recomputed from the
            # NEW seg on every write), so both overlay scans run
            # bloom-guarded with the FULL batch — overlay segs may
            # contain post-compaction minted symbols, and the bloom
            # needs no eligibility test (crc32 of any string)
            touched_ovl = F.when(
                _bloom_pre(batch), _adj_any([mb])
            ).otherwise(F.lit(False))
            # ONE full view scan per round: the touched slice is
            # materialized small, and the delta + overlay update read
            # it instead of re-scanning the histogram. The base
            # branch runs under the eligibility + bloom prunes: only
            # base-eligible batch pairs can match frozen base segs,
            # and only rows carrying both symbols' bloom bits run the
            # adjacency fold.
            bf = [p for p in batch if _eligible(p[0]) and _eligible(p[1])]
            if bf:
                touched_base = F.when(
                    _bloom_pre(bf), _adj_any([_map_of(bf)])
                ).otherwise(F.lit(False))
                tb = base.where(_base_fresh() & touched_base).drop("msk")
                tw = (
                    tb if ovl is None
                    else tb.unionByName(
                        ovl.where(touched_ovl).drop("msk")
                    )
                )
            else:
                # no batch pair can exist in a frozen base seg: every
                # touched word is already in the overlay
                tw = (
                    ovl.where(touched_ovl).drop("msk")
                    if ovl is not None
                    else base.drop("msk").where(F.lit(False))
                )
            _t0 = _time.perf_counter()
            tw = tw.coalesce(n_small).localCheckpoint()
            phase_s["touch"] += _time.perf_counter() - _t0
        else:
            tw = _view().where(touched)
        if incremental:
            # pair-table delta of the touched words alone: old pair
            # multiset negative, post-pass multiset positive — exact
            # integer arithmetic, and the per-round shuffle follows
            # the TOUCHED words + the pair table itself instead of the
            # corpus-wide adjacent-pair explode (the classical
            # incremental pair index, distributed)
            old_p = tw.select((-F.col("cnt")).alias("cnt"), F.col("seg"))
            new_p = tw.select("cnt", napply.alias("seg"))
            delta = _pairs_of(old_p.unionByName(new_p))
            _t0 = _time.perf_counter()
            pairs_f = (
                pairs_f.unionByName(delta)
                .groupBy("a", "b")
                .agg(F.sum("n").cast("long").alias("n"))
                .where(F.col("n") > 0)
                .localCheckpoint()
            )
            phase_s["pairs"] += _time.perf_counter() - _t0
        if overlay:
            # rewrite ONLY the overlay: prior overlay rows not touched
            # this round stay (`~touched` on the overlay's own current
            # segs — exact, no join); touched rows (base- or
            # overlay-origin, both inside tw) enter with their new
            # segmentation, and the batch map joins the base frame's
            # stale-predicate stack
            # fresh msk from the NEW seg — one fold over the small
            # touched frame; untouched overlay rows keep theirs
            new_rows = tw.withColumn("seg", napply).withColumn(
                "msk", F.expr(_MSK_EXPR)
            )
            _t0 = _time.perf_counter()
            ovl = (
                new_rows
                if ovl is None
                else ovl.where(~touched_ovl).unionByName(new_rows)
            ).coalesce(n_small).localCheckpoint()
            stale_pairs.append(bf)
            _n_ovl = ovl.count()
            phase_s["ovl"] += _time.perf_counter() - _t0
            if (
                _n_ovl >= overlay_compact_rows
                or sum(1 for p in stale_pairs if p) >= overlay_compact_depth
            ):
                # fold the overlay into a fresh immutable base — the
                # one full-frame write, amortized over the rounds
                # since the last compaction. Triggered by overlay SIZE
                # (per-round overlay rewrite cost) or LIVE stale-stack
                # DEPTH (each base scan evaluates every stacked
                # non-empty batch map; unbounded depth would make the
                # view scan quadratic across rounds — batches whose
                # base-eligible pair set is empty stack no predicate
                # and don't count). The fresh base recomputes `msk`
                # (one codegen fold, paid once per stride) and resets
                # the minted-symbol ledger: every merge so far is now
                # frozen into the base.
                _t0 = _time.perf_counter()
                compacted = (
                    _view()
                    .withColumn("msk", F.expr(_MSK_EXPR))
                    .coalesce(n_base)
                    .localCheckpoint()
                )
                phase_s["compact"] += _time.perf_counter() - _t0
                ovl = None
                stale_pairs = []
                base = compacted
                base_minted = {a + b for a, b in merges}
                compactions += 1
        else:
            # referee path (pre-r13 behavior): rewrite + checkpoint
            # the full frame every round — the 6 s/round floor the
            # overlay exists to cut; kept for the equivalence pin
            base = base.withColumn(
                "seg", F.when(touched, napply).otherwise(F.col("seg"))
            ).localCheckpoint()
    if stats_out is not None:
        stats_out["rounds"] = rounds
        stats_out["compactions"] = compactions
        stats_out["phase_s"] = {k: round(v, 2) for k, v in phase_s.items()}
    seg = _view()
    if overlay and ovl is not None:
        # hand back a materialized frame (same contract as the old
        # per-round checkpointed segmentation)
        seg = seg.localCheckpoint()
    return merges, seg


def bpe_encode_words(words: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """(word, seg): encode a frame of distinct words with a trained
    merge table — the rank-ordered chain of merge passes, all codegen
    (the plan nests one aggregate per merge; keep n_merges in the
    hundreds, the classical small-vocab regime this tier targets).
    Unseen characters simply never merge — the OOV behavior of
    character-base BPE."""
    seg = segment_chars("word")
    for a, b in merges:
        seg = bpe_merge_pass(seg, a, b)
    return words.select("word", seg.alias("seg"))


def bpe_token_counts(
    df: DataFrame,
    merges: list[tuple[str, str]] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    seg_map: DataFrame | None = None,
) -> DataFrame:
    """(id_col, n_ws, n_bpe): per-document whitespace-token and BPE
    subword counts. Each DISTINCT word is encoded once (or looked up
    in a trained ``seg_map`` — e.g. :func:`bpe_train`'s second return
    — skipping the encode entirely); documents fold their word
    multiplicities against that vocab-sized map. Feed ``n_bpe`` to the
    packing tier via ``count_col`` to budget in real subword units."""
    if seg_map is None:
        if merges is None:
            raise ValueError("need merges or a trained seg_map")
    toks = (
        df.select(F.col(id_col), F.explode(tokens_col(text_col)).alias("word"))
        .where(F.length("word") > 0)
    )
    wc = toks.groupBy(id_col, "word").agg(
        F.count(F.lit(1)).cast("long").alias("occ")
    )
    if seg_map is None:
        seg_map = bpe_encode_words(wc.select("word").distinct(), merges)
    sizes = seg_map.select("word", F.size("seg").cast("long").alias("n_sub"))
    return (
        wc.join(sizes, "word")
        .groupBy(id_col)
        .agg(
            F.sum("occ").cast("long").alias("n_ws"),
            F.sum(F.col("occ") * F.col("n_sub")).cast("long").alias("n_bpe"),
        )
    )


def bpe_segment_text(
    df: DataFrame,
    seg_map: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_col, n_ws, n_bpe, seg_text): the fully segmented rendering —
    subwords joined by spaces, words by '|' in original order — the
    strongest per-document pin a value oracle can check (any wrong
    merge, order, or boundary changes the string). Word order is
    reassembled with a sort inside each doc's collected struct array
    (per-doc arrays — bounded by doc length, never corpus-wide)."""
    toks = (
        df.select(
            F.col(id_col),
            F.posexplode(tokens_col(text_col)).alias("pos", "word"),
        )
        .where(F.length("word") > 0)
    )
    sub = seg_map.select(
        "word",
        F.array_join("seg", " ").alias("sub"),
        F.size("seg").cast("long").alias("n_sub"),
    )
    return (
        toks.join(sub, "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_ws"),
            F.sum("n_sub").cast("long").alias("n_bpe"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "sub"))),
                    lambda s: s["sub"],
                ),
                "|",
            ).alias("seg_text"),
        )
    )


def save_bpe(spark, merges: list[tuple[str, str]], path: str) -> None:
    """Persist a merge table as (rank, a, b) parquet — the whole model,
    like the NB quality scorer's bucket table."""
    rows = [(i, a, b) for i, (a, b) in enumerate(merges)]
    spark.createDataFrame(rows, "rank long, a string, b string").coalesce(
        1
    ).write.mode("overwrite").parquet(path)


def load_bpe(spark, path: str) -> list[tuple[str, str]]:
    """Read back a :func:`save_bpe` merge table in rank order."""
    return [
        (r["a"], r["b"])
        for r in spark.read.schema("rank long, a string, b string")
        .parquet(path)
        .orderBy("rank")
        .collect()
    ]
