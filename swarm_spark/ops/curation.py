"""Published-recipe corpus curation gates.

- Gopher rule filter (Rae et al. 2021, arXiv:2112.11446 §A1.1): the
  document-level quality rules large LM corpora are cut with — word
  count bounds, mean word length band, symbol-to-word ratio, bullet /
  ellipsis line shares, alphabetic-word share, and the required
  English stop-word hits. Every rule is integer-exact arithmetic over
  one projection, so the gate is a zero-shuffle corpus scan and the
  flags value-oracle bit-for-bit.
- ExactSubstr duplicated-span removal (Lee et al. 2021,
  arXiv:2107.06499): corpus-wide, any token span of >= ``min_len``
  tokens that occurs more than once keeps its FIRST occurrence
  (ordered by (doc_id, position)) and is cut everywhere else, then
  documents are re-assembled without the cut tokens. The reference
  implementation builds a suffix array; the Spark-first shape below
  gets identical keep-one coverage from a windowed group-by, because
  a duplicated run of length M >= L duplicates every one of its
  L-windows, and the union of non-canonical window footprints is
  exactly the run minus its kept copy.

Reference parity: the swarm reference (m-mizutani/swarm) has no text
curation tier; these extend the engine's LLM-data-pipeline surface
alongside ops/text.py's quality heuristics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens_col

# Rae et al. 2021 Table A1 — the required-stop-word list ("contains at
# least two of ..."). Document-level presence, not frequency.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_words_col(text: Column) -> Column:
    """Rae et al.'s word projection: split on ANY whitespace run
    (space/tab/newline/vtab/formfeed/CR), empties dropped.
    Deliberately NOT ``ops.text.tokens_col`` (the engine's
    single-space canonical form): on multi-line documents a
    space-only split merges ``end\\nStart`` into one "word",
    undercounting ``n_words`` and skewing the mean-word-length /
    alpha-share / stop-word rules relative to the published recipe
    (ADVICE r11). The class is pinned EXPLICITLY instead of ``\\s``
    because Java's ``\\s`` includes ``\\x0B`` while DuckDB/RE2's does
    not — a vertical-tab document would count words differently in
    engine vs oracle (ADVICE r12); the same explicit class appears in
    all three Gopher oracle SQLs. Empties are filtered so
    leading/trailing whitespace cannot mint zero-length words."""
    return F.filter(
        F.split(text, "[ \\t\\n\\x0B\\f\\r]+"), lambda w: w != F.lit("")
    )


def _count_occurrences(text: Column, needle: str) -> Column:
    """Exact substring occurrence count via length arithmetic (no
    regex, so multi-char needles like ``...`` cost one replace)."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("long")


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    stopwords: tuple[str, ...] = GOPHER_STOPWORDS,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Per-document Gopher rule flags + the combined keep decision.

    Rules (Rae et al. 2021 §A1.1, each a TRUE-means-keep flag):

    - ``flag_words``: ``min_words <= n_words <= max_words`` (paper:
      50..100,000).
    - ``flag_mean_len``: mean word length in [3, 10] characters —
      compared as ``3·n_words <= total_chars <= 10·n_words`` so the
      band is exact integer arithmetic, no float division.
    - ``flag_symbol``: symbol-to-word ratio (``#`` and ``...``)
      <= 0.1, i.e. ``10·n_symbols <= n_words``.
    - ``flag_bullet``: <= 90% of lines start with a bullet
      (``-`` or ``•``): ``10·n_bullet_lines <= 9·n_lines``.
    - ``flag_ellipsis``: <= 30% of lines end with ``...``:
      ``10·n_ellipsis_lines <= 3·n_lines``.
    - ``flag_alpha``: >= 80% of words contain at least one
      [A-Za-z] character: ``10·n_alpha_words >= 8·n_words``.
    - ``flag_stop``: at least ``min_stop_hits`` DISTINCT words from
      ``stopwords`` appear (paper: 2 of the English list; swap the
      list per language for multilingual corpora).
    - ``keep`` = AND of all seven.

    Words are :func:`gopher_words_col` — full-whitespace split, the
    paper's projection — not the engine's space-only canonical
    tokenizer (ADVICE r11: newline-joined words must count as two).

    Scale shape: ONE projection over the corpus scan — every rule is
    a codegen expression over the token array / line array, no
    shuffle, no UDF. At 100 TB this is a map-only pass that AQE
    coalesces behind whatever scan is already running; the flags
    value-oracle exactly because every comparison is integer-side.
    """
    text = F.col(text_col)
    ws = gopher_words_col(text)
    lines = F.split(text, "\n")
    n_words = F.size(ws).cast("long")
    total_chars = F.aggregate(
        ws, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    n_symbols = _count_occurrences(text, "#") + _count_occurrences(text, "...")
    n_lines = F.size(lines).cast("long")
    n_bullet = F.size(
        F.filter(
            lines,
            lambda ln: ln.startswith("- ")
            | ln.startswith("•")
            | ln.startswith("* "),
        )
    ).cast("long")
    n_ell = F.size(F.filter(lines, lambda ln: ln.endswith("..."))).cast("long")
    n_alpha = F.size(F.filter(ws, lambda w: w.rlike("[A-Za-z]"))).cast("long")
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct(ws),
            F.array(*[F.lit(s) for s in stopwords]),
        )
    ).cast("long")

    out = df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        total_chars.alias("total_chars"),
        n_symbols.alias("n_symbols"),
        n_alpha.alias("n_alpha_words"),
        n_stop.alias("n_stopwords"),
        ((n_words >= min_words) & (n_words <= max_words)).alias("flag_words"),
        ((F.lit(3) * n_words <= total_chars) & (total_chars <= F.lit(10) * n_words)).alias(
            "flag_mean_len"
        ),
        (F.lit(10) * n_symbols <= n_words).alias("flag_symbol"),
        (F.lit(10) * n_bullet <= F.lit(9) * n_lines).alias("flag_bullet"),
        (F.lit(10) * n_ell <= F.lit(3) * n_lines).alias("flag_ellipsis"),
        (F.lit(10) * n_alpha >= F.lit(8) * n_words).alias("flag_alpha"),
        (n_stop >= int(min_stop_hits)).alias("flag_stop"),
    )
    return out.withColumn(
        "keep",
        F.col("flag_words")
        & F.col("flag_mean_len")
        & F.col("flag_symbol")
        & F.col("flag_bullet")
        & F.col("flag_ellipsis")
        & F.col("flag_alpha")
        & F.col("flag_stop"),
    )


def gopher_gate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    stopwords: tuple[str, ...] = GOPHER_STOPWORDS,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Apply the Gopher rule gate: keep the input rows whose doc
    passes every rule. ``stopwords`` defaults to the paper's English
    list — swap it per language the way CCNet swaps its reference
    corpora; the rule arithmetic is language-blind.

    Every rule is a pure per-row expression over ``text_col``, so the
    gate is ONE where() over the caller's frame (r14, guide §2.4):
    the previous left-semi against the flag frame duplicated the
    caller's whole upstream lineage into a second plan branch — in
    the composed curation chain that re-ran the dedup subtree per
    gate. The caller's columns pass through untouched either way. The
    rule expressions are intentionally inlined here rather than
    shared with :func:`gopher_rules` so the flag-frame op keeps its
    code identity (driver-ledger blast-radius bound; the equality
    test carries the shared-semantics guarantee).

    Per-ROW semantics, precisely (r14 ADVICE): each row is kept iff
    ITS OWN text passes — ``id_col`` is not consulted. This differs
    from the pre-r14 flag-frame semi-join on two edge cases callers
    should not rely on anyway: under DUPLICATE ``id_col`` values the
    semi-join kept every row whose id had ANY passing twin (per-row
    keeps only the passing rows), and rows with NULL ids were always
    dropped by the join (null keys never match) where per-row keeps
    them when their text passes. Registry/CLI pipelines dedup ids
    upstream, so both engines agree there; the per-row form is the
    documented contract going forward. ``id_col`` is retained for
    signature compatibility (and symmetry with :func:`gopher_rules`)
    but unused.
    """
    text = F.col(text_col)
    ws = gopher_words_col(text)
    lines = F.split(text, "\n")
    n_words = F.size(ws).cast("long")
    total_chars = F.aggregate(
        ws, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    n_symbols = _count_occurrences(text, "#") + _count_occurrences(text, "...")
    n_lines = F.size(lines).cast("long")
    n_bullet = F.size(
        F.filter(
            lines,
            lambda ln: ln.startswith("- ")
            | ln.startswith("•")
            | ln.startswith("* "),
        )
    ).cast("long")
    n_ell = F.size(F.filter(lines, lambda ln: ln.endswith("..."))).cast("long")
    n_alpha = F.size(F.filter(ws, lambda w: w.rlike("[A-Za-z]"))).cast("long")
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct(ws),
            F.array(*[F.lit(s) for s in stopwords]),
        )
    ).cast("long")
    return df.where(
        (n_words >= min_words)
        & (n_words <= max_words)
        & (F.lit(3) * n_words <= total_chars)
        & (total_chars <= F.lit(10) * n_words)
        & (F.lit(10) * n_symbols <= n_words)
        & (F.lit(10) * n_bullet <= F.lit(9) * n_lines)
        & (F.lit(10) * n_ell <= F.lit(3) * n_lines)
        & (F.lit(10) * n_alpha >= F.lit(8) * n_words)
        & (n_stop >= int(min_stop_hits))
    )


def _tok_stream(toks: DataFrame) -> DataFrame:
    """(id, i, tok) 1-based token positions from a (id, ws) frame."""
    return toks.select("id", F.posexplode("ws").alias("i0", "tok")).select(
        "id", (F.col("i0") + 1).alias("i"), "tok"
    )


def _windows(toks: DataFrame, ln: int) -> DataFrame:
    """(id, p, g) md5'd L-token sliding windows from a (id, ws) frame."""
    return (
        toks.where(F.size("ws") >= ln)
        .select(
            "id",
            "ws",
            F.explode(F.sequence(F.lit(1), F.size("ws") - (ln - 1))).alias("p"),
        )
        .select(
            "id",
            "p",
            F.md5(F.concat_ws(" ", F.slice("ws", F.col("p"), F.lit(ln)))).alias(
                "g"
            ),
        )
    )


def _rebuild_without(
    stream: DataFrame, marked: DataFrame, ln: int, id_col: str
) -> DataFrame:
    """Cut every token covered by a marked window and re-assemble:
    one aggregation produces sizes, removal counts, AND the rebuilt
    text — no separate size scan, no final per-doc join."""
    covered = (
        marked.select(
            "id",
            F.explode(F.sequence(F.col("p"), F.col("p") + (ln - 1))).alias("i"),
        )
        .distinct()
        .withColumn("cov", F.lit(True))
    )
    flagged = stream.join(covered, ["id", "i"], "left")
    return (
        flagged.groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("cov"), 1).otherwise(0))
            .cast("long")
            .alias("n_removed"),
            F.concat_ws(
                " ",
                F.transform(
                    F.filter(
                        F.array_sort(F.collect_list(F.struct("i", "cov", "tok"))),
                        lambda st: st["cov"].isNull(),
                    ),
                    lambda st: st["tok"],
                ),
            ).alias("text_clean"),
        )
        .select(F.col("id").alias(id_col), "n_tokens", "n_removed", "text_clean")
    )


def exactsubstr_cut(
    df: DataFrame,
    min_len: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """ExactSubstr keep-one duplicated-span removal (Lee et al. 2021,
    arXiv:2107.06499 §4.1): every token span of >= ``min_len`` tokens
    occurring more than once in the corpus survives only at its first
    occurrence (min (doc_id, position)); all other occurrences are cut
    from their documents, and the cleaned text is re-assembled from
    the surviving tokens in order.

    Window semantics: an L-token sliding window (L = ``min_len``) is
    "marked" when its gram occurs > 1 time corpus-wide and this
    occurrence is not the canonical (minimum (doc_id, pos)) one. A
    token is removed iff some marked window covers it. A duplicated
    run of M >= L tokens duplicates all of its M-L+1 windows, whose
    canonical copies all live at the first occurrence — so the run
    survives exactly once, and partial overlaps shorter than L are
    never touched (the paper's guarantee).

    Scale shape: positions explode to Σ tokens rows; the gram group-by
    keys on md5(gram) and needs only count + min(struct(doc,pos)) —
    both monoids, so boilerplate hot keys partial-aggregate map-side.
    The mark join is gram-keyed (shuffle volume Σ windows), coverage
    explodes marked windows × L (bounded by the DUPLICATED volume,
    not the corpus), and re-assembly is a per-doc sort_array fold —
    per-doc bounded like winnowing. No suffix array, no driver state;
    the reference implementation's single-machine suffix automaton is
    replaced by three shuffles whose keys are all content-derived.

    Returns (id, n_tokens, n_removed, text_clean) — docs with nothing
    removed pass through with their original token stream re-joined on
    single spaces (tokenizer-canonical form).
    """
    ln = int(min_len)
    if ln < 2:
        raise ValueError("min_len must be >= 2")
    toks = df.select(F.col(id_col).alias("id"), tokens_col(text_col).alias("ws"))
    stream = _tok_stream(toks)
    wins = _windows(toks, ln)
    # canonical occurrence per duplicated gram: min (doc, pos)
    canon = (
        wins.groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min(F.struct("id", "p")).alias("first"),
        )
        .where(F.col("cnt") > 1)
        .select("g", F.col("first.id").alias("cid"), F.col("first.p").alias("cp"))
    )
    marked = wins.join(canon, "g").where(
        (F.col("id") != F.col("cid")) | (F.col("p") != F.col("cp"))
    )
    return _rebuild_without(stream, marked, ln, id_col)


def exactsubstr_window_stats(
    df: DataFrame,
    min_len: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The ExactSubstr ledger statistic: per window gram, the earliest
    (doc_id, pos) occurrence and the occurrence count — a (MIN, SUM)
    monoid pair, so per-wave frames fold with :func:`exactsubstr_merge`
    into exactly the one-shot statistic (the same append-only ledger
    contract as the BM25 postings / bounds / LM count tables)."""
    ln = int(min_len)
    if ln < 2:
        raise ValueError("min_len must be >= 2")
    toks = df.select(F.col(id_col).alias("id"), tokens_col(text_col).alias("ws"))
    return (
        _windows(toks, ln)
        .groupBy("g")
        .agg(
            F.min(F.struct("id", "p")).alias("first"),
            F.count(F.lit(1)).cast("long").alias("cnt"),
        )
        .select("g", F.col("first.id").alias("first_id"),
                F.col("first.p").alias("first_p"), "cnt")
    )


def exactsubstr_merge(stored: DataFrame, delta: DataFrame) -> DataFrame:
    """Fold a wave's window stats into the stored ledger: MIN on the
    first occurrence, SUM on the count — merge == one-shot recompute,
    the monoid contract every incremental tier here pins."""
    return (
        stored.unionByName(delta)
        .groupBy("g")
        .agg(
            F.min(F.struct(F.col("first_id").alias("id"),
                           F.col("first_p").alias("p"))).alias("first"),
            F.sum("cnt").cast("long").alias("cnt"),
        )
        .select("g", F.col("first.id").alias("first_id"),
                F.col("first.p").alias("first_p"), "cnt")
    )


def exactsubstr_cut_wave(
    wave: DataFrame,
    stored: DataFrame,
    min_len: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental ExactSubstr over an arriving wave: cut every wave
    span already present in the STORED ledger (its first occurrence
    lives in an earlier wave and was kept there), plus within-wave
    duplicates keep-first — WITHOUT rescanning the stored corpus.

    Arrival-order keep-first equals the one-shot
    :func:`exactsubstr_cut` whenever doc ids ascend across waves (the
    append-only corpus case; the registry row's oracle IS the one-shot
    SQL, so green == the equivalence holds). The wave's own
    :func:`exactsubstr_window_stats` folds into the ledger afterwards
    via :func:`exactsubstr_merge`; only the wave is ever re-read.
    """
    ln = int(min_len)
    if ln < 2:
        raise ValueError("min_len must be >= 2")
    toks = wave.select(F.col(id_col).alias("id"), tokens_col(text_col).alias("ws"))
    stream = _tok_stream(toks)
    wins = _windows(toks, ln)
    wave_canon = wins.groupBy("g").agg(
        F.count(F.lit(1)).alias("wcnt"),
        F.min(F.struct("id", "p")).alias("wfirst"),
    )
    hist = stored.select("g").withColumn("seen", F.lit(True))
    marked = (
        wins.join(wave_canon, "g")
        .join(hist, "g", "left")
        .where(
            F.col("seen")  # earlier wave holds the kept copy
            | (
                (F.col("wcnt") > 1)
                & (
                    (F.col("id") != F.col("wfirst.id"))
                    | (F.col("p") != F.col("wfirst.p"))
                )
            )
        )
    )
    return _rebuild_without(stream, marked, ln, id_col)



# Rae et al. 2021 Table A1 — repetition thresholds as (signal, max
# permitted fraction in micro-units). top-n = fraction of characters
# in the most frequent word n-gram; dup-n = fraction of characters
# covered by word n-grams occurring more than once within the doc.
GOPHER_REPETITION_MAX_MICRO = {
    ("top", 2): 200_000,
    ("top", 3): 180_000,
    ("top", 4): 160_000,
    ("dup", 5): 150_000,
    ("dup", 6): 140_000,
    ("dup", 7): 130_000,
    ("dup", 8): 120_000,
    ("dup", 9): 110_000,
    ("dup", 10): 100_000,
}


def gopher_repetition(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 6, 7, 8, 9, 10),
) -> DataFrame:
    """The repetition half of the Gopher filter (Rae et al. 2021
    §A1.1): per document, the fraction of characters contained in the
    most frequent word n-gram (``top_ns``) and the fraction of
    characters covered by word n-grams occurring more than once
    within the document (``dup_ns``) — the signals that catch
    boilerplate, keyword stuffing, and generation loops that
    document-level rules miss.

    Character accounting is token characters (separator spaces
    excluded) so every fraction is exact integer micro-units:
    ``frac_micro = floor(covered_chars * 1e6 / total_chars)``. The
    most-frequent n-gram ties break to the lexicographically greatest
    gram (deterministic, oracle-reproducible). Words are
    :func:`gopher_words_col` (full-whitespace split, the paper's
    projection — ADVICE r11), matching :func:`gopher_rules`.

    Scale shape: ALL tiers ride ONE gram explode — each doc emits its
    (n, pos, gram) windows for every requested n in a single
    projection, one (id, n, gram) count aggregation serves the top-
    fraction argmax AND the duplicate gate, and duplicate coverage
    explodes only the windows with count > 1 (bounded by the
    repeated mass, like ExactSubstr). Output columns are a static
    pivot over the literal n lists, one row per doc.
    """
    ns = sorted(set(top_ns) | set(dup_ns))
    if not ns or min(ns) < 2:
        raise ValueError("n-gram orders must be >= 2")
    toks = df.select(
        F.col(id_col).alias("id"), gopher_words_col(F.col(text_col)).alias("ws")
    )
    sizes = toks.select(
        "id",
        F.aggregate(
            "ws", F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
        ).alias("total_chars"),
    )
    # positional (id, n, p, g) stream for every requested order:
    # explode the literal order list, then the start positions that fit,
    # and build each gram per output row with slice/concat_ws — all
    # whole-stage codegen. The former shape exploded a flatten of
    # transform-lambda-built struct arrays; higher-order lambdas are
    # interpreted and the generator input is re-evaluated per OUTPUT
    # row at the fused explode (O(len²) interpreted work per doc —
    # guide §4.1, the r14 positional pattern). Same multiset: order n
    # emits positions 1..size(ws)−(n−1) exactly when size(ws) ≥ n.
    wins = (
        toks.select(
            "id",
            "ws",
            F.explode(F.array(*[F.lit(n).cast("int") for n in ns])).alias("n"),
        )
        .where(F.size("ws") >= F.col("n"))
        .select(
            "id",
            "ws",
            "n",
            F.explode(
                F.sequence(F.lit(1), F.size("ws") - F.col("n") + F.lit(1))
            ).alias("p"),
        )
        .select(
            "id",
            "n",
            F.col("p").cast("int").alias("p"),
            F.concat_ws(" ", F.slice("ws", F.col("p"), F.col("n"))).alias("g"),
        )
    )
    counts = wins.groupBy("id", "n", "g").agg(F.count(F.lit(1)).alias("c"))

    # top-fraction tier: argmax by (count, gram) per (id, n); covered
    # chars = c * gram token chars (len minus the n-1 separator spaces)
    top = (
        counts.where(F.col("n").isin(list(top_ns)))
        .groupBy("id", "n")
        .agg(F.max(F.struct("c", "g")).alias("t"))
        .select(
            "id",
            "n",
            (
                F.col("t.c")
                * (F.length(F.col("t.g")) - (F.col("n") - 1))
            ).cast("long").alias("cov"),
        )
    )
    # duplicate-coverage tier: token positions covered by any within-
    # doc duplicated n-gram, chars summed once per (n, position)
    dup_wins = (
        wins.where(F.col("n").isin(list(dup_ns)))
        .join(
            counts.where(F.col("c") > 1).select("id", "n", "g"),
            ["id", "n", "g"],
        )
    )
    covered = dup_wins.select(
        "id",
        "n",
        F.explode(F.sequence(F.col("p"), F.col("p") + F.col("n") - 1)).alias("i"),
    ).distinct()
    stream = toks.select(
        "id", F.posexplode("ws").alias("i0", "tok")
    ).select("id", (F.col("i0") + 1).alias("i"), F.length("tok").alias("len"))
    dup = covered.join(stream, ["id", "i"]).groupBy("id", "n").agg(
        F.sum("len").cast("long").alias("cov")
    )

    def _frac(src: DataFrame, kind: str, orders: tuple[int, ...]) -> DataFrame:
        return src.groupBy("id").agg(
            *[
                F.sum(F.when(F.col("n") == n, F.col("cov")).otherwise(0))
                .cast("long")
                .alias(f"{kind}{n}_cov")
                for n in orders
            ]
        )

    out = sizes.join(_frac(top, "top", tuple(top_ns)), "id", "left").join(
        _frac(dup, "dup", tuple(dup_ns)), "id", "left"
    )
    cols = [F.col("id").alias(id_col), "total_chars"]
    for kind, orders in (("top", top_ns), ("dup", dup_ns)):
        for n in orders:
            # integer `div`, not floor(double /): the micro fraction
            # stays exact long arithmetic end to end (oracle-safe)
            cols.append(
                F.expr(
                    f"coalesce({kind}{n}_cov, 0) * 1000000 div total_chars"
                )
                .cast("long")
                .alias(f"{kind}{n}_frac_micro")
            )
    return out.select(*cols)


def gopher_repetition_gate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 6, 7, 8, 9, 10),
) -> DataFrame:
    """Keep rows whose repetition signals all sit at/below the
    paper's thresholds (``GOPHER_REPETITION_MAX_MICRO``); composes
    with :func:`gopher_gate` for the full Gopher filter."""
    rep = gopher_repetition(df, text_col, id_col, top_ns, dup_ns)
    cond = F.lit(True)
    for kind, orders in (("top", top_ns), ("dup", dup_ns)):
        for n in orders:
            cond = cond & (
                F.col(f"{kind}{n}_frac_micro")
                <= GOPHER_REPETITION_MAX_MICRO[(kind, n)]
            )
    return df.join(rep.where(cond).select(id_col), id_col, "left_semi")


def save_exactsubstr_ledger(stats: DataFrame, path: str) -> None:
    """Persist an :func:`exactsubstr_window_stats` frame (overwrite:
    callers fold first with :func:`exactsubstr_merge`)."""
    stats.write.mode("overwrite").parquet(path)


def load_exactsubstr_ledger(spark, path: str) -> DataFrame:
    """Read a persisted window-stat ledger with the pinned schema.
    ``first_id`` keeps its STORED type (int or string doc ids — the
    keep-first contract is order-based, not int-based; ADVICE r12);
    the other columns are pinned, and a column-set drift fails fast
    instead of silently misreading."""
    df = spark.read.parquet(path)
    expected = {"g", "first_id", "first_p", "cnt"}
    if set(df.columns) != expected:
        raise ValueError(
            f"ledger at {path} has columns {sorted(df.columns)}, "
            f"expected {sorted(expected)}"
        )
    return df.select(
        F.col("g").cast("string").alias("g"),
        F.col("first_id"),
        F.col("first_p").cast("long").alias("first_p"),
        F.col("cnt").cast("long").alias("cnt"),
    )
