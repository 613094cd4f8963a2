"""Empirical scaling probe for the dedup/ANN tier (SCALING.md §"Measured
scaling exponents").

SCALING.md argues 100-TB behavior from plan shape; this script adds the
empirical exponent VERDICT r6 asked for: generate two corpora from the
SAME deterministic process at 1× and 10× scale (matching the driver
testdata's shape: 31-word vocab soup, ~0.2% planted exact dups, ~0.5%
near-dups, 64-dim 10-cluster embeddings), time the four headline
dedup/ANN operators at both points with PRODUCTION knob scaling
(max_df and n_cells grow with the corpus, query batch fixed), and
print the wall-time ratios. Expected ~linear (ratio ≈ 10 ± noise);
anything clearly super-linear is a finding.

Run:  python scripts/scale_probe.py [--factor 10] [--runs 3]
Data lands in .scale/f{1,N}/ (gitignored). Uses local[$SPARK_GRAFT_CPUS].
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_DOCS = 5_000  # sf0.1-equivalent
BASE_VECS = 2_000
VOCAB = [  # the driver testdata's 31-token vocabulary (sf0.1 documents)
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
LANGS = [("en", 0.41), ("zh", 0.15), ("es", 0.15), ("fr", 0.15), ("de", 0.14)]


def generate(out_dir: str, factor: int, seed: int = 42) -> None:
    """Deterministic word-soup corpus + clustered embeddings at
    ``factor``× the sf0.1 row counts, written as two parquet files."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    n_docs, n_vecs = BASE_DOCS * factor, BASE_VECS * factor

    langs = [l for l, _ in LANGS]
    lang_p = np.array([p for _, p in LANGS])
    lang_p = lang_p / lang_p.sum()
    lang_idx = rng.choice(len(langs), size=n_docs, p=lang_p)
    n_tok = rng.integers(8, 97, size=n_docs)
    texts = [
        " ".join(rng.choice(VOCAB, size=int(k)).tolist()) for k in n_tok
    ]
    # planted structure at the driver-testdata rate, scale-invariant:
    # ~0.16% exact duplicates, ~0.5% near-duplicates (10% token edits)
    for i in rng.choice(n_docs, size=max(8, n_docs // 625), replace=False):
        texts[(i + 1) % n_docs] = texts[i]
    for i in rng.choice(n_docs, size=max(25, n_docs // 200), replace=False):
        toks = texts[i].split()
        for j in rng.choice(len(toks), size=max(1, len(toks) // 10), replace=False):
            toks[j] = str(rng.choice(VOCAB))
        texts[(i + 2) % n_docs] = " ".join(toks)
    docs = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array([langs[i] for i in lang_idx], pa.string()),
            "source": pa.array([f"src{i % 20}" for i in range(n_docs)], pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )

    centroids = rng.normal(0.0, 0.25, size=(10, 64))
    label = rng.integers(0, 10, size=n_vecs)
    vecs = (centroids[label] * 0.6 + rng.normal(0.0, 0.08, size=(n_vecs, 64))).astype(
        np.float32
    )
    emb = pa.table(
        {
            "vec_id": pa.array(range(n_vecs), pa.int64()),
            "embedding": pa.array(vecs.tolist(), pa.list_(pa.float32())),
            "label": pa.array(label.tolist(), pa.int32()),
        }
    )
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(docs, os.path.join(out_dir, "documents.parquet"))
    pq.write_table(emb, os.path.join(out_dir, "embeddings.parquet"))


def _gram_docs(docs, n: int):
    """Re-tokenize the 31-word soup into n-gram units ('a_agg_batch'):
    token-level tf-idf is degenerate on a 31-token vocabulary (every
    df ~ N). n=5 gives a 31^5 = 28.6M key space that stays SPARSE at
    f10 (df ~ 1-2, planted dups share their grams — the Zipf-tail
    shape real corpora have); n=3 gives a 31^3 = 29.8k space that
    fully SATURATES at f10 (every key df ~ N/350) — the worst case.
    (Probe docs always have >= 8 tokens, so sequence() stays valid.)"""
    from pyspark.sql import functions as F

    # bracket indexing is 0-based while sequence() i is 1-based: the
    # k-th unit term is ws[i-1+k], rendered ws[i-1], ws[i], ws[i+1], ...
    parts = ", ".join(
        "ws[i]" if k == 1 else f"ws[i{k - 1:+d}]" for k in range(n)
    )
    return docs.select("doc_id", F.split("text", " +").alias("ws")).select(
        "doc_id",
        F.array_join(
            F.expr(
                f"CASE WHEN size(ws) < {n} THEN array()"
                f" ELSE transform(sequence(1, size(ws) - {n - 1}),"
                f" i -> concat_ws('_', {parts})) END"
            ),
            " ",
        ).alias("text"),
    )


def _kw_docs(docs):
    """Words + contiguous 3-gram + 5-gram units in one text column — a
    THREE-tier df spectrum (words df ~ N; 3-grams over a 29.8k key
    space, df mid; 5-grams over 28.6M keys, df ~ 1-2): the Zipf-like
    df SPREAD a real vocabulary has, which `_mixed_docs` lacks a
    middle band for."""
    from pyspark.sql import functions as F

    # size guards (as lm_train's): sequence(1, n) with n < 1 yields a
    # DESCENDING sequence, which would mint bogus units via
    # null-skipping concat_ws on docs shorter than the window
    return docs.select("doc_id", F.split("text", " +").alias("ws")).select(
        "doc_id",
        F.concat_ws(
            " ",
            F.array_join(F.col("ws"), " "),
            F.array_join(
                F.expr(
                    "CASE WHEN size(ws) < 3 THEN array()"
                    " ELSE transform(sequence(1, size(ws) - 2),"
                    " i -> concat_ws('_', ws[i-1], ws[i], ws[i+1])) END"
                ),
                " ",
            ),
            F.array_join(
                F.expr(
                    "CASE WHEN size(ws) < 5 THEN array()"
                    " ELSE transform(sequence(1, size(ws) - 4),"
                    " i -> concat_ws('_', ws[i-1], ws[i], ws[i+1], ws[i+2], ws[i+3])) END"
                ),
                " ",
            ),
        ).alias("text"),
    )


def _kw_queries(docs, n: int = 2000):
    """Short keyword queries over the `_kw_docs` vocabulary: one
    stopword-tier word + one mid-df 3-gram + one rare 5-gram from the
    doc's middle — the classical MaxScore serving shape (Broder et
    al.'s motivating case: a high-df term in the query must not drag
    the whole corpus into candidate scoring). Probe docs always have
    >= 8 tokens, so the middle-anchored indices stay in range."""
    from pyspark.sql import functions as F

    m = "cast(size(ws) / 2 as int)"
    return (
        docs.where(F.col("doc_id") < n)
        .select(
            F.col("doc_id").alias("query_id"),
            F.split("text", " +").alias("ws"),
        )
        .select(
            "query_id",
            F.expr(
                "concat_ws(' ', ws[0],"
                f" concat_ws('_', ws[{m}-1], ws[{m}], ws[{m}+1]),"
                f" concat_ws('_', ws[{m}-1], ws[{m}], ws[{m}+1],"
                f" ws[{m}+2], ws[{m}+3]))"
            ).alias("text"),
        )
    )


def _mixed_docs(docs):
    """Token text + the doc's contiguous 5-gram units in one text
    column — a ZIPFIAN mixed vocabulary (31 stopword-like common terms,
    df ~ N, plus a rare 5-gram tail, df ~ 1-2). The saturated soup has
    no selective term at all, so impact-ordered pruning cannot cut
    candidates there by construction; this is the realistic shape
    (common + rare) where the MaxScore essential-terms gate has spread
    to exploit."""
    from pyspark.sql import functions as F

    return docs.select(
        "doc_id",
        F.split("text", " +").alias("ws"),
    ).select(
        "doc_id",
        F.concat_ws(
            " ",
            F.array_join(F.col("ws"), " "),
            F.array_join(
                F.expr(
                    "CASE WHEN size(ws) < 5 THEN array()"
                    " ELSE transform(sequence(1, size(ws) - 4),"
                    " i -> concat_ws('_', ws[i-1], ws[i], ws[i+1], ws[i+2], ws[i+3])) END"
                ),
                " ",
            ),
        ).alias("text"),
    )


def probe(
    spark, data_dir: str, factor: int, runs: int, only: set[str] | None = None
) -> dict[str, float]:
    """Median wall seconds for the probed operators, knobs scaled the
    way a production deployment scales them: the absolute-DF prune cap
    and the cell counts grow with the corpus (keeping per-bucket/
    per-cell work constant); the ANN/BM25 query batch stays FIXED at
    200 queries so the measured quantity is corpus-scan cost, not
    batch size. ``only`` restricts to a subset (re-probing new rows
    without re-timing the recorded ones)."""
    from pyspark.sql import functions as F

    from swarm_spark.ops.dedup import (
        auto_max_df,
        bloom_contains,
        build_block_bloom,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )
    from swarm_spark.ops.ivf import ann_topk_ivf
    from swarm_spark.ops.pq import ann_topk_ivfpq
    from swarm_spark.ops.retrieval import (
        bm25_postings,
        bm25_pruned,
        bm25_stats,
        bm25_topk,
        bm25_totals,
        lm_pruned,
        lm_topk,
        load_bm25,
        phrase_match_rare,
        save_bm25,
    )
    from swarm_spark.ops.allpairs import tfidf_cosine_pairs
    from swarm_spark.ops.dedup import doc_shingles
    from swarm_spark.ops.layout import zorder_bucket_stats
    from swarm_spark.ops.sampling import (
        global_shuffle_order,
        sample_temperature,
        weighted_sample_exact,
    )
    from swarm_spark.ops.semdedup import semantic_dup_pairs
    from swarm_spark.ops.sketch import cms_sketch, hll_registers
    from swarm_spark.ops.text import (
        group_value_quantiles,
        nb_score_quality,
        nb_train_quality,
        tokens_col,
        top_ngrams,
    )

    # the generated corpus is ONE small parquet file, which Spark maps
    # to ONE input partition however many rows it holds — at f30 every
    # tokenize/explode stage ran as a single 6-minute task (measured:
    # one RUNNABLE executor thread in String.split while 31 cores sat
    # idle). Real deployments read many splits; spread the source once
    # so the probe measures operator scaling, not a test-harness file
    # layout. (r13 change: f1/f10/f30 rows from r13 on are measured
    # under this layout; earlier rounds' absolute numbers carried the
    # single-partition scan in BOTH probe points, so their RATIOS
    # remain comparable.)
    par = spark.sparkContext.defaultParallelism
    docs = (
        spark.read.parquet(os.path.join(data_dir, "documents.parquet"))
        .repartition(par)
        .localCheckpoint()
    )
    emb = (
        spark.read.parquet(os.path.join(data_dir, "embeddings.parquet"))
        .repartition(par)
        .localCheckpoint()
    )
    queries = emb.where(F.col("vec_id") < 200)  # fixed batch at every scale

    # build-once for the persisted-path BM25 probe: index build is NOT
    # what this row times — the probe-many serving cost is
    bm25_dir = os.path.join(data_dir, "bm25_ix")
    want_lex = only is None or bool(
        {"bm25_topk", "lm_topk", "bm25_pruned", "lm_pruned"} & only
    )
    if want_lex and not os.path.exists(os.path.join(bm25_dir, "totals")):
        post = bm25_postings(docs)
        save_bm25(post, bm25_stats(post), bm25_totals(docs), bm25_dir)
    if want_lex:
        from swarm_spark.ops.retrieval import (
            bm25_term_bounds,
            load_bm25_bounds,
            save_bm25_bounds,
        )

        lpost, lstats, ltot = load_bm25(spark, bm25_dir)
        if not os.path.exists(os.path.join(bm25_dir, "bounds")):
            save_bm25_bounds(bm25_term_bounds(lpost), bm25_dir)
        lbounds = load_bm25_bounds(spark, bm25_dir)
    qdocs = docs.where(F.col("doc_id") < 200).select(
        F.col("doc_id").alias("query_id"), "text"
    )

    # build-once for the Zipfian mixed-vocab lexical index (common
    # tokens + rare 5-gram tail): the corpus shape where MaxScore
    # pruning has df spread to exploit — on the saturated soup no term
    # is selective and pruning is measured ~flat by construction
    want_zipf = only is None or bool({"bm25_zipf", "bm25_pruned_zipf"} & only)
    if want_zipf:
        zipf_dir = os.path.join(data_dir, "bm25_zipf_ix")
        mixed = _mixed_docs(docs)
        if not os.path.exists(os.path.join(zipf_dir, "totals")):
            from swarm_spark.ops.retrieval import bm25_term_bounds as _btb
            from swarm_spark.ops.retrieval import save_bm25_bounds as _sbb

            zpost = bm25_postings(mixed)
            save_bm25(zpost, bm25_stats(zpost), bm25_totals(mixed), zipf_dir)
            _sbb(_btb(zpost), zipf_dir)
        from swarm_spark.ops.retrieval import load_bm25_bounds as _lbb

        zlpost, zlstats, zltot = load_bm25(spark, zipf_dir)
        zlbounds = _lbb(spark, zipf_dir)
        # 2,000-query batch (10x the other lexical probes): pruning
        # trades a few extra index scans (flat in |Q|) for a candidate
        # aggregation that shrinks from |Q|-proportional to ~rare-df —
        # the win regime is query-heavy serving, so measure it there
        qzipf = mixed.where(F.col("doc_id") < 2000).select(
            F.col("doc_id").alias("query_id"), "text"
        )

    # build-once for the three-tier keyword-query lexical pair: the df
    # SPECTRUM corpus (words + 3-grams + 5-grams) with SHORT queries —
    # MaxScore's design point, where the stopword tier is non-essential
    # and candidates follow the mid/rare posting lists
    want_kw = only is None or bool(
        {
            "bm25_kw", "bm25_pruned_kw", "lm_kw", "lm_pruned_kw",
            "bm25_kw_qheavy", "bm25_pruned_kw_qheavy",
            "bm25_pruned_kw_hot", "bm25_pruned_kw_hot_bkt",
        }
        & only
    )
    if want_kw:
        kw_dir = os.path.join(data_dir, "bm25_kw_ix")
        kwdocs = _kw_docs(docs)
        if not os.path.exists(os.path.join(kw_dir, "totals")):
            from swarm_spark.ops.retrieval import bm25_term_bounds as _btbk
            from swarm_spark.ops.retrieval import save_bm25_bounds as _sbbk

            kpost = bm25_postings(kwdocs)
            save_bm25(kpost, bm25_stats(kpost), bm25_totals(kwdocs), kw_dir)
            _sbbk(_btbk(kpost), kw_dir)
        from swarm_spark.ops.retrieval import load_bm25_bounds as _lbbk

        klpost, klstats, kltot = load_bm25(spark, kw_dir)
        klbounds = _lbbk(spark, kw_dir)
        qkw = _kw_queries(docs, 2000)
        # query-heavy serving batch: exhaustive volume is |Q|*N while
        # the pruned path's index scans are FLAT in |Q| — the MaxScore
        # win regime (capped by the corpus size at f1)
        qkw_heavy = _kw_queries(docs, 20_000)
        # tok-bucketed twin of the kw index, for the HOT-distribution
        # serving pair: a 20k-query batch drawn from a 200-query
        # working set (real keyword serving is head-heavy) touches a
        # fixed term set however large the batch, so the bucket filter
        # prunes the postings scan; the qheavy batch above, with 20k
        # DISTINCT rare grams, covers every bucket by construction
        # (identity fallback — the documented boundary)
        kwb_dir = os.path.join(data_dir, "bm25_kw_bkt_ix")
        if not os.path.exists(os.path.join(kwb_dir, "totals")):
            from swarm_spark.ops.retrieval import bm25_term_bounds as _btbb
            from swarm_spark.ops.retrieval import save_bm25_bounds as _sbbb

            kpostb = bm25_postings(kwdocs)
            save_bm25(
                kpostb, bm25_stats(kpostb), bm25_totals(kwdocs), kwb_dir,
                tok_buckets=64,
            )
            _sbbb(_btbb(kpostb), kwb_dir)
        from swarm_spark.ops.retrieval import prune_tok_buckets as _ptbk

        klpostb, klstatsb, kltotb = load_bm25(spark, kwb_dir)
        klboundsb = _lbbk(spark, kwb_dir)
        # 16-query head set x 1250 reps = 20k rows: ~48 live terms
        # hash into ~half the 64 buckets, so the bucket filter has
        # something to cut. (A 200-query set was measured first: its
        # 600 terms cover ~every bucket — identity fallback plus
        # collect overhead, 43.6 s vs 36.8 s unbucketed at f10 — the
        # working-set-vs-bucket-count boundary, recorded in
        # SCALING.md.)
        qkw_hot = (
            _kw_queries(docs, 16)
            .crossJoin(spark.range(1250).select(F.col("id").alias("rep")))
            .select(
                (F.col("query_id") * 1250 + F.col("rep")).alias("query_id"),
                "text",
            )
        )

    # build-once for the persisted-path phrase probe: the positional
    # index lands on disk untimed; the row times the probe only
    # the Zipfian mixed-vocab phrase pair: 3-token phrases straddling
    # the common/rare boundary (two df~N words + one df~1-2 gram unit),
    # over a positional index of the mixed corpus — rare-term gating's
    # home turf (on the saturated soup min df ≈ max df and NO gate can
    # cut candidates; grams is the encoded path there)
    want_pzipf = only is None or bool(
        {"phrase_zipf", "phrase_rare_zipf"} & (only or set())
    )
    if want_pzipf:
        from swarm_spark.ops.retrieval import (
            load_positional as _lpos,
        )
        from swarm_spark.ops.retrieval import (
            phrase_match as _pm,
        )
        from swarm_spark.ops.retrieval import (
            positional_postings as _ppost,
        )
        from swarm_spark.ops.retrieval import (
            save_positional as _spos,
        )

        from swarm_spark.ops.retrieval import prune_tok_buckets as _ptb

        zpos_dir = os.path.join(data_dir, "pos_zipf_ix")
        zposb_dir = os.path.join(data_dir, "pos_zipf_bkt_ix")
        zmixed = _mixed_docs(docs)
        if not os.path.exists(os.path.join(zpos_dir, "postings")):
            _spos(_ppost(zmixed), zpos_dir)
        if not os.path.exists(os.path.join(zposb_dir, "postings")):
            _spos(_ppost(zmixed), zposb_dir, tok_buckets=64)
        zlpos = _lpos(spark, zpos_dir)
        zlposb = _lpos(spark, zposb_dir)
        # mixed ws = n words + (n-4) grams; the boundary phrase starts
        # at word n-1 (1-based): (w_{n-1}, w_n, g_1)
        zphrases = (
            zmixed.where(F.col("doc_id") < 200)
            .select(
                F.col("doc_id").alias("phrase_id"),
                F.split("text", " +").alias("ws"),
            )
            .select(
                "phrase_id",
                F.concat_ws(
                    " ",
                    F.expr("slice(ws, cast((size(ws) + 4) / 2 as int) - 1, 3)"),
                ).alias("text"),
            )
        )

    if only is None or bool(
        {"phrase_match", "phrase_grams", "phrase_rare"} & (only or set())
    ):
        from swarm_spark.ops.retrieval import (
            load_positional,
            phrase_match,
            phrase_match_grams,
            positional_postings,
            save_positional,
        )
        from swarm_spark.ops.text import tokens_col

        pos_dir = os.path.join(data_dir, "pos_ix")
        if not os.path.exists(os.path.join(pos_dir, "postings")):
            save_positional(positional_postings(docs), pos_dir)
        lpos = load_positional(spark, pos_dir)
        qphrases = docs.where(F.col("doc_id") < 200).select(
            F.col("doc_id").alias("phrase_id"),
            F.concat_ws(" ", F.slice(tokens_col("text"), 1, 3)).alias("text"),
        )

    # build-once for the persisted-path IVF-PQ probe row: cells/codes/
    # codebooks land on disk untimed; the row times ONLY the cell-gated
    # ADC serving path over the loaded tables
    want_pq_probe = only is None or "ann_ivfpq_probe" in only
    if want_pq_probe:
        from swarm_spark.ops.ivf import build_ivf
        from swarm_spark.ops.pq import (
            load_ivfpq,
            pq_encode,
            pq_probe_cells,
            pq_train,
            save_ivfpq,
        )

        pq_dir = os.path.join(data_dir, "pq_ix")
        if not os.path.exists(os.path.join(pq_dir, "codebooks")):
            a, c = build_ivf(emb, n_cells=8 * factor, iters=3)
            books = pq_train(emb, m=4, k=16, iters=2)
            save_ivfpq(pq_encode(emb, books, m=4).join(a, "id"), c, books, pq_dir)
        pq_codes, pq_cent, pq_books = load_ivfpq(spark, pq_dir)

    # governance-tier forcing aggregations: a bare count() could let
    # Catalyst prune a cardinality-preserving broadcast join out of the
    # plan, timing a scan instead of the operator
    def _bloom():
        bloom = build_block_bloom(
            docs.where(F.col("doc_id") % 2 == 0), "text",
            n_blocks=256 * factor, k=4,
        )
        return bloom_contains(
            docs, bloom, "text", n_blocks=256 * factor, k=4
        ).agg(F.sum(F.col("might_contain").cast("long")).alias("n"))

    def _nb():
        model = nb_train_quality(
            docs, F.col("lang") == "en", num_buckets=4096
        )
        return nb_score_quality(docs, model, num_buckets=4096).agg(
            F.sum("score_micro").alias("s")
        )

    def _bpe():
        # train is vocab-histogram bounded (this 31-token soup saturates
        # the word vocab, so merge rounds cost the same at any N); the
        # corpus-sized stages are the histogram build and the counts
        # fold against the vocab-sized segmentation map
        from swarm_spark.ops.bpe import (
            bpe_token_counts,
            bpe_train,
            bpe_word_histogram,
        )

        _, seg = bpe_train(bpe_word_histogram(docs), n_merges=24)
        return bpe_token_counts(docs, seg_map=seg).agg(
            F.sum("n_bpe").alias("s"), F.count(F.lit(1)).alias("n")
        )

    def _lm():
        # counts-only train on the en slice + token-stream scoring
        # against three vocab-sized equi-joins — both stages scan-bound
        from swarm_spark.ops.lm import lm_perplexity, lm_train

        model = lm_train(docs.where(F.col("lang") == "en"))
        return lm_perplexity(docs, model).agg(
            F.sum("cost_micro").alias("s"), F.count(F.lit(1)).alias("n")
        )

    def _lm5():
        # order-5 CCNet operating point: same one-scan fused train,
        # 2n-1 = 9 vocab-sized scoring joins — the cost of order is
        # join COUNT (flat in corpus), so expect the bigram row's slope
        from swarm_spark.ops.lm import lm_perplexity, lm_train

        model = lm_train(docs.where(F.col("lang") == "en"), order=5)
        return lm_perplexity(docs, model, order=5).agg(
            F.sum("cost_micro").alias("s"), F.count(F.lit(1)).alias("n")
        )

    def _gopher_rep():
        # the FULL paper set (top 2-4 + dup 5-10): nine gram tiers on
        # ONE (n, pos, gram) explode — growth should track the token
        # stream, not tiers x corpus
        from swarm_spark.ops.curation import gopher_repetition

        return gopher_repetition(docs).agg(
            F.sum("top2_frac_micro").alias("a"),
            F.sum("dup10_frac_micro").alias("b"),
        )

    def _curate_gates_on(src):
        # the gate chain (exact dedup -> Gopher rules -> repetition) —
        # split out so the bucketed A/B can count ITS exchanges (the
        # by-id gate joins live here, before the staging checkpoint)
        from swarm_spark.ops.curation import gopher_gate, gopher_repetition_gate
        from swarm_spark.ops.dedup import exact_dedup_text

        return gopher_repetition_gate(
            gopher_gate(
                exact_dedup_text(src.select("doc_id", "text")),
                min_words=30,
                stopwords=("the", "a", "table", "value"),
            ),
            top_ns=(2, 3),
            dup_ns=(5, 8),
        )

    def _curate_modern_on(src):
        # the composed published-recipe pipeline (exact dedup ->
        # Gopher rules -> repetition gate -> ExactSubstr cut): the
        # end-to-end pass a pretraining corpus pays per refresh
        from swarm_spark.ops.curation import exactsubstr_cut

        kept = _curate_gates_on(src).localCheckpoint(eager=True)
        return exactsubstr_cut(kept, min_len=8).agg(
            F.sum("n_removed").alias("rm"),
            F.sum(F.length("text_clean")).alias("chars"),
        )

    def _curate_modern():
        return _curate_modern_on(docs)

    def _curate_ccnet():
        # the CCNet composition end to end (the corpus_curate_ccnet
        # registry row's stages): lang-id -> ONE grouped train pass
        # -> ONE grouped scoring pass -> per-language terciles. The
        # interesting exponent is the grouped train+score: both are
        # token-stream-linear by design (train is one map-side-
        # combined aggregation; scoring is 2*order-1 vocab-sized
        # equi-joins against the token stream), and the tercile pass
        # is histogram-sized. The agg forces the bucket labels to
        # materialize.
        from swarm_spark.ops.lm import (
            lm_buckets_scored,
            lm_perplexity_by,
            lm_train_by,
        )
        from swarm_spark.ops.text import language_pred_expr

        # r14: mirror the registry row's reuse barriers (the q_ builder
        # persists the lang-id projection, the grouped model and the
        # scored frame — each is read by 2-5 downstream consumers);
        # the probed exponent is the row's ACTUAL plan shape. The
        # persists are dropped per run by the probe's clearCache.
        par = spark.sparkContext.defaultParallelism
        d = (
            docs.repartition(par)
            .select(
                "doc_id", "text", language_pred_expr("text").alias("pred_lang")
            )
            .persist()
        )
        model = lm_train_by(d, group_col="pred_lang", order=3).persist()
        scored = lm_perplexity_by(
            d, model, group_col="pred_lang", order=3
        ).persist()
        return (
            lm_buckets_scored(scored, group_col="pred_lang")
            .where(F.col("bucket") != "tail")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("avg_micro").alias("s"),
            )
        )

    def _exactsubstr_wave():
        # incremental serving shape: a FIXED 5k-doc wave cut against
        # this corpus's full ledger — the wave cost must track the
        # wave + the ledger probe, never the stored corpus rescan
        from swarm_spark.ops.curation import (
            exactsubstr_cut_wave,
            exactsubstr_window_stats,
        )

        stored = exactsubstr_window_stats(docs, min_len=8)
        wave = docs.where(F.col("doc_id") < 5000).select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
        )
        return exactsubstr_cut_wave(wave, stored, min_len=8).agg(
            F.sum("n_removed").alias("rm"), F.count(F.lit(1)).alias("n")
        )

    def _exactsubstr():
        # ExactSubstr keep-one span removal: position explode + the
        # md5(window) group-by (count/min monoids) + coverage explode
        # bounded by the DUPLICATED mass + per-doc rebuild; the agg
        # forces the rebuilt text to materialize (column pruning would
        # otherwise drop the concat and undertime the op)
        from swarm_spark.ops.curation import exactsubstr_cut

        return exactsubstr_cut(docs, min_len=8).agg(
            F.sum("n_removed").alias("rm"),
            F.sum(F.length("text_clean")).alias("chars"),
        )

    # co-bucketed vs flat by-id join: the SAME two datasets stored
    # twice — flat parquet pair vs same-bucketed catalog tables — so
    # the pair isolates the exchange (both sides hint merge). Writes
    # are untimed build-once; catalog tables re-register per session.
    want_bkt = only is None or bool(
        {"join_by_id_flat", "join_by_id_bucketed", "corpus_curate_modern_bkt"}
        & (only or set())
    )
    if want_bkt:
        from swarm_spark.ops.layout import bucketed_join, write_bucketed
        from swarm_spark.ops.text import token_stats

        bdir = os.path.join(data_dir, "bucketed")
        stats = token_stats(docs)
        tdocs, tstats = f"bkt_docs_f{factor}", f"bkt_stats_f{factor}"
        write_bucketed(docs, tdocs, os.path.join(bdir, "docs"), 32)
        write_bucketed(stats, tstats, os.path.join(bdir, "stats"), 32)
        if not os.path.exists(os.path.join(bdir, "docs_flat")):
            docs.write.mode("overwrite").parquet(os.path.join(bdir, "docs_flat"))
            stats.write.mode("overwrite").parquet(os.path.join(bdir, "stats_flat"))
        fd = spark.read.parquet(os.path.join(bdir, "docs_flat"))
        fs = spark.read.parquet(os.path.join(bdir, "stats_flat"))

    ops = {
        "dedup_ngram_jaccard": lambda: ngram_jaccard_pairs(
            docs, threshold=0.8, max_df=100 * factor
        ),
        "dedup_minhash_lsh": lambda: minhash_lsh_pairs(
            docs, num_perm=12, bands=4, max_df=100 * factor
        ),
        "dedup_semantic": lambda: semantic_dup_pairs(
            emb, n_cells=8 * factor, iters=3, threshold=0.35
        ),
        "ann_topk_ivf": lambda: ann_topk_ivf(
            emb, queries, k=5, n_cells=8 * factor, nprobe=4, iters=3
        ),
        # governance tier (r7 VERDICT task #5): the new operators with
        # the most interesting shuffle shapes, production knob scaling
        # (bloom blocks grow with the corpus; top_k/quantile grids and
        # the NB bucket count are scale-invariant by design)
        "corpus_top_ngrams": lambda: top_ngrams(
            docs, n=5, top_k=20, min_count=2
        ),
        "corpus_tok_quantiles": lambda: group_value_quantiles(
            docs.select(
                "lang", F.size(tokens_col("text")).cast("long").alias("n_tok")
            ),
            "lang",
            "n_tok",
        ),
        "dedup_bloom_gate": _bloom,
        # BPE train+counts and LM perplexity train+score (r10): the two
        # newest text tiers, probed end-to-end at production shape
        "text_bpe_counts": _bpe,
        "text_lm_ppl": _lm,
        "text_lm_ppl5": _lm5,
        "dedup_exactsubstr": _exactsubstr,
        "text_gopher_repetition": _gopher_rep,
        "corpus_curate_modern": _curate_modern,
        "corpus_curate_ccnet": _curate_ccnet,
        # the same composition over the co-bucketed doc store (r11
        # VERDICT #6): the by-id gate semi-joins satisfy their
        # distribution from the LAYOUT; the pair isolates what the
        # one-time bucketed write buys every curation refresh
        "corpus_curate_modern_bkt": (
            (lambda: _curate_modern_on(spark.table(tdocs)))
            if want_bkt
            else _curate_modern
        ),
        "dedup_exactsubstr_wave": _exactsubstr_wave,
        "join_by_id_flat": lambda: fd.hint("merge")
        .join(fs.hint("merge"), "doc_id")
        .agg(F.sum("n_tokens").alias("s"), F.count(F.lit(1)).alias("n")),
        "join_by_id_bucketed": lambda: bucketed_join(spark, tdocs, tstats)
        .agg(F.sum("n_tokens").alias("s"), F.count(F.lit(1)).alias("n")),
        "sample_shuffle_order": lambda: global_shuffle_order(
            docs.select("doc_id"), "doc_id"
        ),
        "text_nb_quality": _nb,
        # frequency-sketch build: one explode + one <= depth*width-row
        # map-side-combined shuffle (grid literal-bounded, like the NB
        # buckets); the agg forces the full grid to materialize
        "corpus_cms": lambda: cms_sketch(
            docs.select(F.explode(tokens_col("text")).alias("tok")), "tok",
            width=512, depth=3,
        ).agg(F.sum("cnt").alias("s"), F.count(F.lit(1)).alias("cells")),
        # retrieval tier (r9): the persisted-index BM25 probe (zero
        # corpus text reads — serving cost) and the composed IVF-PQ
        # build+search with n_cells ∝ N, PQ codebook scale-invariant
        "bm25_topk": lambda: bm25_topk(
            None, qdocs, k=5, postings=lpost, stats=lstats, totals=ltot
        ),
        # query-likelihood ranker over the SAME persisted bm25 index
        # (cf folds from the postings; totals from the stored stat)
        "lm_topk": lambda: lm_topk(
            None, qdocs, k=5, postings=lpost, totals=ltot
        ),
        # MaxScore-pruned probes over the same persisted index + the
        # (tok, max_tf) bounds table: on this SATURATED vocab the
        # unpruned gate admits |Q|*N pairs (the 3.9x/3.1x rows above);
        # pruning drops non-essential (high-df, low-impact) terms from
        # candidate generation — the r9 VERDICT task #2 lever, measured
        "bm25_pruned": lambda: bm25_pruned(
            None, qdocs, k=5,
            postings=lpost, stats=lstats, totals=ltot, bounds=lbounds,
        ),
        "lm_pruned": lambda: lm_pruned(
            None, qdocs, k=5, postings=lpost, totals=ltot, bounds=lbounds
        ),
        # the Zipfian mixed-vocab pair: same persisted-index probe
        # shape, exhaustive vs MaxScore-pruned — rare-tail idf makes
        # the common terms non-essential, so the pruned probe's
        # candidates follow the rare posting lists
        "bm25_zipf": lambda: bm25_topk(
            None, qzipf, k=5, postings=zlpost, stats=zlstats, totals=zltot
        ),
        "bm25_pruned_zipf": lambda: bm25_pruned(
            None, qzipf, k=5,
            postings=zlpost, stats=zlstats, totals=zltot, bounds=zlbounds,
        ),
        # the three-tier keyword pair: short queries (stopword + mid-df
        # 3-gram + rare 5-gram) over the df-spectrum corpus — exhaustive
        # admits df(stopword) ~ N candidates per query; MaxScore seeds
        # theta from the two selective terms (seed_terms=2), the
        # stopword goes non-essential, candidates follow the mid tier
        "bm25_kw": lambda: bm25_topk(
            None, qkw, k=5, postings=klpost, stats=klstats, totals=kltot
        ),
        "bm25_pruned_kw": lambda: bm25_pruned(
            None, qkw, k=5, seed_terms=2,
            postings=klpost, stats=klstats, totals=kltot, bounds=klbounds,
        ),
        "lm_kw": lambda: lm_topk(
            None, qkw, k=5, postings=klpost, totals=kltot
        ),
        "lm_pruned_kw": lambda: lm_pruned(
            None, qkw, k=5, seed_terms=2,
            postings=klpost, totals=kltot, bounds=klbounds,
        ),
        # the serving-regime pair: 10x the query batch on the same
        # corpus/index — exhaustive aggregation volume is |Q|-linear,
        # pruned candidates follow the selective terms' posting lists
        "bm25_kw_qheavy": lambda: bm25_topk(
            None, qkw_heavy, k=5, broadcast_max_queries=25_000,
            postings=klpost, stats=klstats, totals=kltot,
        ),
        "bm25_pruned_kw_qheavy": lambda: bm25_pruned(
            None, qkw_heavy, k=5, seed_terms=2, broadcast_max_queries=25_000,
            postings=klpost, stats=klstats, totals=kltot, bounds=klbounds,
        ),
        # the hot-distribution serving pair: same 20k-row batch drawn
        # from a 200-query working set, flat index vs tok-bucketed
        # index with the probe's bucket filter (the prune collect is
        # timed — probe cost, like the phrase bkt row)
        "bm25_pruned_kw_hot": lambda: bm25_pruned(
            None, qkw_hot, k=5, seed_terms=2, broadcast_max_queries=25_000,
            postings=klpost, stats=klstats, totals=kltot, bounds=klbounds,
        ),
        "bm25_pruned_kw_hot_bkt": lambda: bm25_pruned(
            None, qkw_hot, k=5, seed_terms=2, broadcast_max_queries=25_000,
            postings=_ptbk(
                klpostb,
                qkw_hot.select(
                    F.explode(F.split("text", " +")).alias("tok")
                ).distinct(),
                64,
            ),
            stats=klstatsb, totals=kltotb, bounds=klboundsb,
        ),
        # exact-phrase probe over the persisted positional index —
        # this saturated 31-token vocab is the worst case (every
        # phrase term occurs everywhere, so candidates ∝ positions)
        "phrase_match": lambda: phrase_match(
            None, qphrases, postings=lpos
        ),
        # the L-gram equi-join scale path: candidates are exactly the
        # hits, so the saturated vocab costs one explode + one join
        "phrase_grams": lambda: phrase_match_grams(docs, qphrases),
        # rare-term-first gating over the same persisted positional
        # index — the general-path fix for the 15.9x row: candidates
        # follow the phrase's MIN-frequency posting list, not the sum
        "phrase_rare": lambda: phrase_match_rare(None, qphrases, postings=lpos),
        "phrase_zipf": lambda: _pm(None, zphrases, postings=zlpos),
        "phrase_rare_zipf": lambda: phrase_match_rare(
            None, zphrases, postings=zlpos
        ),
        # tok-bucketed layout: the probe partition-prunes the postings
        # scan to its query terms' buckets BEFORE anything joins — the
        # layout lever for the scan-emission floor the unbucketed rare
        # row keeps paying (the bucket collect is timed: probe cost)
        "phrase_rare_zipf_bkt": lambda: phrase_match_rare(
            None,
            zphrases,
            postings=_ptb(
                zlposb,
                zphrases.select(F.explode(F.split("text", " +")).alias("tok")),
                64,
            ),
        ),
        "ann_topk_ivfpq": lambda: ann_topk_ivfpq(
            emb, queries, k=5, n_cells=8 * factor, nprobe=4, cell_iters=3,
            m=4, pq_k=16, pq_iters=2,
        ),
        # probe-ONLY serving cost over the persisted index (what a
        # deployment actually pays per batch; the build amortizes away)
        "ann_ivfpq_probe": lambda: pq_probe_cells(
            pq_codes, pq_cent, queries, pq_books, k=5, nprobe=4, m=4
        ),
        # the auto df cap control (r8 VERDICT #3 encoded): the cap is
        # derived from the measured df histogram, so on this SATURATED
        # 31-token vocab it must track the held-cap linear behavior,
        # not the max_df ∝ N quadratic row above
        "dedup_ngram_auto_cap": lambda: ngram_jaccard_pairs(
            docs, threshold=0.8, max_df=auto_max_df(docs)
        ),
        # HLL register build: one codegen projection + one map-side-
        # combined shuffle whose output is LITERAL-bounded (<= 2^p
        # registers) — the cardinality member of the mergeable-
        # statistic family; expect scan-growth-only like corpus_cms
        "corpus_hll": lambda: hll_registers(doc_shingles(docs, n=3), "sh").agg(
            F.count(F.lit(1)).alias("regs"), F.sum("rho").alias("s")
        ),
        # all-pairs TF-IDF cosine on the SPARSE 5-gram-unit view: df
        # stays O(dup-cluster size) at both scales, so the inverted-
        # index gate admits only true-duplicate candidates — the
        # Zipf-tail shape real corpora have; cap held at 100 (the
        # recall floor: > any dup cluster), expect ~linear
        "similarity_tfidf_pairs": lambda: tfidf_cosine_pairs(
            _gram_docs(docs, 5), threshold_micro=500_000, max_df=100
        ),
        # the saturation worst case: at f10 the 31^3 trigram space is
        # FULLY populated (all 29,791 keys, df ~ Poisson(84), max 124),
        # so candidates sum(df^2) grow 92x at 10x rows and NO df cap
        # helps (the cap can't separate rare from common when nothing
        # is rare) — the auto_max_df dilemma, measured for this op
        "similarity_tfidf_saturated": lambda: tfidf_cosine_pairs(
            _gram_docs(docs, 3), threshold_micro=500_000, max_df=100 * factor
        ),
        # the encoded fix, measured on the same saturated corpus: the
        # histogram-budget auto cap stays ~sqrt-scale when every df
        # grows with N, keeping the candidate join linear (recall on a
        # saturated space is impossible by rarity either way — the
        # auto_max_df dilemma; the row shows COST stays bounded)
        "similarity_tfidf_autocap": lambda: tfidf_cosine_pairs(
            _gram_docs(docs, 3), threshold_micro=500_000, max_df="auto"
        ),
        # temperature mix: metadata-sized quota pass + the two-phase
        # salted rank (the stratified_cap machinery with per-stratum
        # caps broadcast in); budget scales with the corpus so the
        # kept set grows too — expect ~linear in rows
        "sample_temperature": lambda: sample_temperature(
            docs, "lang", "doc_id", budget=500 * factor
        ),
        # A-ES exact-n weighted sampling (the one sampler without a
        # measured row, r9 VERDICT #7): one codegen clock projection +
        # the salted two-phase global top-n (phase 2 ranks <= n_salts*n
        # rows, a literal) — expect scan-growth-only, n fixed
        "sample_weighted_exact": lambda: weighted_sample_exact(
            docs.select("doc_id", (F.col("n_chars") + 1).alias("w")),
            "w",
            "doc_id",
            n=500,
        ),
        # Z-order layout stats: pure bit-arithmetic projection + a
        # 256-group aggregation — the write-side layout cost sans IO
        "layout_zorder": lambda: zorder_bucket_stats(
            docs.select(
                (F.col("doc_id") % 256).alias("x"),
                (F.col("n_chars") % 256).alias("y"),
            ),
            "x",
            "y",
            bits=8,
            bucket_bits=4,
        ),
    }
    if only is not None:
        ops = {k: v for k, v in ops.items() if k in only}
    out: dict[str, float] = {}
    for name, build in ops.items():
        build().collect()  # untimed warm-up (plan compilation/codegen)
        samples = []
        for _ in range(runs):
            # bench.py methodology (r14): ops that persist reused
            # frames (the ccnet row's barriers) must re-do their own
            # work each sample, not read the previous sample's cache.
            # The probe's long-lived fixtures are localCheckpoints /
            # plain parquet reads, which clearCache does not touch.
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            n = build().count()
            samples.append(time.perf_counter() - t0)
        out[name] = round(sorted(samples)[len(samples) // 2], 2)
        print(f"  f{factor} {name}: {out[name]} s ({n} rows)", flush=True)
    if want_bkt and {"corpus_curate_modern", "corpus_curate_modern_bkt"} <= set(
        ops
    ):
        # exchange-count evidence for the curate A/B: the by-id gate
        # joins live in the PRE-staging chain, so count there
        for nm, src in (
            ("corpus_curate_modern", docs),
            ("corpus_curate_modern_bkt", spark.table(tdocs)),
        ):
            gf = _curate_gates_on(src).agg(F.count(F.lit(1)).alias("n"))
            gf.collect()
            plan = (
                gf._jdf.queryExecution()
                .executedPlan()
                .toString()
                .split("+- == Initial Plan ==")[0]
            )
            print(
                f"  f{factor} {nm} gate-chain exchanges: "
                f"{plan.count('Exchange')}",
                flush=True,
            )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument(
        "--only", default="",
        help="comma list of operator names to probe (default: all)",
    )
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scale_dir = os.path.join(root, ".scale")
    for f in (1, args.factor):
        d = os.path.join(scale_dir, f"f{f}")
        if not os.path.exists(os.path.join(d, "embeddings.parquet")):
            print(f"generating f{f} ({BASE_DOCS * f} docs)...", flush=True)
            generate(d, f)

    from swarm_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="swarm-scale-probe", master=f"local[{cpus}]")
    spark.range(1000).count()
    results = {}
    for f in (1, args.factor):
        print(f"probing f{f}...", flush=True)
        results[f] = probe(spark, os.path.join(scale_dir, f"f{f}"), f, args.runs, only)
    ratios = {
        name: round(results[args.factor][name] / max(results[1][name], 1e-9), 2)
        for name in results[1]
    }
    print(
        json.dumps(
            {
                "factor": args.factor,
                "load_1m": round(os.getloadavg()[0], 2),
                "f1_sec": results[1],
                f"f{args.factor}_sec": results[args.factor],
                "wall_ratio": ratios,
            },
            indent=1,
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
