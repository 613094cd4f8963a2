"""Plan-assertion sweep: every registry query's physical plan is free
of the node shapes that break at 100-TB scale.

Rules (checked on the executed-plan string at sf0.001):

- **No CartesianProduct** anywhere. A cartesian join shuffles both
  sides everywhere; nothing in the engine needs one.
- **No BroadcastNestedLoopJoin**, except where the build side is
  bounded by a LITERAL (documented allowlist below): a BNLJ streams
  the probe side against an O(1)-size broadcast, which is the designed
  shape for centroid assignment and 1-row-total attachment — but
  against an unbounded build side it is quadratic.
- **Exchange SinglePartition only as aggregate finalization**: its
  child must be a partial/merge aggregate (one row per upstream task)
  or a limit/top-k (bounded by a literal). A single-partition exchange
  over raw rows — a global sort, a partitionBy-less window over the
  corpus — serializes the whole dataset through one task.
- **Scan budget**: each query is EXECUTED and the number of
  ``Scan parquet`` nodes in the AQE *final* plan (the stages that
  actually ran; ReusedExchange leaves hide their reused subtree, and
  the ``== Initial Plan ==`` echo is stripped) must not exceed a
  per-query budget. This catches a regression that silently
  duplicates an expensive subtree — e.g. a self-join side that stops
  reusing the signature exchange and recomputes the whole
  shingle pipeline — structurally, instead of waiting for a bench
  anomaly (the round-5 ``dedup_minhash_lsh`` finding).
"""

from __future__ import annotations

import os
import re

import pytest

from swarm_spark.classical_queries import CLASSICAL
from swarm_spark.ops_queries import OPS
from swarm_spark.queries import CORE

ALL = {**CORE, **OPS, **CLASSICAL}

# BNLJ build sides bounded by construction:
# - ann_topk_bruteforce: the intentional exact verifier — broadcast
#   query set (n_queries literal) against the corpus.
# - ann_topk_ivf / ann_ivf_recall: nearest-centroid assignment has no
#   equi-key (argmin over k centroids); build side is k x dim floats,
#   k a literal. ann_ivf_recall additionally embeds the brute-force
#   verifier as its ground truth.
# - corpus_vocab: crossJoin(broadcast(total)) attaches a 1-row global
#   sum to the top-k frame.
# - knn_classify: embeds the ann_topk_bruteforce verifier (broadcast
#   query set, |Q| literal) before the label vote.
# - ann_ivf_cells: k-means assignment's argmin over k centroids (k a
#   literal), same bounded build side as ann_topk_ivf.
# - ann_ivf_assign_wave: the incremental wave assignment is the same
#   argmin over k frozen centroids (k a literal).
# - text_surprisal: crossJoin(broadcast(total)) attaches the 1-row
#   corpus token total to the vocab frame.
BNLJ_ALLOWED = {
    "ann_ivf_assign_wave",
    "ann_ivf_cells",
    "corpus_distinct_sketch",  # crossJoin(broadcast(1-row exact count))
    "corpus_sketch_incremental",  # crossJoins of three 1-row estimates
    "ann_topk_bruteforce",
    "ann_mmr_rerank",  # embeds the ann_topk_bruteforce shortlist
    #   (broadcast query set, |Q| literal); the MMR stages themselves
    #   are equi-joins over the k-bounded shortlist
    "hybrid_rrf",  # embeds the ann_topk_bruteforce verifier (broadcast
    #   query set, |Q| literal) as its semantic rank list
    "dedup_semantic",
    "dedup_semantic_keep",
    "dedup_semantic_text",
    "ann_topk_dot",
    "ann_topk_int8",
    "ann_topk_ivf",
    "ann_topk_ivfpq",  # centroid-argmin crossJoin (n_cells-row broadcast)
    "ann_ivfpq_residual",  # same centroid-argmin crossJoin, twice
    #   (IVF assignment + per-query probe ranking)
    "ann_ivf_recall",
    "corpus_mixture_plan",  # crossJoin(broadcast(1-row min budget))
    "dedup_minhash_recall",  # crossJoin(broadcast(1-row true-pair count))
    "dedup_signlsh_recall",  # kmeans argmin + 1-row true-pair attach
    "corpus_vocab",
    "corpus_vocab_incremental",  # same 1-row total attach as corpus_vocab
    "knn_classify",
    "text_surprisal",
    "corpus_hll_distinct",  # crossJoins of 1-row exact count + 1-row
    #   register-diff count onto the 1-row estimate
    "sample_weighted",  # crossJoin(broadcast(1-row corpus weight total))
}

# Max "Scan parquet" nodes in the executed final plan. Default 2
# covers every single-table query (1 scan) plus the designed
# two-branch shapes: DF-prune's stats branch (minhash/jaccard — the
# judge-set bar is exactly ≤ 2 there), a dim join, an anti-join
# against a second table. Queries legitimately above 2 are pinned at
# their observed count (sf0.001, AQE on) so any growth still fails:
# - text_decontaminate (3): docs + benchmark-table 5-gram semi-join
# - text_strip_segments (3): docs + segment-stats + anti-join branch
# - ann_topk_ivf (4): embeddings scanned for centroids kmeans iter +
#   assignment + probe (queries frame)
# - set_ops (4): two tables × two set operands
# - serve_pubsub_e2e (5): multi-source end-to-end
# - ann_ivf_recall (6): IVF path + embedded brute-force ground truth
_SCAN_BUDGET_DEFAULT = 2
_SCAN_BUDGET = {
    "text_lm_perplexity": 3,  # the in-plan trained model is consumed
    #   under two group-key filters (uni / bi) that Catalyst pushes
    #   BELOW the fused training aggregation — two narrower scans
    #   instead of one reused exchange (a net win: each reads less) —
    #   plus the scoring token stream; production probes a SAVED model
    #   (`save_lm`) at 1 scan
    "text_lm_merge": 5,  # the same pushed-filter train shape × two
    #   waves + the scoring stream — the wave-fold == retrain oracle
    #   composition; production folds persisted count tables at 0
    #   corpus scans
    "text_lm_gate": 4,  # pushed-filter train (2) + scoring stream +
    #   the docs passthrough the semi-join preserves
    "text_lm_eval": 4,  # pushed-filter train (2, even slice) + the
    #   odd-slice scoring stream + the label projection
    "text_lm_trigram": 3,  # the order-3 twin of text_lm_perplexity:
    #   identical scan shape (the extra trigram num/den joins all
    #   reuse the one fused-train exchange — only the pushed uni/gram
    #   filter split and the scoring stream read the table)
    "text_lm_eval3": 4,  # the order-3 twin of text_lm_eval — same
    #   pushed-filter train (2) + scoring stream + label projection
    "corpus_curate_ccnet": 5,  # the fused lang-id + grouped-train +
    #   grouped-score + tercile composition: the in-plan grouped model
    #   is consumed under pushed group-key filters (uni / grams tiers,
    #   the text_lm_trigram shape) and the tercile pass re-consumes the
    #   scored subtree (the text_lm_buckets shape); production persists
    #   the per-language models (save_lm of the grouped frame) and the
    #   scored table, paying 1 scoring scan per refresh
    "text_lm_buckets": 5,  # the tercile pass consumes the scored
    #   subtree TWICE (per-language histogram, then the bucket
    #   labeling the broadcast thresholds join back into) — each pass
    #   is the text_lm_perplexity shape with partial exchange reuse;
    #   production scores once into a saved frame and buckets at 1
    "dedup_exactsubstr_cut": 3,  # token-position stream + the L-window
    #   subtree consumed TWICE (the canonical-min group-by and the
    #   occurrence probe it joins back to): partial aggregation below
    #   the group-by exchange keeps hot boilerplate grams skew-safe,
    #   which forgoes exchange reuse between the two consumers —
    #   production cuts over a persisted positional index at 1 scan
    "dedup_exactsubstr_incremental": 7,  # the equivalence-pin
    #   composition runs BOTH eras in one plan: wave-1 one-shot cut
    #   (3, see dedup_exactsubstr_cut) + the wave-1 ledger build (1)
    #   + wave-2 stream (1) + wave-2 windows consumed twice (2).
    #   Production never pays the first four: the ledger is persisted
    #   and only the arriving wave is scanned (3 wave-sized scans)
    "dedup_semantic_keep": 3,  # pair graph (cells + cosine) + the
    #   corpus frame the anti-join preserves
    "knn_classify": 3,  # embeddings as corpus + broadcast queries + label dim
    "text_bigram_surprisal": 3,  # unigram stats + bigram stats + scoring
    "bm25_topk": 4,  # the fused ad-hoc shape, cache-free: postings
    #   docs scan + totals docs scan + the TWO query-side projections
    #   (batch vocab for the postings restriction, per-query terms) —
    #   production probes a SAVED index (postings/stats/totals) at 1
    #   query-side scan and zero text reads. (The old budget of 3 was
    #   cross-test cache pollution — see the clearCache note below.)
    "bm25_topk_kw": 4,  # same fused shape over the kw-derived corpus
    "lm_topk": 4,  # same inverted-index shape: postings + totals +
    #   batch-vocab + per-query-term scans; production = saved index
    "lm_topk_kw": 4,  # the kw twin of lm_topk
    "phrase_match": 3,  # positional postings + the phrase batch + its
    #   plen branch; production probes a SAVED positional index at 2
    "ann_mmr_rerank": 3,  # brute-force shortlist (corpus + query
    #   branch) + the member-vector fetch for the pairwise sims
    "text_decontaminate": 3,
    "text_strip_segments": 3,
    "ann_ivf_assign_wave": 3,  # build (assignment + centroid join) + wave
    "corpus_sketch_incremental": 3,  # even + odd wave bitmaps + the
    #   full-recompute bitmap the contract compares against (the diff
    #   join reuses the bitmap exchanges)
    "corpus_quantiles_incremental": 3,  # even + odd wave histograms +
    #   the full-recompute quantiles the merge contract compares against
    "corpus_hll_distinct": 4,  # even + odd wave registers + the
    #   full-recompute registers + the exact-distinct branch the
    #   accuracy contract compares against (production keeps only the
    #   1-scan register build; the other three scans ARE the oracle's
    #   merge/accuracy cross-checks)
    "ann_ivf_cells": 4,
    "ann_pq_rerank": 4,  # encode + LUT queries + rerank vector fetch +
    #   rerank query side (production materializes the codes, so the
    #   fused 4-scan shape exists only in this oracle composition)
    "ann_topk_ivfpq": 5,  # IVF assignment + PQ encode + probe queries +
    #   LUT queries + centroid branch — the fused build+probe oracle
    #   composition; production materializes (id, cell, codes) once
    #   and probes pay 2 scans
    "ann_ivfpq_residual": 6,  # the ivfpq fused shape + one residual
    #   branch (corpus rejoined to its assignment); production
    #   materializes (id, cell, codes) once and probes pay 2 scans
    "ann_topk_ivf": 4,
    "dedup_minhash_recall": 4,  # jaccard truth (2-scan shape) + the
    #   embedded minhash candidate generator (2-scan shape)
    "dedup_signlsh_recall": 4,  # semantic truth (hashed vectors +
    #   kmeans) + the sign-LSH candidate generator
    "funnel_steps": 4,  # 3 predicate-pushed stage scans (view/click/
    #   purchase) + the view-stage aggregate feeding both the click
    #   chain and the stage-count join
    "set_ops": 4,
    "hybrid_rrf": 6,  # the bm25 4-scan fused shape + embeddings corpus
    #   + embeddings query batch for the semantic list
    "text_nb_eval": 3,  # train scan (even half) + holdout scoring scan
    #   + the (doc_id, lang)-pruned label projection the confusion join
    #   re-reads (ReadSchema is two columns — metadata-cheap)
    "streaming_postings_e2e": 4,  # the three appended ledgers
    #   (postings / df stats / totals) + the docs scan that builds the
    #   probe batch; the raw corpus is absent from the probe plan
    "streaming_bounds_e2e": 5,  # the four appended ledgers (postings /
    #   stats / totals / bounds) + the docs scan for the probe batch —
    #   observed 3 at sf0.001 (the routing gates consume totals/bounds
    #   in their own metadata actions and AQE reuses the postings
    #   exchange), but the split between gate actions and the final
    #   plan is routing-dependent, so the pin is the full-ledger shape
    "phrase_match_rare": 6,  # the fused ad-hoc shape re-derives the
    #   positional postings per pass (vocab frequency stat + gate join
    #   + the two verify-side posting branches) + the phrase batch;
    #   production probes the SAVED positional index (postings=...,
    #   zero text reads — same contract as phrase_match's probe test)
    "bm25_pruned": 5,  # the MaxScore passes each re-derive postings
    #   from text in the fused ad-hoc oracle shape: seed pairs + seed
    #   exact scores + candidate pairs + candidate exact scores + the
    #   query batch (df stats/bounds branches are exchange-reused);
    #   production probes the SAVED index (postings/stats/totals/
    #   bounds) with ZERO text reads — pinned by test_retrieval's
    #   pruned persisted-probe plan test
    "lm_pruned": 5,  # same fused shape (min_dl folds into a reused
    #   postings exchange); production = saved-index probe, zero text
    "bm25_pruned_idx": 5,  # persisted-index probe: the 4 stored index
    #   tables + the docs scan that builds the kw query batch; at
    #   sf0.001 the volume gates route exhaustive (observed 3 — AQE
    #   reuses the postings/bounds exchanges), at sf0.1 the pruned
    #   path engages (TestPrunedPathEngages pins it) with the same
    #   stored-table-only scan set
    "lm_pruned_idx": 6,  # same probe + the cf derivation re-reads the
    #   stored postings once (observed 4 at sf0.001)
    "bm25_incremental": 5,  # two wave-postings builds + per-wave df
    #   stats/totals branches (AQE reuses two of the exchanges) + the
    #   query batch — the fused build+fold+probe oracle composition;
    #   production probes the SAVED index at <= 3 scans and zero text
    #   reads (pinned by test_retrieval's persisted-index plan test)
    "serve_pubsub_e2e": 5,
    "ann_ivf_recall": 6,
    "corpus_curate_ccnet_idx": 21,  # the persisted-model serving
    #   shape: 18 of the scans are the STORED grouped count tables
    #   (vocab-sized parquet, each a pushed-filter narrow read —
    #   metadata-priced at 100 TB, the bm25_pruned_idx stored-table
    #   precedent) and only 3 are corpus-sized documents reads (the
    #   scoring token stream + the tercile double-consumption) —
    #   bounded by TestCcnetIdxServesStoredModel below
}

def _node_col(line: str) -> int:
    """Column where a plan line's node text starts (past the tree
    drawing characters) — children of a node start strictly to its
    right in Spark's toString rendering."""
    i = 0
    while i < len(line) and line[i] in " :+-|":
        i += 1
    return i


_EXPR_ID = re.compile(r"#\d+L?")


def _count_executed_scans(final: str) -> int:
    """``Scan parquet`` occurrences that actually EXECUTE. A scan
    outside any cached subtree runs once per occurrence. A scan inside
    an ``InMemoryRelation`` subtree is the cached plan's LINEAGE,
    printed verbatim at every ``InMemoryTableScan`` consumer but
    executed only at the one materialization — count each DISTINCT
    cached lineage (expression ids stripped; the CacheManager
    canonicalizes identical plans to one entry) once, not per consumer
    print (r14: the kw-corpus persist barrier made the textual count
    exceed the executed count)."""
    lines = final.splitlines()
    n = 0
    cached: dict[str, int] = {}
    i = 0
    while i < len(lines):
        line = lines[i]
        pos = line.find("InMemoryRelation")
        if pos < 0:
            if "Scan parquet" in line:
                n += 1
            i += 1
            continue
        col = _node_col(line)
        sub = [line[col:]]
        j = i + 1
        while j < len(lines) and _node_col(lines[j]) > col:
            sub.append(lines[j][col:])
            j += 1
        key = _EXPR_ID.sub("#", "\n".join(sub))
        cached.setdefault(key, "\n".join(sub).count("Scan parquet"))
        i = j
    return n + sum(cached.values())


_AGG_CHILD = re.compile(
    r"(HashAggregate|SortAggregate|ObjectHashAggregate)\(.*(partial_|merge_)"
)
_BOUNDED_CHILD = re.compile(r"(LocalLimit|GlobalLimit|TakeOrderedAndProject)")


def _single_partition_violations(plan: str) -> list[str]:
    lines = plan.splitlines()
    bad = []
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        child = lines[i + 1] if i + 1 < len(lines) else ""
        if not (_AGG_CHILD.search(child) or _BOUNDED_CHILD.search(child)):
            bad.append(f"{line.strip()} -> {child.strip()}"[:160])
    return bad


# Default-run smoke subset: the driver's next 50-query rotation window
# (same policy as tests/test_oracle.py — the at-risk rows); the full
# registry sweep stays behind `-m ""` (pytest.ini).
from swarm_spark.queries import all_queries as _all_queries

_SMOKE = set(list(_all_queries())[:50])


def _sweep_param(name):
    return pytest.param(
        name, marks=[] if name in _SMOKE else [pytest.mark.sweep]
    )


@pytest.mark.parametrize("name", [_sweep_param(n) for n in sorted(ALL)])
def test_plan_is_scale_safe(name, spark, sf_dir):
    # each query's budget pins ITS OWN plan shape: drop any frames a
    # previously-tested query persisted, or Spark's CacheManager
    # silently substitutes them into this plan and the budget verifies
    # cross-test cache pollution instead (r12 finding: bm25_topk's old
    # budget of 3 held only because bm25_pruned's session-cached
    # postings hid one docs scan)
    spark.catalog.clearCache()
    df = ALL[name][0](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: cartesian product in plan"
    if name not in BNLJ_ALLOWED:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: unbounded broadcast nested-loop join"
        )
    bad = _single_partition_violations(plan)
    assert not bad, f"{name}: single-partition exchange over raw rows: {bad}"
    # Scan budget is checked on the plan that actually RAN: execute,
    # then count source scans in the finalized adaptive plan only
    # (AQE stage reuse and empty-relation elimination are invisible
    # in the initial plan).
    df.collect()
    final = (
        df._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("+- == Initial Plan ==")[0]
    )
    n_scans = _count_executed_scans(final)
    budget = _SCAN_BUDGET.get(name, _SCAN_BUDGET_DEFAULT)
    assert n_scans <= budget, (
        f"{name}: {n_scans} parquet scans in executed plan "
        f"(budget {budget}) — a subtree is being recomputed"
    )


class TestPrunedPathEngages:
    """r12 VERDICT #2: the headline pruned bench rows must VERIFIABLY
    take the PRUNED path at the bench scale factor — the final plan
    unions the pruned candidate slice with the theta-null exhaustive
    slice, a node the exhaustive plan shape never contains (every
    gate bail-out returns a single aggregation + top-k, no Union).
    sf0.1 is where the kw vocabulary's rarity spread passes the volume
    gates; at sf0.001/sf0.01 they route exhaustive (by design — the
    value oracle pins both routes, this test pins the routing)."""

    SF01 = "/root/testdata/sf0.1"

    @pytest.mark.skipif(
        not os.path.isdir("/root/testdata/sf0.1"),
        reason="sf0.1 testdata absent",
    )
    @pytest.mark.parametrize("name", ["bm25_pruned_idx", "lm_pruned_idx"])
    def test_pruned_path_taken_at_bench_sf(self, name, spark):
        spark.catalog.clearCache()
        # building the frame runs the gate actions (that IS the
        # routing decision); the plan is inspected without executing
        # the final query
        df = ALL[name][0](spark, self.SF01)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Union" in plan, (
            f"{name} routed to the exhaustive plan at sf0.1 — the "
            "bench row no longer measures pruning"
        )


class TestCcnetIdxServesStoredModel:
    """r13 VERDICT #7: the ``corpus_curate_ccnet_idx`` registry row
    must verifiably SCORE AGAINST THE STORED grouped model, not a
    retrain subtree — the value oracle (the full-chain retrain SQL)
    proves the results equal, this pins that the plan's count tables
    come from the persisted parquet and the corpus-sized reads stay
    bounded at the scoring stream (not |languages| retrain scans)."""

    def test_plan_reads_stored_model_not_retrain(self, spark, sf_dir):
        import re

        from swarm_spark.ops_queries import OPS

        spark.catalog.clearCache()
        df = OPS["corpus_curate_ccnet_idx"][0](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        scans = re.findall(r"Scan parquet[^\n]*", plan)
        model_scans = [s for s in scans if "swarm_ccnetlm" in s]
        docs_scans = [s for s in scans if "documents" in s]
        assert model_scans, (
            "no stored-model scan in the plan — the row is retraining "
            "in-plan instead of probing the persisted model"
        )
        # corpus-sized reads bounded: the scoring token stream plus
        # the tercile double-consumption — never a per-language or
        # retrain fan-out over the corpus
        assert len(docs_scans) <= 3, docs_scans


class TestKwIndexCacheKey:
    """ADVICE r13 (low): the persisted kw-index cache key must be a
    CONTENT fingerprint of the source parquet (part files + sizes +
    ns mtimes), not (dir mtime in seconds, dirent size) — a corpus
    regenerated within the same second with the same byte size must
    get a fresh index, and the superseded index dir for the same
    source path must be pruned, not accumulate."""

    def test_same_second_regeneration_rekeys_and_prunes(
        self, spark, tmp_path
    ):
        import os
        import shutil

        from swarm_spark.ops_queries import _bm25_kw_index

        src = "/root/testdata/sf0.001/documents.parquet"
        d = tmp_path / "corpus"
        d.mkdir()
        dst = str(d / "documents.parquet")
        shutil.copy(src, dst)
        base1 = _bm25_kw_index(spark, str(d))
        assert os.path.isdir(os.path.join(base1, "bounds"))
        # unchanged corpus -> same key, no rebuild
        assert _bm25_kw_index(spark, str(d)) == base1
        # regenerate "in the same second with the same size": bump
        # the mtime by ONE NANOSECOND — second-truncated mtime and
        # getsize are both unchanged, so the old key would collide
        st = os.stat(dst)
        os.utime(dst, ns=(st.st_atime_ns, st.st_mtime_ns + 1))
        base2 = _bm25_kw_index(spark, str(d))
        assert base2 != base1
        assert os.path.isdir(os.path.join(base2, "bounds"))
        # the superseded index for this source path was pruned
        assert not os.path.exists(base1)


class TestExecutedMetrics:
    def test_scan_summary_reports_filter_cut(self, spark, sf_dir):
        """The observability contract, measured from the executed plan:
        a filtered projection's output rows fall below the scan's rows
        (the filter cut is visible), and scan file/size metrics are
        populated for capacity accounting."""
        from pyspark.sql import functions as F

        from swarm_spark.metrics import executed_plan_metrics, scan_summary
        from swarm_spark.sources.tables import load_table

        pruned = (
            load_table(spark, sf_dir, "orders")
            .where(F.col("o_orderstatus") == "F")
            .select("o_orderkey")
        )
        pruned.collect()
        s = scan_summary(pruned)
        assert s["scan_nodes"] == 1 and s["files_read"] >= 1
        assert s["files_size"] > 0
        assert 0 < s["output_rows"] < s["scan_rows"]
        nodes = executed_plan_metrics(pruned)
        assert any(n["node"].lower().startswith("scan") for n in nodes)

    def test_partition_pruning_shrinks_file_list(self, spark, tmp_path):
        """Partition pruning is visible in the metrics: a predicate on
        the partition column cuts files_read and files_size, not just
        rows — the property that keeps a one-day query off a year of
        files."""
        from pyspark.sql import functions as F

        from swarm_spark.metrics import scan_summary

        p = str(tmp_path / "parts")
        spark.range(1000).withColumn(
            "day", (F.col("id") % 4).cast("string")
        ).write.partitionBy("day").parquet(p)
        full = spark.read.parquet(p)
        full.collect()
        one = spark.read.parquet(p).where(F.col("day") == "2")
        one.collect()
        s_full, s_one = scan_summary(full), scan_summary(one)
        assert s_one["files_read"] < s_full["files_read"]
        assert s_one["files_size"] < s_full["files_size"]
        assert s_one["scan_rows"] == 250
