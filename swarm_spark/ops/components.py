"""Duplicate-cluster resolution: connected components over dup pairs.

Pair-finding (jaccard/minhash/simhash/embedding) yields edges; keeping
one doc per duplicate *cluster* needs the transitive closure. This is
the **alternating large-star / small-star** algorithm (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14):

    large-star(u): connect every neighbor v > u to min(N(u) ∪ {u})
    small-star(u): connect every neighbor v < u (and u itself)
                   to min(N(u) ∪ {u})

Alternating the two contracts every component to a star rooted at its
minimum id in **O(log n) rounds regardless of component diameter** —
the fix for the round-2 caveat that min-label propagation needs
diameter rounds (a 21-hop chain silently truncated at max_iters=20).
Each half-round is one shuffle on the node id; edge volume never
exceeds the input edge count (stars only shrink), so at the 100-TB
end the cost per round is bounded by the dup-pair count, not by n².

Deterministic: ids order lexicographically, min is exact — the
converged star set IS the (node → component-min) mapping, oracle-
checkable against a recursive-CTE reachability query.

Reference parity note: the reference (m-mizutani/swarm) has no
clustering operator — this is part of the LLM-data-pipeline tier.
"""

from __future__ import annotations

import os
import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _same_checkpoint_root(existing: str, requested: str) -> bool:
    """True when the session's checkpoint dir already points at (a
    per-context uuid subdir of) ``requested`` — the repeat-call case,
    which must stay silent. ``getCheckpointDir`` returns the resolved
    uuid subdir (possibly URI-prefixed), so compare on the parent."""
    norm = existing.removeprefix("file:")
    req = os.path.abspath(requested)
    return os.path.abspath(norm) == req or os.path.dirname(
        os.path.abspath(norm)
    ) == req


def _large_star(edges: DataFrame) -> DataFrame:
    """One large-star round over a directed, self-edge-free edge list.

    Emits ``(v, m)`` for every neighbor ``v > u`` where
    ``m = min(N(u) ∪ {u})``; since ``m <= u < v`` no self edge can
    appear. Connectivity is preserved (Kiveris et al. Lemma 1).
    """
    sym = edges.union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = sym.groupBy("u").agg(
        F.least(F.min("v"), F.first("u")).alias("m")
    )
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """One small-star round: orient big→small, hang every small
    neighbor (and the center) off the minimum neighbor."""
    o = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).distinct()
    mins = o.groupBy("u").agg(F.min("v").alias("m"))
    return (
        o.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .union(mins.select(F.col("u"), F.col("m").alias("v")))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def dup_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iters: int = 25,
) -> DataFrame:
    """(doc_id, component) for every doc appearing in ``pairs``;
    component = the minimum doc id reachable through pair edges.

    Converges in O(log n) alternating rounds; the loop exits on an
    exact edge-set fixpoint (count + order-independent hash — the
    converged set is the star forest, i.e. the answer itself).
    """
    nodes = (
        pairs.select(F.col(a_col).alias("id"))
        .union(pairs.select(F.col(b_col).alias("id")))
        .distinct()
    )
    edges = (
        pairs.select(
            F.greatest(a_col, b_col).alias("u"),
            F.least(a_col, b_col).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .persist()
    )
    try:
        prev_sig = None
        empty = edges.limit(1).count() == 0
        for _ in range(0 if empty else max_iters):
            # localCheckpoint truncates lineage: each round references
            # the edge frame several times (sym union, mins join), so
            # without truncation the logical plan doubles per round.
            nxt = _small_star(_large_star(edges)).localCheckpoint(eager=True)
            sig = tuple(
                nxt.agg(
                    F.count(F.lit(1)),
                    F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
                ).first()
            )
            edges.unpersist()
            edges = nxt
            if sig == prev_sig:
                break
            prev_sig = sig
        # Converged star forest: every non-root points at its root.
        labels = edges.select(
            F.col("u").alias("id"), F.col("v").alias("component")
        )
        return (
            nodes.join(labels, "id", "left")
            .select("id", F.coalesce("component", F.col("id")).alias("component"))
            .orderBy("id")
        )
    finally:
        edges.unpersist()


def keep_one_per_cluster(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
) -> DataFrame:
    """Drop all but the lowest-id member of every duplicate cluster —
    the end-to-end dedup: docs in no pair pass through untouched."""
    comp = dup_components(pairs, a_col, b_col)
    losers = comp.where(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")


def keep_best_per_cluster(
    df: DataFrame,
    pairs: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Drop all but the HIGHEST-``score_col`` member of every duplicate
    cluster (ties resolve to the lowest id) — the quality-aware
    survivor policy production dedup passes actually want: when a
    boilerplate page and its well-formed original collide, the
    better document survives, not the one with the smaller id.
    Docs in no pair pass through untouched.

    Shape: the same large-star/small-star component labels as
    :func:`keep_one_per_cluster`, then a per-component (max score,
    min id) resolution — two monoid aggregations over the CLUSTERED
    rows only (a vanishing fraction of the corpus), and the final
    anti-join streams the corpus once. Score ties join back on the
    stored value itself, so the policy is type-generic (no numeric-id
    encoding tricks).

    ``checkpoint_dir``: by default the three-consumer scored frame is
    ``localCheckpoint``-ed — executor-stored blocks, unrecoverable
    under executor loss (the same trade the r11 ADVICE flagged for θ;
    unlike θ this frame is cluster-members-sized, so driver
    materialization does not apply). On a real cluster pass a
    reliable checkpoint directory (HDFS/object store): the frame is
    ``checkpoint``-ed there instead and survives any executor churn.
    """
    comp = dup_components(pairs, a_col, b_col)
    # cluster members are a vanishing corpus fraction, but three
    # passes (best / winner / loser) consume this frame — truncate
    # lineage once so the pair pipeline and the score scan don't
    # re-run per consumer (the dup_components edge-frame precedent;
    # executor loss recomputes from the checkpoint blocks' lineage
    # root under localCheckpoint — the documented trade — or replays
    # from the reliable store when checkpoint_dir is given)
    scored = comp.join(
        df.select(F.col(id_col).alias("id"), F.col(score_col).alias("__s")),
        "id",
    )
    if checkpoint_dir is not None:
        # r12 ADVICE: setCheckpointDir mutates SESSION-GLOBAL state —
        # never silently redirect a checkpoint dir the caller (or a
        # concurrent job) already configured. Set only when unset;
        # on a conflicting pre-set dir, keep the session's choice and
        # warn (the caller's dir is still a reliable store, which is
        # what the parameter asks for). setCheckpointDir appends a
        # per-context uuid subdir, so the set-when-unset call is
        # idempotent-cheap (one mkdir).
        sc = scored.sparkSession.sparkContext
        existing = sc.getCheckpointDir()
        if existing is None:
            sc.setCheckpointDir(checkpoint_dir)
        elif not _same_checkpoint_root(existing, checkpoint_dir):
            warnings.warn(
                "keep_best_per_cluster: session checkpoint dir already "
                f"set to {existing!r}; keeping it instead of "
                f"{checkpoint_dir!r} (reliable checkpoint still applies)",
                stacklevel=2,
            )
        scored = scored.checkpoint(eager=True)
    else:
        scored = scored.localCheckpoint(eager=True)
    best = scored.groupBy("component").agg(F.max("__s").alias("__best"))
    winners = (
        scored.join(best, "component")
        .where(F.col("__s") == F.col("__best"))
        .groupBy("component")
        .agg(F.min("id").alias("wid"))
    )
    losers = (
        scored.join(winners, "component")
        .where(F.col("id") != F.col("wid"))
        .select(F.col("id").alias(id_col))
    )
    return df.join(losers, id_col, "left_anti")
