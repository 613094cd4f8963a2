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
"""

from __future__ import annotations

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
BNLJ_ALLOWED = {
    "ann_topk_bruteforce",
    "ann_topk_ivf",
    "ann_ivf_recall",
    "corpus_vocab",
}

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


@pytest.mark.parametrize("name", sorted(ALL))
def test_plan_is_scale_safe(name, spark, sf_dir):
    df = ALL[name][0](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: cartesian product in plan"
    if name not in BNLJ_ALLOWED:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: unbounded broadcast nested-loop join"
        )
    bad = _single_partition_violations(plan)
    assert not bad, f"{name}: single-partition exchange over raw rows: {bad}"
