"""Static physical-plan checks shared by the CI plan gate
(``tests/test_plan_gate.py``) and the audit generator
(``tools/plan_audit.py``) — one walker, so the two cannot drift
(ADVICE-r8 #1).

The check of record: a ``BroadcastExchange`` whose build subtree scans
a FACT table with no reducing operator on the scan's own root-to-leaf
path is the shape that dies at 100 TB — a hint forces the broadcast at
every scale while the build side grows with the data. The walk is
per-path, not per-subtree: a reducing operator only covers scans
strictly BELOW it in its own branch, so a join build side that unions
a reduced branch with an unreduced fact-scan branch is still flagged.
"""

from __future__ import annotations

import re

FACT_SCAN_RE = re.compile(r"/(lineitem|orders|events|documents|embeddings)\.parquet")
# Reducing operators that bound a build side's TOTAL row count at any
# scale. Deliberately NOT a bare "Limit": LocalLimit bounds rows per
# partition only (total = k x numPartitions, which grows with the
# data) — counting it as a reduce was a silent loosening the r9
# self-review caught.
REDUCE_RE = re.compile(
    r"HashAggregate|SortAggregate|ObjectHashAggregate|"
    r"GlobalLimit|CollectLimit|TakeOrderedAndProject"
)


# Hint-forced broadcasts of a fact-table SCAN whose row bound lives in
# a filter predicate on a unique key (invisible to the static walker) —
# the reviewed allowlist shared by the CI gate and tools/plan_audit.py.
# Every entry carries its boundedness argument; anything else that
# broadcasts an unreduced fact scan fails the gate and flags in
# PLANS.md.
HINTED_FACT_BROADCAST_OK = {
    # query -> why the hinted build side is bounded at any scale.
    # All four broadcast an embeddings subset selected by an equality/
    # range predicate on the UNIQUE key vec_id with a CONSTANT bound —
    # the build side is <= K rows at any corpus size (a seed codebook /
    # fixed query panel).
    "sim_kmeans_assign": "8-row seed codebook (vec_id < 8)",
    "emb_pq_codebook": "8-row PQ seed table (vec_id < 8)",
    "sim_cluster_purity": "8-row seed table (vec_id < 8)",
    "ir_ndcg_mrr": "50-row fixed query panel (vec_id bound)",
}


def plan_depth(line: str) -> int:
    """Indentation depth of a plan-tree line (offset of its ``+- `` /
    ``:- `` marker), or -1 for marker-less lines (the root operator,
    detail/continuation lines)."""
    m = re.search(r"[+:]- ", line)
    return m.start() if m else -1


def unreduced_fact_broadcasts(
    plan: str,
    fact_re: re.Pattern = FACT_SCAN_RE,
    reduce_re: re.Pattern = REDUCE_RE,
) -> list[str]:
    """Return EVERY fact-table name some ``BroadcastExchange`` subtree
    scans with NO reducing ancestor between the scan and the exchange
    (one entry per offending exchange⋅scan pair, pre-order; empty list
    when clean). ADVICE-r9 #3: the old first-offense-only return meant
    a plan with two independent offending exchanges surfaced the second
    only after the first was fixed — the gate failure and the PLANS.md
    audit now enumerate every offense in one pass.

    Ancestry is recovered from the pre-order tree text: the ancestors
    of a line are found by walking backward while the depth strictly
    decreases — lines at the same or greater depth are siblings (or
    their descendants) and must NOT excuse the scan (the exact false
    negative ADVICE-r8 #1 found in the old whole-subtree walk).
    """
    offenses: list[str] = []
    tree = plan.splitlines()
    for i, line in enumerate(tree):
        if "BroadcastExchange" not in line:
            continue
        end = subtree_end(tree, i)
        offenses.extend(
            unreduced_fact_scans(tree, i, end, fact_re=fact_re, reduce_re=reduce_re)
        )
    return offenses


def subtree_end(tree: list[str], i: int) -> int:
    """Index one past the last line of the subtree rooted at ``tree[i]``
    in a pre-order plan-tree text: the subtree runs until the next
    MARKED line at the root's depth or shallower."""
    d = plan_depth(tree[i])
    for j in range(i + 1, len(tree)):
        sd = plan_depth(tree[j])
        if 0 <= sd <= d:
            return j
    return len(tree)


def unreduced_fact_scans(
    tree: list[str],
    root: int,
    end: int,
    *,
    fact_re: re.Pattern = FACT_SCAN_RE,
    reduce_re: re.Pattern = REDUCE_RE,
) -> list[str]:
    """Fact-table names scanned inside ``tree[root+1:end]`` with NO
    reducing operator on the scan's own path back to (and excluding)
    ``tree[root]`` — the shared per-path walk behind the broadcast gate
    and the pin-candidate scan. Ancestry is recovered by walking
    backward while the depth strictly decreases; same-or-deeper lines
    are siblings (or their descendants) and must NOT excuse the scan."""
    offenses: list[str] = []
    for j in range(root + 1, end):
        m = fact_re.search(tree[j])
        if not m:
            continue
        cur = plan_depth(tree[j])
        start = j
        if cur < 0:
            # marker-less continuation line (e.g. a Location: detail
            # printed under its operator): attribute the path to the
            # nearest preceding MARKED line — that operator's own
            # ancestry decides coverage (otherwise cur=-1 makes every
            # ancestor look non-shallower and the scan can never be
            # covered: a false-flag class the r9 self-review caught)
            for k in range(j - 1, root, -1):
                kd = plan_depth(tree[k])
                if kd >= 0:
                    cur, start = kd, k
                    break
            else:
                continue  # no owning operator inside the subtree
            if reduce_re.search(tree[start]):
                continue  # the owning operator itself reduces
        covered = False
        for k in range(start - 1, root, -1):
            kd = plan_depth(tree[k])
            if kd < 0 or kd >= cur:
                continue  # detail line, or a sibling branch
            if reduce_re.search(tree[k]):
                covered = True
                break
            cur = kd
        if not covered:
            offenses.append(m.group(1))
    return offenses


def broadcasts_unreduced_fact(
    plan: str,
    fact_re: re.Pattern = FACT_SCAN_RE,
    reduce_re: re.Pattern = REDUCE_RE,
) -> str | None:
    """First offending fact table, else ``None`` — thin wrapper over
    :func:`unreduced_fact_broadcasts` for single-offense call sites and
    the historical unit-test surface."""
    offenses = unreduced_fact_broadcasts(plan, fact_re, reduce_re)
    return offenses[0] if offenses else None
