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
REDUCE_RE = re.compile(
    r"HashAggregate|SortAggregate|ObjectHashAggregate|"
    r"GlobalLimit|CollectLimit|TakeOrderedAndProject|Limit"
)


def plan_depth(line: str) -> int:
    """Indentation depth of a plan-tree line (offset of its ``+- `` /
    ``:- `` marker), or -1 for marker-less lines (the root operator,
    detail/continuation lines)."""
    m = re.search(r"[+:]- ", line)
    return m.start() if m else -1


def broadcasts_unreduced_fact(
    plan: str,
    fact_re: re.Pattern = FACT_SCAN_RE,
    reduce_re: re.Pattern = REDUCE_RE,
) -> str | None:
    """Return the first fact-table name some ``BroadcastExchange``
    subtree scans with NO reducing ancestor between the scan and the
    exchange, else ``None``.

    Ancestry is recovered from the pre-order tree text: the ancestors
    of a line are found by walking backward while the depth strictly
    decreases — lines at the same or greater depth are siblings (or
    their descendants) and must NOT excuse the scan (the exact false
    negative ADVICE-r8 #1 found in the old whole-subtree walk).
    """
    tree = plan.splitlines()
    for i, line in enumerate(tree):
        if "BroadcastExchange" not in line:
            continue
        d = plan_depth(line)
        end = len(tree)
        for j in range(i + 1, len(tree)):
            sd = plan_depth(tree[j])
            if 0 <= sd <= d:
                end = j
                break
        for j in range(i + 1, end):
            m = fact_re.search(tree[j])
            if not m:
                continue
            cur = plan_depth(tree[j])
            covered = False
            for k in range(j - 1, i, -1):
                kd = plan_depth(tree[k])
                if kd < 0 or kd >= cur:
                    continue  # detail line, or a sibling branch
                if reduce_re.search(tree[k]):
                    covered = True
                    break
                cur = kd
            if not covered:
                return m.group(1)
    return None
