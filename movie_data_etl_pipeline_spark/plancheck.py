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
            # first non-empty capture group names the relation (the
            # scan-mode probe regex has alternations whose groups may
            # be None); fall back to the matched text
            offenses.append(
                next((g for g in m.groups() if g), m.group(0).strip())
            )
    return offenses


SHUFFLE_JOIN_RE = re.compile(r"\b(SortMergeJoin|ShuffledHashJoin)\b")
# Probe-side relation notion for the PIN-CANDIDATE scan (wider than the
# gate's FACT_SCAN_RE): parquet fact scans PLUS checkpointed/session-
# shared relations (Scan ExistingRDD — the materialized pair/edge/
# fixed-point builds), which are fact-sized by construction. The gate
# keeps the narrower notion: it flags forced broadcasts, where only
# genuine fact tables are the 100 TB hazard.
PROBE_SCAN_RE = re.compile(
    r"/(lineitem|orders|events|documents|embeddings)\.parquet"
    r"|Scan (ExistingRDD|ExternalRDD)"
)
_KEYS_RE = re.compile(r"keys=\[([^\]]*)\]")
_CALENDAR_KEY_RE = re.compile(
    r"date|day|week|month|year|hour|_ts|ts_|time", re.IGNORECASE
)
_ENTITY_KEY_RE = re.compile(
    r"node|src|dst|vec|doc|actor|user|cust|supp|part|item|label|key|id",
    re.IGNORECASE,
)


def _grain(keys: str) -> str:
    """Classify an aggregate's grouping keys for the candidate report:
    scalar (no keys — 1 row at any scale), calendar (bounded by the
    date domain), entity (node/dimension-grain — bounded by |V| or the
    dimension, the r9 pin family), other."""
    if not keys.strip():
        return "scalar"
    if _CALENDAR_KEY_RE.search(keys):
        return "calendar"
    if _ENTITY_KEY_RE.search(keys):
        return "entity"
    return "other"


def broadcast_pin_candidates(
    plan: str,
    fact_re: re.Pattern = PROBE_SCAN_RE,
    reduce_re: re.Pattern = REDUCE_RE,
) -> list[dict]:
    """Pin-candidate shape scan (VERDICT-r9 ask #2): shuffle joins
    (SortMergeJoin / ShuffledHashJoin) where ONE side is fully reduced
    (contains a total-bounding aggregate/limit and NO unreduced fact
    scan — a node/dimension/calendar-grain build side) and the OTHER
    side probes a fact relation unreduced. This is the exact shape
    behind every accepted r8/r9 bounded-side broadcast pin
    (gr_modularity's label fixed point, ts_mk_trend's day aggregate,
    gr_khop_reach's frontier state): the static planner sees no size
    estimate for the aggregated side and shuffles BOTH sides, while a
    bounded-side pin removes the fact-side exchange at every scale.

    Returns one dict per candidate join: the join line, the build
    side's topmost reduce keys, and a grain classification. A candidate
    is a LEAD, not a decision — the r9 label_propagation rejection
    (sf0.1 win, 100× loss) is the template: A/B interleaved at sf0.1
    AND 100× before pinning.
    """
    tree = plan.splitlines()
    out: list[dict] = []
    for i, line in enumerate(tree):
        jm = SHUFFLE_JOIN_RE.search(line)
        if not jm:
            continue
        d = plan_depth(tree[i])
        child_d = 0 if d < 0 else d + 3
        end = subtree_end(tree, i) if d >= 0 else len(tree)
        kids = [j for j in range(i + 1, end) if plan_depth(tree[j]) == child_d]
        if len(kids) != 2:
            continue
        sides = []
        for idx, j in enumerate(kids):
            j_end = min(subtree_end(tree, j), kids[1] if idx == 0 else end)
            unred = unreduced_fact_scans(
                tree, j, j_end, fact_re=fact_re, reduce_re=reduce_re
            )
            if reduce_re.search(tree[j]):
                unred = []  # the side's own root reduces everything below
            reduce_lines = [
                tree[k].strip() for k in range(j, j_end) if reduce_re.search(tree[k])
            ]
            sides.append({"unreduced_facts": unred, "reduces": reduce_lines})
        for b, p in ((0, 1), (1, 0)):
            build, probe = sides[b], sides[p]
            if build["reduces"] and not build["unreduced_facts"] and probe["unreduced_facts"]:
                keys_m = _KEYS_RE.search(build["reduces"][0])
                keys = keys_m.group(1) if keys_m else ""
                out.append(
                    {
                        "join": line.strip()[:160],
                        "build_side": "left" if b == 0 else "right",
                        "build_reduce": build["reduces"][0][:160],
                        "build_keys": keys[:120],
                        "grain": _grain(keys),
                        "probe_facts": sorted(set(probe["unreduced_facts"])),
                    }
                )
    return out


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
