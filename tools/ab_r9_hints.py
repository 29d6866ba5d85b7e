"""Interleaved same-session A/B for the four explicit bounded-side
broadcast restores (VERDICT-r8 ask #5):

    hint_on  = plans/_hints.bounded_broadcast active (HEAD) — the four
               flip-off losses (gr_modularity, gr_hits, ts_mk_trend,
               ag_kendall_tau) get an explicit F.broadcast on their
               provably bounded build side
    hint_off = bounded_broadcast monkeypatched to identity — the r8
               flip-off behavior (shuffle join, no broadcast)

All four call sites resolve ``_hints.bounded_broadcast`` at call time
(module-attribute lookup inside the query body), so a monkeypatch on
the module toggles ONLY these restores — every other broadcast in the
engine (1-row aggregates, static dimension tables) is untouched.

Arms run interleaved A,B,A,B,... per query in ONE session so box drift
(±35% on this box within hours) hits both arms equally. Value equality
is asserted per query via a sorted row-hash of the hint_on vs hint_off
results at first rep (the hint only moves the physical join strategy).

Usage:

    python tools/ab_r9_hints.py [--sf SF_DIR] [--reps N] [query ...]

Unknown query names and unconsumed arguments hard-error (the
strictness ADVICE-r8 asked ab_r8_flip.py to match).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from movie_data_etl_pipeline_spark.plans import _hints
from movie_data_etl_pipeline_spark.plans import fixture_queries as FQ
from movie_data_etl_pipeline_spark.session import get_spark

# the four VERDICT-r8 ask-#5 restores, plus the two same-shape wins the
# r9 candidate scan found (gr_conductance: gr_modularity's exact
# edge⋈label shape; gr_khop_reach: per-round node-grain bitset state).
# All six re-confirmed INTERLEAVED AT 100x (tools/ab_r9_hints_x100.json,
# best-of-2: wins of 2.4-4.3x on the graph family). Candidates tested
# and NOT pinned: gr_assortativity (0.912 vs 0.924) and gr_kcore
# (1.818 vs 1.840) — static planner already broadcasts them — and the
# shared label_propagation fixed point, which WINS at sf0.1 (2.49 vs
# 2.99) but LOSES at 100x (85.6 vs 64.2: the labels relation is
# node-grain but label-valued, and 3 rounds of 1.6M-row hash-relation
# build+broadcast cost more than the co-partitioned shuffle) — the
# 100 TB posture rules, so it stays hint-free. Beware single-rep 100x
# readings: the first timed rep of a query in a session can carry a
# 2-4x cold artifact (observed on gr_khop_reach: 18.1 s single-rep vs
# 4.6 s best-of-2); use --reps >= 2 at amplified scale.
RESTORED = [
    "gr_modularity", "gr_hits", "ts_mk_trend", "ag_kendall_tau",
    "gr_conductance", "gr_khop_reach",
]


def _value_hash(df) -> tuple:
    cols = sorted(df.columns)
    rows = sorted(tuple(str(r[c]) for c in cols) for r in df.collect())
    return (tuple(cols), tuple(rows))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("queries", nargs="*", default=None)
    ns = ap.parse_args()
    if ns.reps < 1:
        sys.exit("ab_r9_hints: --reps must be >= 1")
    names = ns.queries or RESTORED
    unknown = [n for n in names if n not in FQ.QUERIES]
    if unknown:
        sys.exit(f"ab_r9_hints: unknown queries {unknown}")

    identity = lambda df: df  # noqa: E731
    hinted = _hints.bounded_broadcast
    arms = {"hint_on": hinted, "hint_off": identity}

    spark = get_spark("ab-r9-hints")
    FQ.QUERIES["q1_pricing_summary"](spark, ns.sf).write.format("noop").mode(
        "overwrite"
    ).save()  # JVM/codegen warmup
    best: dict[str, dict[str, float]] = {a: {} for a in arms}
    for name in names:
        fn = FQ.QUERIES[name]
        # untimed per-query warmup under HEAD behavior: pays the
        # one-time session-shared cache builds (graph pairs, label
        # fixed point) OUTSIDE the measurement — otherwise the first
        # timed arm absorbs the build and the A/B is biased against
        # whichever arm runs first
        fn(spark, ns.sf).write.format("noop").mode("overwrite").save()
        seen_hash: dict[str, tuple] = {}
        for rep in range(ns.reps):
            for arm, impl in arms.items():
                _hints.bounded_broadcast = impl
                try:
                    t0 = time.time()
                    fn(spark, ns.sf).write.format("noop").mode("overwrite").save()
                    dt = time.time() - t0
                    if rep == 0:
                        seen_hash[arm] = _value_hash(fn(spark, ns.sf))
                finally:
                    _hints.bounded_broadcast = hinted
                if name not in best[arm] or dt < best[arm][name]:
                    best[arm][name] = round(dt, 3)
        if seen_hash["hint_on"] != seen_hash["hint_off"]:
            sys.exit(f"ab_r9_hints: VALUE MISMATCH between arms on {name}")
        print(
            f"{name}: on={best['hint_on'][name]} off={best['hint_off'][name]} (values equal)",
            file=sys.stderr,
            flush=True,
        )
    tot = {a: round(sum(v.values()), 2) for a, v in best.items()}
    print(json.dumps({"totals": tot, "per_query": best, "sf": ns.sf, "reps": ns.reps}))


if __name__ == "__main__":
    main()
