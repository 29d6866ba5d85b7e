"""Interleaved drift re-measure of the four r8→r9 merged-bests
regressions (VERDICT-r9 ask #4): qa_replica_diff (+0.77 s),
sim_knn_portable (+0.44), gr_kcore (+0.29), gr_bipartite_project
(+0.27) — all on code untouched in r9, all attributed to box drift.

Methodology (the r9 discipline): ONE session, the frozen CORE_R2 gauge
timed immediately BEFORE and AFTER the suspects (bracketing, so the
gauge and the suspects see the same box state), suspects best-of-2 with
untimed per-suspect warmup (pays shared graph/doc builds outside the
measurement). Verdict per suspect:

    normalized_now = best_now / drift_now        (reference-box seconds)
    normalized_r8  = r8_merged_best / r8_drift   (r8 fast-leg seconds)
    ratio = normalized_now / normalized_r8

ratio ≈ 1 → the r9 delta was box drift, no plan work earned.
ratio >> 1 (we use 1.15 — beyond gauge noise and the r8 leg-attribution
uncertainty) → genuinely slower at equal drift: root-cause and
re-window.

Usage:

    python tools/ab_r10_drift.py [--sf SF_DIR] [--out OUT_JSON]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench
from movie_data_etl_pipeline_spark.plans import fixture_queries as FQ
from movie_data_etl_pipeline_spark.session import get_spark

# r8 merged bests (tools/bench_r8_local.json) and the drift of the two
# r8 legs they were merged from ([0.84, 0.869] — per-query bests almost
# always land on the faster leg; we carry the midpoint and treat the
# ±1.7% spread as part of the verdict threshold).
SUSPECTS = {
    "qa_replica_diff": 3.696,
    "sim_knn_portable": 2.09,
    "gr_kcore": 2.163,
    "gr_bipartite_project": 1.495,
}
R8_DRIFT = (0.84 + 0.869) / 2


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=str(Path(__file__).parent / "ab_r10_drift.json"))
    ap.add_argument("--reps", type=int, default=2)
    ns = ap.parse_args()
    if ns.reps < 2:
        sys.exit("ab_r10_drift: --reps must be >= 2 (single-rep readings lie)")

    spark = get_spark("ab-r10-drift")
    # JVM/codegen warmup + per-suspect untimed warmup (shared builds)
    FQ.QUERIES["q1_pricing_summary"](spark, ns.sf).write.format("noop").mode(
        "overwrite"
    ).save()
    for name in SUSPECTS:
        FQ.QUERIES[name](spark, ns.sf).write.format("noop").mode("overwrite").save()

    gauge_pre = bench.measure_drift(spark, ns.sf)
    print(f"gauge pre: drift {gauge_pre['drift_factor']}", file=sys.stderr, flush=True)

    # EXACT bench.py per-query methodology: clearCache after EVERY rep
    # so no suspect pays a predecessor's cache-eviction/GC bill (the
    # first cut of this tool cleared once per rep-SET and biased the
    # late-loop suspects slow)
    best: dict[str, float] = {}
    for name in SUSPECTS:
        for _ in range(ns.reps):
            t0 = time.perf_counter()
            FQ.QUERIES[name](spark, ns.sf).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            if name not in best or dt < best[name]:
                best[name] = round(dt, 3)
            spark.catalog.clearCache()

    gauge_post = bench.measure_drift(spark, ns.sf)
    print(f"gauge post: drift {gauge_post['drift_factor']}", file=sys.stderr, flush=True)
    drift_now = round((gauge_pre["drift_factor"] + gauge_post["drift_factor"]) / 2, 3)

    verdicts: dict[str, dict] = {}
    for name, r8_best in SUSPECTS.items():
        norm_now = round(best[name] / drift_now, 3)
        norm_r8 = round(r8_best / R8_DRIFT, 3)
        ratio = round(norm_now / norm_r8, 3)
        verdicts[name] = {
            "best_now": best[name],
            "normalized_now": norm_now,
            "r8_merged_best": r8_best,
            "normalized_r8": norm_r8,
            "ratio": ratio,
            "verdict": "drift" if ratio <= 1.15 else "REAL_REGRESSION",
        }
        print(f"{name}: now {best[name]} (norm {norm_now}) vs r8 norm {norm_r8} "
              f"-> ratio {ratio} [{verdicts[name]['verdict']}]",
              file=sys.stderr, flush=True)

    record = {
        "metric": "ab_r10_drift",
        "sf": ns.sf,
        "reps": ns.reps,
        "drift_pre": gauge_pre["drift_factor"],
        "drift_post": gauge_post["drift_factor"],
        "drift_now": drift_now,
        "r8_drift_assumed": round(R8_DRIFT, 3),
        "suspects": verdicts,
    }
    Path(ns.out).write_text(json.dumps(record) + "\n")
    print(json.dumps(record))


if __name__ == "__main__":
    main()
