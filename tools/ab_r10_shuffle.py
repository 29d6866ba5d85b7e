"""Interleaved same-session A/B for the initial shuffle-partition
count (round-10 scale-robustness fix):

    A = 32  (the old default: shuffle.partitions == local core count)
    B = 3×cores (the new default: AQE coalescing right-sizes every
        exchange DOWN at small volume, while the higher initial count
        bounds per-task aggregate/sort state at amplified volume)

Motivation (guide §2.2/§2.5): with partitions pinned to the core
count, per-task state grows linearly with data — measured at 100×:
the graph-family shared build dies with AGGREGATE_OUT_OF_MEMORY at 32
partitions and runs clean at 128 (see OPTIMIZATION_r10.md). The conf
is runtime-settable, so both arms run in ONE session, reps interleaved
A,B,A,B per query — box drift hits both arms equally. Values are
unaffected (partitioning moves physical placement only); the
comparison is noop-sink wall time, best-of-REPS per arm, over CORE_R2
by default (the frozen cross-round workload).

    python tools/ab_r10_shuffle.py [--sf SF] [--reps N] [--b N] [query ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench
from movie_data_etl_pipeline_spark.plans import fixture_queries as FQ
from movie_data_etl_pipeline_spark.session import get_spark

CONF = "spark.sql.shuffle.partitions"


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--b", type=int, default=None, help="arm B partition count")
    ap.add_argument("--out", default=str(Path(__file__).parent / "ab_r10_shuffle.json"))
    ap.add_argument("queries", nargs="*")
    ns = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    arms = {"sp_cores": str(cpus), "sp_3x": str(ns.b or 3 * cpus)}
    names = ns.queries or list(bench.CORE_R2)
    unknown = [n for n in names if n not in FQ.QUERIES]
    if unknown:
        sys.exit(f"ab_r10_shuffle: unknown queries {unknown}")

    spark = get_spark("ab-r10-shuffle")
    FQ.QUERIES["q1_pricing_summary"](spark, ns.sf).write.format("noop").mode(
        "overwrite"
    ).save()
    best: dict[str, dict[str, float]] = {a: {} for a in arms}
    for name in names:
        fn = FQ.QUERIES[name]
        fn(spark, ns.sf).write.format("noop").mode("overwrite").save()  # untimed warmup
        spark.catalog.clearCache()
        for rep in range(ns.reps):
            for arm, val in arms.items():
                spark.conf.set(CONF, val)
                try:
                    t0 = time.perf_counter()
                    fn(spark, ns.sf).write.format("noop").mode("overwrite").save()
                    dt = time.perf_counter() - t0
                finally:
                    spark.conf.set(CONF, str(cpus))
                spark.catalog.clearCache()
                if name not in best[arm] or dt < best[arm][name]:
                    best[arm][name] = round(dt, 3)
    tot = {a: round(sum(v.values()), 2) for a, v in best.items()}
    line = json.dumps(
        {"metric": "ab_r10_shuffle", "arms": arms, "totals": tot,
         "per_query": best, "sf": ns.sf, "reps": ns.reps, "n_queries": len(names)}
    )
    Path(ns.out).write_text(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
