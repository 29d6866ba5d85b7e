"""Interleaved A/B of gr_khop_reach: pre-dd988c1 (re-materialized
visited union, per-round re-count) vs HEAD (delta-frontier counts,
lazy visited union).

VERDICT-r5 ask #2: the rewrite shipped on a claimed ~2x win the
records can't reproduce (local best-of-2 regressed 6.62 -> 11.30 s
while the driver was flat). Box drift makes cross-day comparison
useless, so this runs both variants alternately in ONE session
(shared warm cotx_edges build, same JVM, same conf) with >=5 reps
each and prints per-variant times + medians as one JSON line.

Usage: python tools/ab_khop.py [SF_DIR] [REPS]
"""

from __future__ import annotations

import json
import statistics
import sys
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.plans.graph_edges import cotx_edges
from movie_data_etl_pipeline_spark.plans.wave26 import (
    _KHOP,
    _SEED_CAP,
    _SEED_MOD,
    gr_khop_reach,
)
from movie_data_etl_pipeline_spark.session import get_spark
from movie_data_etl_pipeline_spark.sources import load_table


def _seeds(spark: SparkSession, sf: str) -> DataFrame:
    customer = load_table(spark, sf, "customer")
    return (
        customer.filter(F.col("c_custkey") % _SEED_MOD == 0)
        .orderBy("c_custkey")
        .limit(_SEED_CAP)
        .select((F.col("c_custkey") * 2).alias("seed"))
    )


def khop_old(spark: SparkSession, sf: str) -> DataFrame:
    """Pre-dd988c1 form: visited union re-checkpointed every round,
    reach_k = COUNT(visited_k) - 1 per seed."""
    edges = cotx_edges(spark, sf)
    seeds = _seeds(spark, sf)
    visited = seeds.select("seed", F.col("seed").alias("node"))
    frontier = visited
    out_counts = []
    for k in range(1, _KHOP + 1):
        expanded = (
            frontier.join(edges, F.col("node") == F.col("src"))
            .select("seed", F.col("dst").alias("node"))
            .distinct()
        )
        frontier = expanded.join(
            visited, ["seed", "node"], "left_anti"
        ).localCheckpoint(eager=True)
        visited = visited.unionAll(frontier).localCheckpoint(eager=True)
        out_counts.append(
            visited.groupBy("seed")
            .agg((F.count(F.lit(1)) - 1).cast("bigint").alias(f"reach_{k}"))
        )
    out = out_counts[0]
    for c in out_counts[1:]:
        out = out.join(c, "seed")
    return out.orderBy("seed")


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark()
    # warm the shared edge build once so neither variant pays it
    cotx_edges(spark, sf).count()

    variants = {"old": khop_old, "new": gr_khop_reach}
    times: dict[str, list[float]] = {k: [] for k in variants}
    rows: dict[str, int] = {}
    for rep in range(reps):
        for name, fn in variants.items():
            t0 = time.monotonic()
            n = fn(spark, sf).count()
            times[name].append(round(time.monotonic() - t0, 3))
            rows[name] = n
    assert rows["old"] == rows["new"], rows
    result = {
        "sf": sf,
        "reps": reps,
        "rows": rows["new"],
        "times": times,
        "median": {k: round(statistics.median(v), 3) for k, v in times.items()},
        "winner": min(times, key=lambda k: statistics.median(times[k])),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
