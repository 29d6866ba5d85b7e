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


_NW = (_SEED_CAP + 63) // 64  # bitset words per node (400 seeds -> 7 longs)


def khop_bitmap(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-source BFS with the seed set packed into a per-node int64
    bitset (the textbook MS-BFS optimization): BFS state is ONE row per
    node (|V| bounded) instead of one per (seed, node) pair, and each
    round is one |E|-sized edge join + per-dst bit_or aggregate — the
    seed count disappears from the join volume entirely."""
    from pyspark.sql import Window

    edges = cotx_edges(spark, sf)
    seeds = _seeds(spark, sf)
    # seed -> bit index j (deterministic by seed order; 400 rows, the
    # window is trivial)
    sj = seeds.select(
        "seed",
        (F.row_number().over(Window.orderBy("seed")) - 1).alias("j"),
    ).localCheckpoint(eager=True)
    mask_cols = [
        F.when(
            (F.col("j") / 64).cast("int") == w,
            F.expr("shiftleft(cast(1 as bigint), cast(j % 64 as int))"),
        )
        .otherwise(F.lit(0).cast("bigint"))
        .alias(f"m{w}")
        for w in range(_NW)
    ]
    visited = sj.select(F.col("seed").alias("node"), *mask_cols)
    frontier = visited
    delta_counts = []
    for k in range(1, _KHOP + 1):
        expanded = (
            frontier.join(edges, F.col("node") == F.col("src"))
            .groupBy(F.col("dst").alias("nxt"))
            .agg(*[F.bit_or(f"m{w}").alias(f"e{w}") for w in range(_NW)])
        )
        merged = expanded.join(
            visited, F.col("nxt") == F.col("node"), "left"
        ).select(
            "nxt",
            *[
                # new bits = expanded & ~visited; Column's & / ~ are
                # BOOLEAN ops, so bitwise forms: bitwiseAND, xor -1
                F.col(f"e{w}")
                .bitwiseAND(
                    F.coalesce(F.col(f"m{w}"), F.lit(0).cast("bigint")).bitwiseXOR(
                        F.lit(-1).cast("bigint")
                    )
                )
                .alias(f"n{w}")
                for w in range(_NW)
            ],
            *[F.coalesce(F.col(f"m{w}"), F.lit(0).cast("bigint")).alias(f"v{w}") for w in range(_NW)],
        )
        frontier = (
            merged.filter(
                " or ".join(f"n{w} != 0" for w in range(_NW))
            )
            .select(F.col("nxt").alias("node"), *[F.col(f"n{w}").alias(f"m{w}") for w in range(_NW)])
            .localCheckpoint(eager=True)
        )
        # visited = old visited ∪ (merged rows with their bits OR'd in);
        # nodes seen for the first time arrive purely from frontier
        visited = (
            visited.join(frontier.select(F.col("node").alias("fn"), *[F.col(f"m{w}").alias(f"f{w}") for w in range(_NW)]),
                         F.col("node") == F.col("fn"), "full")
            .select(
                F.coalesce(F.col("node"), F.col("fn")).alias("node"),
                *[
                    F.coalesce(F.col(f"m{w}"), F.lit(0).cast("bigint"))
                    .bitwiseOR(F.coalesce(F.col(f"f{w}"), F.lit(0).cast("bigint")))
                    .alias(f"m{w}")
                    for w in range(_NW)
                ],
            )
            .localCheckpoint(eager=True)
        )
        # per-seed delta count: explode the frontier bitsets to set bit
        # positions (|frontier| x 448 generated rows, one shuffle)
        bits = frontier.select(
            F.posexplode(F.array(*[F.col(f"m{w}") for w in range(_NW)])).alias("w", "bits")
        ).filter(F.col("bits") != 0)
        cnt = (
            bits.select("w", "bits", F.explode(F.sequence(F.lit(0), F.lit(63))).alias("b"))
            .filter(F.expr("(bits >> b) & 1") == 1)
            .select((F.col("w") * 64 + F.col("b")).alias("j"))
            .groupBy("j")
            .agg(F.count(F.lit(1)).cast("bigint").alias(f"d_{k}"))
        )
        delta_counts.append(cnt)
    out = sj
    for c in delta_counts:
        out = out.join(c, "j", "left")
    running = F.lit(0).cast("bigint")
    reach_cols = []
    for k in range(1, _KHOP + 1):
        running = running + F.coalesce(F.col(f"d_{k}"), F.lit(0))
        reach_cols.append(running.cast("bigint").alias(f"reach_{k}"))
    return out.select("seed", *reach_cols).orderBy("seed")


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark()
    # warm the shared edge build once so neither variant pays it
    cotx_edges(spark, sf).count()

    variants = {"old": khop_old, "new": gr_khop_reach, "bitmap": khop_bitmap}
    times: dict[str, list[float]] = {k: [] for k in variants}
    rows: dict[str, int] = {}
    values: dict[str, list] = {}
    for rep in range(reps):
        for name, fn in variants.items():
            t0 = time.monotonic()
            df = fn(spark, sf)
            if rep == 0:
                vals = sorted(map(tuple, df.collect()))
                values[name] = vals
                rows[name] = len(vals)
                times[name].append(round(time.monotonic() - t0, 3))
            else:
                rows[name] = df.count()
                times[name].append(round(time.monotonic() - t0, 3))
    base = values["new"]
    for name, vals in values.items():
        assert vals == base, f"{name} output differs from new"
    # within-session interleaving makes the COMPARISON drift-immune;
    # the calibration keys make the ABSOLUTE seconds readable across
    # records too (VERDICT-r6 ask #7)
    import bench

    result = {
        "sf": sf,
        "reps": reps,
        "rows": rows["new"],
        **bench.measure_drift(spark),
        "times": times,
        "median": {k: round(statistics.median(v), 3) for k, v in times.items()},
        "winner": min(times, key=lambda k: statistics.median(times[k])),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
