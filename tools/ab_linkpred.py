"""Interleaved A/B for gr_link_prediction's candidate-pair stage:
posting-list self-join (HEAD) vs array-form pair generation
(groupBy(part) → sorted customer array → map-side ordered-pair
explode). Same session, warm shared copurchase build, value equality
asserted. Usage: python tools/ab_linkpred.py [SF_DIR] [REPS]
"""

from __future__ import annotations

import json
import statistics
import sys
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.plans.graph_edges import copurchase_pairs
from movie_data_etl_pipeline_spark.plans.wave25 import gr_link_prediction


def linkpred_arrayform(spark: SparkSession, sf: str) -> DataFrame:
    cs = copurchase_pairs(spark, sf).select("c", F.col("p").alias("s"))
    deg = cs.groupBy("c").agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    groups = (
        cs.groupBy("s")
        .agg(F.array_sort(F.collect_list("c")).alias("cu"))
        .filter(F.size("cu") <= 200)   # hub cut == fan <= 200
        .filter(F.size("cu") >= 2)
    )
    pairs = groups.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("cu"),
                    lambda x, i: F.transform(
                        F.slice(
                            F.col("cu"), i + 2,
                            F.greatest(F.size("cu") - i - 1, F.lit(0)),
                        ),
                        lambda y: F.struct(x.alias("c_a"), y.alias("c_b")),
                    ),
                )
            )
        ).alias("pr")
    ).select("pr.c_a", "pr.c_b")
    shared = (
        pairs.groupBy("c_a", "c_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
    )
    return (
        shared.join(deg.select(F.col("c").alias("c_a"), F.col("deg").alias("deg_a")), "c_a")
        .join(deg.select(F.col("c").alias("c_b"), F.col("deg").alias("deg_b")), "c_b")
        .select(
            "c_a",
            "c_b",
            "n_shared",
            F.round(
                F.col("n_shared").cast("double")
                / (F.col("deg_a") + F.col("deg_b") - F.col("n_shared")).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), "c_a", "c_b")
        .limit(100)
    )


def linkpred_joinform(spark: SparkSession, sf: str) -> DataFrame:
    """The pre-round-6 posting-list self-join form."""
    cs = copurchase_pairs(spark, sf).select("c", F.col("p").alias("s"))
    deg = cs.groupBy("c").agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    hub_ok = (
        cs.groupBy("s")
        .agg(F.count(F.lit(1)).alias("fan"))
        .filter(F.col("fan") <= 200)
        .select("s")
    )
    p = cs.join(hub_ok, "s")
    shared = (
        p.alias("a")
        .join(p.alias("b"), (F.col("a.s") == F.col("b.s")) & (F.col("a.c") < F.col("b.c")))
        .groupBy(F.col("a.c").alias("c_a"), F.col("b.c").alias("c_b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
    )
    return (
        shared.join(deg.select(F.col("c").alias("c_a"), F.col("deg").alias("deg_a")), "c_a")
        .join(deg.select(F.col("c").alias("c_b"), F.col("deg").alias("deg_b")), "c_b")
        .select(
            "c_a",
            "c_b",
            "n_shared",
            F.round(
                F.col("n_shared").cast("double")
                / (F.col("deg_a") + F.col("deg_b") - F.col("n_shared")).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), "c_a", "c_b")
        .limit(100)
    )


def main() -> None:
    from movie_data_etl_pipeline_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark()
    copurchase_pairs(spark, sf).count()  # warm the shared base

    variants = {
        "join": linkpred_joinform,
        "array1pass": linkpred_arrayform,
        "prod": gr_link_prediction,
    }
    times = {k: [] for k in variants}
    values = {}
    for rep in range(reps):
        for name, fn in variants.items():
            t0 = time.monotonic()
            df = fn(spark, sf)
            if rep == 0:
                values[name] = sorted(map(tuple, df.collect()))
                times[name].append(round(time.monotonic() - t0, 3))
            else:
                df.write.format("noop").mode("overwrite").save()
                times[name].append(round(time.monotonic() - t0, 3))
    base = values["prod"]
    for name, vals in values.items():
        assert vals == base, f"{name} output differs"
    # within-session interleaving makes the COMPARISON drift-immune;
    # the calibration keys make the ABSOLUTE seconds readable across
    # records too (VERDICT-r6 ask #7)
    import bench

    print(json.dumps({
        "sf": sf, "reps": reps, "rows": len(values["prod"]),
        **bench.measure_drift(spark),
        "times": times,
        "median": {k: round(statistics.median(v), 3) for k, v in times.items()},
        "winner": min(times, key=lambda k: statistics.median(times[k])),
    }))


if __name__ == "__main__":
    main()
