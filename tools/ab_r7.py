"""Interleaved same-session A/B for the round-7 optimization basket:

- gr_bipartite_project: (partkey,suppkey)-distinct self-join (HEAD) vs
  array-form pair generation (groupBy(part) -> sorted supplier set ->
  map-side ordered-pair explode) — the shape proven 2.4x on
  gr_link_prediction (tools/ab_linkpred.py).
- ev_rfm_segments: HEAD vs `cust` localCheckpointed (the per-customer
  base is consumed by three histogram pipelines + the value joins; HEAD
  replays the orders scan for each).
- ag_levene_bf: HEAD vs the two 5-row relations (med, g) eagerly
  localCheckpointed (HEAD replays the orders scan per consumer).
- emb_pca_power: HEAD's explode(64 cells)+groupBy vs one single-row
  aggregation of the 36 symmetric cross-moments (no 64x row
  amplification; the 64-row cov matrix is rebuilt from literals).

Value equality asserted per variant pair. Usage:
    python tools/ab_r7.py [SF_DIR] [REPS] [exp ...]
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.sources import load_table
from movie_data_etl_pipeline_spark.functions import scalar as SC
from movie_data_etl_pipeline_spark.plans.wave6 import gr_bipartite_project
from movie_data_etl_pipeline_spark.plans.wave9 import emb_pca_power
from movie_data_etl_pipeline_spark.plans.wave39 import ev_rfm_segments, _quintile_map
from movie_data_etl_pipeline_spark.plans.wave50 import ag_levene_bf, _PRIORITIES

_COPART_MIN = 150
_PCA_DIMS = 8
_PCA_ROUNDS = 3


# ---------------------------------------------------------------- bipartite
def bipartite_arrayform(spark: SparkSession, sf: str) -> DataFrame:
    grp = (
        load_table(spark, sf, "lineitem")
        .groupBy("l_partkey")
        .agg(F.array_sort(F.collect_set("l_suppkey")).alias("ss"))
        .filter(F.size("ss") >= 2)
    )
    pairs = grp.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ss"),
                    lambda x, i: F.transform(
                        F.slice(
                            F.col("ss"), i + 2,
                            F.greatest(F.size("ss") - i - 1, F.lit(0)),
                        ),
                        lambda y: F.struct(x.alias("s1"), y.alias("s2")),
                    ),
                )
            )
        ).alias("pr")
    ).select("pr.s1", "pr.s2")
    return (
        pairs.groupBy("s1", "s2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_co_parts"))
        .filter(F.col("n_co_parts") >= _COPART_MIN)
        .orderBy(F.desc("n_co_parts"), "s1", "s2")
    )


# ---------------------------------------------------------------- rfm
def rfm_checkpointed(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders").select(
        "o_custkey", "o_orderdate", SC.cents("o_totalprice").alias("cents")
    )
    hwm = o.agg(F.max("o_orderdate").alias("hwm"))
    cust = (
        o.join(F.broadcast(hwm))
        .groupBy("o_custkey")
        .agg(
            F.min(F.datediff(F.col("hwm"), F.col("o_orderdate")))
            .cast("bigint")
            .alias("rec"),
            F.count(F.lit(1)).cast("bigint").alias("freq"),
            F.sum("cents").cast("bigint").alias("money"),
        )
        .localCheckpoint(eager=True)
    )
    rmap = _quintile_map(cust.select("rec"), "rec")
    fmap = _quintile_map(cust.select("freq"), "freq")
    mmap = _quintile_map(cust.select("money"), "money")
    tagged = cust.join(rmap, "rec").join(fmap, "freq").join(mmap, "money")
    return (
        tagged.groupBy("rec_q", "freq_q", "money_q")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_cust"),
            F.sum("rec").cast("bigint").alias("sum_rec_days"),
            F.sum("freq").cast("bigint").alias("sum_orders"),
            F.sum("money").cast("bigint").alias("sum_cents"),
        )
        .orderBy("rec_q", "freq_q", "money_q")
    )


# ---------------------------------------------------------------- levene
def levene_checkpointed(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        F.floor("o_totalprice").cast("bigint").alias("x"),
    )
    hist = o.groupBy("grp", "x").agg(F.count(F.lit(1)).cast("bigint").alias("n_v"))
    wcum = Window.partitionBy("grp").orderBy("x").rowsBetween(
        Window.unboundedPreceding, -1
    )
    tot = hist.groupBy("grp").agg(F.sum("n_v").cast("bigint").alias("n_g"))
    med = (
        hist.withColumn("cum", F.coalesce(F.sum("n_v").over(wcum), F.lit(0)))
        .join(tot, "grp")
        .filter(
            (2 * (F.col("cum") + F.col("n_v")) >= F.col("n_g"))
            & (2 * F.col("cum") < F.col("n_g"))
        )
        .groupBy("grp")
        .agg(F.min("x").cast("bigint").alias("med"))
        .localCheckpoint(eager=True)
    )
    z = o.join(F.broadcast(med), "grp").select(
        "grp", F.abs(F.col("x") - F.col("med")).alias("z")
    )
    g = (
        z.groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_g"),
            F.sum("z").cast("bigint").alias("sz"),
            F.sum(F.col("z") * F.col("z")).cast("bigint").alias("szz"),
        )
        .localCheckpoint(eager=True)
    )
    piv_aggs = []
    for i, p in enumerate(_PRIORITIES):
        for c in ("n_g", "sz", "szz"):
            piv_aggs.append(
                F.max(F.when(F.col("grp") == p, F.col(c))).alias(f"{c}_{i}")
            )
    one = g.agg(*piv_aggs)

    def chain(terms):
        out = terms[0]
        for t in terms[1:]:
            out = out + t
        return out

    n_total = chain([F.col(f"n_g_{i}") for i in range(5)]).cast("bigint")
    sz_total = chain([F.col(f"sz_{i}") for i in range(5)]).cast("bigint")
    one = one.withColumn("n", n_total).withColumn("sz_all", sz_total)
    zbar = F.col("sz_all").cast("double") / F.col("n").cast("double")
    between = chain(
        [
            F.col(f"n_g_{i}").cast("double")
            * (F.col(f"sz_{i}").cast("double") / F.col(f"n_g_{i}").cast("double") - zbar)
            * (F.col(f"sz_{i}").cast("double") / F.col(f"n_g_{i}").cast("double") - zbar)
            for i in range(5)
        ]
    )
    within = chain(
        [
            F.col(f"szz_{i}").cast("double")
            - F.col(f"n_g_{i}").cast("double")
            * (F.col(f"sz_{i}").cast("double") / F.col(f"n_g_{i}").cast("double"))
            * (F.col(f"sz_{i}").cast("double") / F.col(f"n_g_{i}").cast("double"))
            for i in range(5)
        ]
    )
    w_row = one.select(
        "n",
        (
            ((F.col("n") - 5).cast("double") / F.lit(4.0)) * between / within
        ).alias("w_stat"),
    )
    return (
        g.join(med, "grp")
        .join(F.broadcast(w_row))
        .select(
            "grp",
            "n_g",
            F.col("med").alias("median_dollars"),
            "sz",
            "szz",
            "n",
            "w_stat",
        )
        .orderBy("grp")
    )


# ---------------------------------------------------------------- pca
def pca_single_agg(spark: SparkSession, sf: str) -> DataFrame:
    emb = load_table(spark, sf, "embeddings").select(
        F.transform(
            F.col("embedding"),
            lambda x: F.round(x.cast("double") * 1e6).cast("bigint"),
        ).alias("e")
    )
    dec38 = "decimal(38,0)"
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n")]
    for i in range(_PCA_DIMS):
        aggs.append(
            F.sum(F.element_at("e", i + 1).cast(dec38)).alias(f"s_{i}")
        )
    for i in range(_PCA_DIMS):
        for j in range(i, _PCA_DIMS):
            aggs.append(
                F.sum(
                    (F.element_at("e", i + 1) * F.element_at("e", j + 1)).cast(dec38)
                ).alias(f"q_{i}_{j}")
            )
    one = emb.agg(*aggs)
    nn = F.col("n").cast("double")

    def cov_n(i: int, j: int):
        lo, hi = min(i, j), max(i, j)
        cov = (
            (
                nn * F.col(f"q_{lo}_{hi}").cast("double")
                - F.col(f"s_{i}").cast("double") * F.col(f"s_{j}").cast("double")
            )
            / (nn * nn)
            / F.lit(1e12)
        )
        return F.round(cov * 1e9).cast("bigint")

    m = (
        one.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).cast("int").alias("i"),
                            F.lit(j).cast("int").alias("j"),
                            cov_n(i, j).alias("cov_n"),
                        )
                        for i in range(_PCA_DIMS)
                        for j in range(_PCA_DIMS)
                    ]
                )
            ).alias("c")
        )
        .select("c.i", "c.j", "c.cov_n")
        .localCheckpoint(eager=True)
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    v = spark.range(_PCA_DIMS).select(
        F.col("id").alias("j"), F.lit(10**9).cast("bigint").alias("vn")
    )
    norm_expr = None
    for _ in range(_PCA_ROUNDS):
        u = (
            m.join(v, "j")
            .groupBy("i")
            .agg(F.sum(dec("cov_n") * F.col("vn")).alias("u"))
        )
        one_r = u.groupBy().agg(
            *[
                F.max(F.when(F.col("i") == k, F.col("u").cast("double"))).alias(f"u{k}")
                for k in range(_PCA_DIMS)
            ]
        )
        sq = F.col("u0") * F.col("u0")
        for k in range(1, _PCA_DIMS):
            sq = sq + F.col(f"u{k}") * F.col(f"u{k}")
        one_r = one_r.withColumn("norm", F.sqrt(sq))
        norm_expr = one_r.select("norm")
        v = one_r.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(k).cast("bigint").alias("j"),
                            F.round(F.lit(1e9) * F.col(f"u{k}") / F.col("norm"))
                            .cast("bigint")
                            .alias("vn"),
                        )
                        for k in range(_PCA_DIMS)
                    ]
                )
            ).alias("s")
        ).select("s.j", "s.vn")
    lam = norm_expr.select(F.round(F.col("norm") / 1e18, 6).alias("lambda1"))
    return (
        v.crossJoin(F.broadcast(lam))
        .select(
            F.col("j").alias("i"),
            F.round(F.col("vn") / 1e9, 6).alias("v"),
            "lambda1",
        )
        .orderBy("i")
    )


EXPERIMENTS = {
    "bipartite": {"head": gr_bipartite_project, "new": bipartite_arrayform},
    "rfm": {"head": ev_rfm_segments, "new": rfm_checkpointed},
    "levene": {"head": ag_levene_bf, "new": levene_checkpointed},
    "pca": {"head": emb_pca_power, "new": pca_single_agg},
}


def main() -> None:
    from movie_data_etl_pipeline_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 and "/" in sys.argv[1] else "/root/testdata/sf0.1"
    rest = [a for a in sys.argv[1:] if "/" not in a]
    reps = int(rest[0]) if rest and rest[0].isdigit() else 4
    names = [a for a in rest if not a.isdigit()] or list(EXPERIMENTS)
    spark = get_spark()
    out = {}
    for exp in names:
        variants = EXPERIMENTS[exp]
        times = {k: [] for k in variants}
        values = {}
        for rep in range(reps):
            for vname, fn in variants.items():
                t0 = time.monotonic()
                df = fn(spark, sf)
                if rep == 0:
                    values[vname] = sorted(map(tuple, df.collect()))
                else:
                    df.write.format("noop").mode("overwrite").save()
                times[vname].append(round(time.monotonic() - t0, 3))
        assert values["new"] == values["head"], f"{exp}: output differs"
        out[exp] = {
            "rows": len(values["head"]),
            "times": times,
            "median": {k: round(statistics.median(v), 3) for k, v in times.items()},
        }
    import bench

    print(json.dumps({"sf": sf, "reps": reps, **bench.measure_drift(spark), "experiments": out}))


if __name__ == "__main__":
    main()
