"""Semantic invariants of the wave-10 operators (plans/wave10.py) on
the sf0.001 fixtures."""

from __future__ import annotations

from movie_data_etl_pipeline_spark.operators import merge
from movie_data_etl_pipeline_spark.plans import wave10
from movie_data_etl_pipeline_spark.sources import load_table

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# w8_pareto_front
# ---------------------------------------------------------------------------


def test_pareto_front_is_exactly_the_nondominated_set(spark, sf_dir):
    front = {
        (r["l_suppkey"], r["rev_c"], r["last_ship"])
        for r in wave10.w8_pareto_front(spark, sf_dir).collect()
    }
    sup = [
        (r["l_suppkey"], r["rev_c"], r["last_ship"])
        for r in load_table(spark, sf_dir, "lineitem")
        .groupBy("l_suppkey")
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")).alias("rev_c"),
            F.date_format(F.max("l_shipdate"), "yyyy-MM-dd HH:mm:ss").alias("last_ship"),
        )
        .collect()
    ]

    def dominated(p, q):  # q dominates p
        return (
            q[1] >= p[1]
            and q[2] >= p[2]
            and (q[1] > p[1] or q[2] > p[2])
        )

    expected = {
        p for p in sup if not any(dominated(p, q) for q in sup if q is not p)
    }
    assert front == expected
    assert front  # nonempty at every sf


# ---------------------------------------------------------------------------
# sa_neyman_alloc
# ---------------------------------------------------------------------------


def test_neyman_allocation_budget_and_realization(spark, sf_dir):
    rows = wave10.sa_neyman_alloc(spark, sf_dir).collect()
    assert len(rows) >= 2
    total_alloc = sum(r["alloc_n"] for r in rows)
    # per-stratum independent rounding keeps the total within ±#strata
    assert abs(total_alloc - wave10._NEYMAN_BUDGET) <= len(rows)
    n = load_table(spark, sf_dir, "orders").count()
    assert sum(r["n_rows"] for r in rows) == n
    for r in rows:
        assert r["sd_c"] >= 0
        assert 0 <= r["sampled_n"] <= r["n_rows"]
        # hash-threshold realization concentrates near the target
        # (binomial: ±5σ slack)
        import math

        f = min(1.0, r["alloc_n"] / r["n_rows"])
        sigma = math.sqrt(r["n_rows"] * f * (1 - f))
        assert abs(r["sampled_n"] - f * r["n_rows"]) <= 5 * sigma + 1


# ---------------------------------------------------------------------------
# o15 / merge.partition_overwrite
# ---------------------------------------------------------------------------


def test_partition_overwrite_replaces_wholesale(spark):
    target = spark.createDataFrame(
        [("2024-01", 1, "a"), ("2024-01", 2, "b"), ("2024-02", 3, "c")],
        "pm string, k int, v string",
    )
    updates = spark.createDataFrame(
        [("2024-01", 9, "z")], "pm string, k int, v string"
    )
    out = {(r["pm"], r["k"], r["v"]) for r in
           merge.partition_overwrite(target, updates, ["pm"]).collect()}
    # 2024-01 replaced wholesale (rows 1 and 2 gone), 2024-02 untouched
    assert out == {("2024-01", 9, "z"), ("2024-02", 3, "c")}


def test_partition_overwrite_is_idempotent(spark, sf_dir):
    once = wave10.o15_partition_overwrite(spark, sf_dir)
    o = load_table(spark, sf_dir, "orders")
    # every 1996 row in the result came from the batch (status V,
    # even keys only); non-1996 rows pass through byte-identical
    res_1996 = once.filter(F.col("pm").startswith("1996"))
    assert res_1996.filter(F.col("o_orderstatus") != "V").count() == 0
    assert res_1996.filter(F.col("o_orderkey") % 2 != 0).count() == 0
    n_other_in = o.filter(
        ~F.date_format("o_orderdate", "yyyy-MM").startswith("1996")
    ).count()
    assert once.filter(~F.col("pm").startswith("1996")).count() == n_other_in


# ---------------------------------------------------------------------------
# ts_seasonal_outliers
# ---------------------------------------------------------------------------


def test_seasonal_outliers_cover_trend_days(spark, sf_dir):
    rows = wave10.ts_seasonal_outliers(spark, sf_dir).collect()
    n_days = (
        load_table(spark, sf_dir, "events").select(F.to_date("ts")).distinct().count()
    )
    # exactly the full-window (trend-defined) days are scored
    assert len(rows) == n_days - 6
    flagged = [r for r in rows if r["is_outlier"] == 1]
    # robust flagging is conservative: fewer than half the days
    assert len(flagged) < len(rows) / 2
    for r in rows:
        assert r["is_outlier"] in (0, 1)
