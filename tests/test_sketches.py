"""Sketch aggregates: approximate results must sit inside their
published error bounds of the exact answers."""

from __future__ import annotations

from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.plans.fixture_queries import (
    ap_approx_stats,
    ap_exact_quantiles,
)
from movie_data_etl_pipeline_spark.sources import load_table


def test_hll_within_rsd(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    approx = {r["event_type"]: r["approx_users"] for r in ap_approx_stats(spark, sf_dir).collect()}
    assert approx.keys() == exact.keys()
    for et, n in exact.items():
        # rsd=0.02 → allow 4 sigma
        assert abs(approx[et] - n) <= max(2, 0.08 * n), (et, approx[et], n)


def test_quantile_sketch_near_exact(spark, sf_dir):
    exact = {r["event_type"]: r["p50"] for r in ap_exact_quantiles(spark, sf_dir).collect()}
    approx = {r["event_type"]: r["approx_p50"] for r in ap_approx_stats(spark, sf_dir).collect()}
    for et, p50 in exact.items():
        # accuracy 10000 → rank error ≤ n/10000; values are dense doubles,
        # allow 5% relative drift
        assert abs(approx[et] - p50) <= 0.05 * max(p50, 1.0), (et, approx[et], p50)


def test_hll_profile_rollup_merge_consistency(spark, sf_dir, tmp_path):
    """The pre-aggregation contract: (a) rolling up stored cell
    sketches gives the SAME estimate as sketching the raw data
    directly at the coarse grain (merge transparency); (b) the profile
    survives a parquet round trip (sketches are data); (c) estimates
    sit within the lg_k=14 error bound of exact; (d) merging a
    re-delivered copy of every cell changes nothing (idempotence)."""
    from movie_data_etl_pipeline_spark.operators import sketches

    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "event_type", "user_id"
    )
    prof = sketches.hll_profile(ev, ["day", "event_type"], "user_id")

    # (b) sketches are storable columns
    path = str(tmp_path / "profile")
    prof.write.parquet(path)
    stored = spark.read.parquet(path)

    # (a) rollup-from-profile == direct sketch at the coarse grain
    via_profile = {
        r["event_type"]: r["n_distinct_est"]
        for r in sketches.hll_rollup(stored, ["event_type"]).collect()
    }
    direct = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(sketches.DEFAULT_LG_K))
            ).alias("n")
        )
        .collect()
    }
    assert via_profile == direct

    # (c) within ~3x the 0.8% RSE of exact
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for k, est in via_profile.items():
        assert abs(est - exact[k]) <= max(3, 0.025 * exact[k])

    # (d) idempotence under re-delivery
    doubled = {
        r["event_type"]: r["n_distinct_est"]
        for r in sketches.hll_rollup(stored.unionAll(stored), ["event_type"]).collect()
    }
    assert doubled == via_profile
