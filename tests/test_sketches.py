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
