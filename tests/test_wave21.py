"""Semantic invariants of the wave-21 operators (plans/wave21.py) on
the sf0.001 fixtures."""

from __future__ import annotations

from movie_data_etl_pipeline_spark.plans import wave21
from movie_data_etl_pipeline_spark.sources import load_table

from pyspark.sql import functions as F


def test_its_identities_and_segment_counts(spark, sf_dir):
    r = wave21.ts_intervention_impact(spark, sf_dir).collect()[0]
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.count(F.lit(1)))
    )
    cutoff = wave21._ITS_CUTOFF
    n_pre = daily.filter(F.col("d") < F.lit(cutoff).cast("date")).count()
    assert r["n_pre"] == n_pre
    assert r["n_post"] == daily.count() - n_pre
    assert abs(r["slope_change"] - (r["slope_post"] - r["slope_pre"])) < 2e-6
    # the fixture has no engineered intervention: the level change is
    # small relative to the typical daily revenue (sanity, not pinning)
    assert r["n_pre"] > 30 and r["n_post"] > 30


def test_round_number_bias_accounting(spark, sf_dir):
    rows = wave21.qa_round_number_bias(spark, sf_dir).collect()
    o = load_table(spark, sf_dir, "orders")
    assert sum(r["n"] for r in rows) == o.count()
    for r in rows:
        assert 0 <= r["round_hits"] <= r["n"]
        assert r["biased"] == (1 if 100 * r["round_hits"] > 3 * r["n"] else 0)
    # continuous synthetic prices: whole-dollar mass stays near 1%
    total_hits = sum(r["round_hits"] for r in rows)
    assert total_hits < 0.05 * o.count()


def test_fano_matches_python(spark, sf_dir):
    rows = {r["event_type"]: r for r in wave21.ts_fano_factor(spark, sf_dir).collect()}
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    per: dict[str, list[int]] = {}
    for r in daily:
        per.setdefault(r["event_type"], []).append(r["c"])
    for t, cs in per.items():
        n = len(cs)
        mean = sum(cs) / n
        var = sum(c * c for c in cs) / n - mean * mean
        assert abs(rows[t]["fano"] - var / mean) < 1e-4
        assert rows[t]["n_days"] == n
        assert rows[t]["fano"] > 0
