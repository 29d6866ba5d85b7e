"""Semantic invariants of the wave-22 operators (plans/wave22.py) on
the sf0.001 fixtures."""

from __future__ import annotations

from movie_data_etl_pipeline_spark.plans import wave22
from movie_data_etl_pipeline_spark.sources import load_table

from pyspark.sql import functions as F


def test_hourly_profile_conserves_and_one_peak(spark, sf_dir):
    rows = wave22.ev_hourly_profile(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    assert sum(r["n"] for r in rows) == ev.count()
    by_type: dict[str, list] = {}
    for r in rows:
        assert 0 <= r["hr"] <= 23
        by_type.setdefault(r["event_type"], []).append(r)
    for t, group in by_type.items():
        peaks = [r for r in group if r["is_peak"] == 1]
        assert len(peaks) == 1
        assert peaks[0]["n"] == max(r["n"] for r in group)
        assert abs(sum(r["share"] for r in group) - 1.0) < 1e-3


def test_cross_source_dups_skeleton_and_symmetric_bound(spark, sf_dir):
    rows = wave22.dd_cross_source_dups(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    n_src = docs.select("source").distinct().count()
    assert len(rows) == n_src * (n_src - 1) // 2
    for r in rows:
        assert r["source_a"] < r["source_b"]
        assert r["shared_fps"] >= 0
    # total cross-source shared fingerprints is bounded by the number
    # of fingerprints appearing in more than one source
    fp_multi = (
        docs.select(
            "source",
            F.md5(
                F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))
            ).alias("fp"),
        )
        .distinct()
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("k"))
        .filter(F.col("k") > 1)
        .select(F.sum(F.col("k") * (F.col("k") - 1) / 2).alias("pairs"))
        .collect()[0]["pairs"]
    )
    total = sum(r["shared_fps"] for r in rows)
    assert total == int(fp_multi or 0)
