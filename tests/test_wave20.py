"""Semantic invariants of the wave-20 surface queries
(plans/wave20.py) on the sf0.001 fixtures."""

from __future__ import annotations

from datetime import date

from movie_data_etl_pipeline_spark.plans import wave20
from movie_data_etl_pipeline_spark.sources import load_table

from pyspark.sql import functions as F


def test_generator_fanout_is_exact(spark, sf_dir):
    rows = wave20.fn_generator_surface(spark, sf_dir).collect()
    base = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 37 == 0
    )
    assert len(rows) == 3 * base.count()
    by_key: dict[int, list] = {}
    for r in rows:
        by_key.setdefault(r["o_orderkey"], []).append(r)
    for k, group in by_key.items():
        assert sorted(r["pos"] for r in group) == [0, 1, 2]
        metrics = {r["metric"]: r["val"] for r in group}
        assert set(metrics) == {"price_c", "custkey", "year"}
        assert 1990 < metrics["year"] < 2010


def test_datetime_surface_calendar_identities(spark, sf_dir):
    rows = wave20.fn_datetime_surface(spark, sf_dir).collect()
    assert rows
    for r in rows:
        d = date.fromisoformat(r["d"])
        me = date.fromisoformat(r["month_end"])
        qs = date.fromisoformat(r["quarter_start"])
        p7 = date.fromisoformat(r["plus_7m"])
        assert me.month == d.month and me.year == d.year and me >= d
        assert qs <= d and qs.month in (1, 4, 7, 10) and qs.day == 1
        assert (p7.year * 12 + p7.month) - (d.year * 12 + d.month) == 7
        assert 1 <= r["doy"] <= 366
        assert 1 <= r["iso_week"] <= 53
        assert 1 <= r["days_to_next_q"] <= 92
