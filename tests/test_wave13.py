"""Semantic invariants of the wave-13 operators (plans/wave13.py) on
the sf0.001 fixtures."""

from __future__ import annotations

from datetime import timedelta

from movie_data_etl_pipeline_spark.plans import wave13
from movie_data_etl_pipeline_spark.sources import load_table

from pyspark.sql import functions as F


def test_time_rollup_levels_reconcile(spark, sf_dir):
    rows = wave13.g4_time_rollup(spark, sf_dir).collect()
    months = [r for r in rows if r["m"] is not None]
    quarters = [r for r in rows if r["m"] is None and r["q"] is not None]
    years = [r for r in rows if r["q"] is None and r["y"] is not None]
    grand = [r for r in rows if r["y"] is None]
    assert len(grand) == 1
    assert grand[0]["rev_c"] == sum(r["rev_c"] for r in months)
    assert grand[0]["n_orders"] == load_table(spark, sf_dir, "orders").count()
    # each quarter subtotal equals the sum of its months
    for qr in quarters:
        ms = [r for r in months if r["y"] == qr["y"] and r["q"] == qr["q"]]
        assert qr["rev_c"] == sum(r["rev_c"] for r in ms)
    for yr in years:
        qs = [r for r in quarters if r["y"] == yr["y"]]
        assert yr["rev_c"] == sum(r["rev_c"] for r in qs)


def test_yoy_alignment_and_identity(spark, sf_dir):
    rows = wave13.w9_yoy_change(spark, sf_dir).collect()
    by_month = {r["month"]: r for r in rows}
    for r in rows:
        y, m = map(int, r["month"].split("-"))
        prev_key = f"{y - 1}-{m:02d}"
        if r["yoy_growth"] is not None:
            assert prev_key in by_month
            assert r["prev_rev_c"] == by_month[prev_key]["rev_c"]
            expect = (r["rev_c"] - r["prev_rev_c"]) / r["prev_rev_c"]
            assert abs(r["yoy_growth"] - expect) < 1e-6
        else:
            assert prev_key not in by_month
    # with a multi-year fixture, most months have a YoY partner
    assert sum(r["yoy_growth"] is not None for r in rows) > len(rows) // 2


def test_streaks_match_python_reference(spark, sf_dir):
    rows = {r["user_id"]: r for r in wave13.ev_streaks(spark, sf_dir).collect()}
    ud = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("d"))
        .distinct()
        .collect()
    )
    days: dict[int, list] = {}
    for r in ud:
        days.setdefault(r["user_id"], []).append(r["d"])
    for uid, ds in days.items():
        ds.sort()
        best_len, best_start = 1, ds[0]
        cur_len, cur_start = 1, ds[0]
        for a, b in zip(ds, ds[1:]):
            if b - a == timedelta(days=1):
                cur_len += 1
            else:
                cur_len, cur_start = 1, b
            if cur_len > best_len:
                best_len, best_start = cur_len, cur_start
        r = rows[uid]
        assert r["best_streak_days"] == best_len
        assert r["streak_start"] == best_start.strftime("%Y-%m-%d")
    assert set(rows) == set(days)
