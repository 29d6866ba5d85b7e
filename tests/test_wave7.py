"""Semantic invariants of the wave-7 operators (plans/wave7.py) on the
sf0.001 fixtures."""

from __future__ import annotations

import math

from movie_data_etl_pipeline_spark.plans import wave7
from movie_data_etl_pipeline_spark.sources import load_table

from pyspark.sql import functions as F


def test_session_entropy_conserves_users_and_bounds(spark, sf_dir):
    out = wave7.ev_session_entropy(spark, sf_dir).collect()
    total = sum(r["n_users"] for r in out)
    n_users = (
        load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert total == n_users
    # entropy of a 5-type distribution is bounded by ln 5
    assert all(0 <= r["h_bin"] * 0.02 <= math.log(5) + 0.02 for r in out)


def test_mk_trend_bounds(spark, sf_dir):
    r = wave7.ts_mk_trend(spark, sf_dir).collect()[0]
    n = r["n_days"]
    assert abs(r["mk_s"]) <= n * (n - 1) // 2
    assert r["trend"] in ("increasing", "decreasing", "no_trend")


def test_hhi_bounds(spark, sf_dir):
    rows = wave7.ag_hhi(spark, sf_dir).collect()
    for r in rows:
        # 1/k <= HHI <= 1
        assert 1.0 / r["n_suppliers"] - 1e-6 <= r["hhi"] <= 1.0 + 1e-9


def test_kfold_covers_all_rows(spark, sf_dir):
    rows = wave7.sa_kfold_assign(spark, sf_dir).collect()
    assert {r["fold"] for r in rows} <= set(range(5))
    total = sum(r["n_rows"] for r in rows)
    assert total == load_table(spark, sf_dir, "orders").count()
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-4


def test_cov_audit_symmetric_psd_diag(spark, sf_dir):
    rows = wave7.emb_cov_audit(spark, sf_dir).collect()
    assert len(rows) == 36  # upper triangle of 8x8
    diag = {r["i"]: r["cov"] for r in rows if r["i"] == r["j"]}
    assert len(diag) == 8
    assert all(v >= 0 for v in diag.values())  # variances
    for r in rows:  # |cov(i,j)| <= sqrt(var_i * var_j) (Cauchy-Schwarz)
        bound = math.sqrt(diag[r["i"]] * diag[r["j"]]) + 1e-9
        assert abs(r["cov"]) <= bound


def test_record_days_strictly_increasing(spark, sf_dir):
    rows = wave7.w7_record_days(spark, sf_dir).collect()
    assert rows, "at least the first day is a record"
    revs = [r["revenue_c"] for r in rows]
    assert revs == sorted(revs) and len(set(revs)) == len(revs)
    for r in rows:
        assert r["revenue_c"] > r["prev_record_c"]
    # record count on a ~stationary series is O(ln n) — sanity ceiling
    n_days = (
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_orderdate").cast("date"))
        .distinct()
        .count()
    )
    assert len(rows) <= max(25, 5 * math.log(n_days + 1))
