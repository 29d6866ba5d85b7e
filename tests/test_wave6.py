"""Semantic invariants of the wave-6 statistical operators
(plans/wave6.py) on the sf0.001 fixtures."""

from __future__ import annotations

from movie_data_etl_pipeline_spark.plans import wave6


def test_ks_stat_bounded_and_flag_consistent(spark, sf_dir):
    r = wave6.qa_ks_test(spark, sf_dir).collect()[0]
    assert 0.0 <= r["d_stat"] <= 1.0
    assert r["d_crit"] > 0
    assert r["n1"] > 0 and r["n2"] > 0
    # rounded display columns may straddle the exact comparison only
    # within rounding width
    if abs(r["d_stat"] - r["d_crit"]) > 1e-5:
        assert r["reject_same_dist"] == (r["d_stat"] > r["d_crit"])


def test_gini_bounded(spark, sf_dir):
    r = wave6.ag_gini(spark, sf_dir).collect()[0]
    assert 0.0 <= r["gini"] < 1.0
    assert r["total_rev_c"] > 0 and r["n"] > 0


def test_weekday_index_weighted_mean_is_one(spark, sf_dir):
    rows = wave6.ts_weekday_index(spark, sf_dir).collect()
    assert len(rows) == 7
    n = sum(r["n_days"] for r in rows)
    weighted = sum(r["n_days"] * r["seasonal_index"] for r in rows)
    # Σ n_w · idx_w = n exactly (up to the 1e-6 rounding per term)
    assert abs(weighted - n) < 1e-3 * n
    assert all(r["seasonal_index"] > 0 for r in rows)


def test_bipartite_projection_edge_invariants(spark, sf_dir):
    rows = wave6.gr_bipartite_project(spark, sf_dir).collect()
    for r in rows:
        assert r["s1"] < r["s2"]
        assert r["n_co_parts"] >= wave6._COPART_MIN


def test_bootstrap_ci_brackets_point(spark, sf_dir):
    r = wave6.sa_bootstrap_ci(spark, sf_dir).collect()[0]
    assert r["n_replicates"] == wave6._BOOT_B
    assert r["boot_lo_c"] <= r["boot_hi_c"]
    # Poisson-bootstrap means concentrate around the point estimate
    assert 0.8 * r["mean_c"] < r["boot_lo_c"]
    assert r["boot_hi_c"] < 1.2 * r["mean_c"]
