"""Semantic invariants of the wave-12 operators (plans/wave12.py) on
the sf0.001 fixtures."""

from __future__ import annotations

from movie_data_etl_pipeline_spark.plans import wave12
from movie_data_etl_pipeline_spark.sources import load_table

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# ts_forecast_backtest
# ---------------------------------------------------------------------------


def test_forecast_backtest_holdout_and_error_identity(spark, sf_dir):
    rows = wave12.ts_forecast_backtest(spark, sf_dir).collect()
    assert len(rows) == wave12._FC_HORIZON
    for r in rows:
        assert abs(r["abs_err"] - abs(r["actual"] - r["forecast"])) < 2e-4
        assert r["ape"] >= 0
        assert r["forecast"] > 0


# ---------------------------------------------------------------------------
# ev_growth_accounting
# ---------------------------------------------------------------------------


def test_growth_accounting_balances(spark, sf_dir):
    rows = sorted(
        wave12.ev_growth_accounting(spark, sf_dir).collect(),
        key=lambda r: r["week"],
    )
    uw = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.expr("datediff(to_date(ts), to_date('1970-01-01')) DIV 7").alias("wk"),
        )
        .distinct()
    )
    actives = {
        r["wk"]: r["n"]
        for r in uw.groupBy("wk").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    by_week = {r["week"]: r for r in rows}
    n_users = uw.select("user_id").distinct().count()
    assert sum(r["n_new"] for r in rows) == n_users
    prev_active = 0
    for wk in sorted(actives):
        r = by_week[wk]
        # decomposition: this week's actives = new + retained + resurrected
        assert r["n_new"] + r["n_retained"] + r["n_resurrected"] == actives[wk]
        # churn bookkeeping: last week's actives = retained + churned
        assert r["n_retained"] + r["n_churned"] == prev_active
        prev_active = actives[wk]


# ---------------------------------------------------------------------------
# qa_freshness
# ---------------------------------------------------------------------------


def test_freshness_nonnegative_and_one_current(spark, sf_dir):
    rows = wave12.qa_freshness(spark, sf_dir).collect()
    n_types = (
        load_table(spark, sf_dir, "events").select("event_type").distinct().count()
    )
    assert len(rows) == n_types
    assert all(r["lag_s"] >= 0 for r in rows)
    # the type holding the global max has zero lag
    assert any(r["lag_s"] == 0 for r in rows)
    for r in rows:
        assert r["is_stale"] == (1 if r["lag_s"] > wave12._FRESH_SLA_S else 0)


# ---------------------------------------------------------------------------
# mm_content_dedup
# ---------------------------------------------------------------------------


def test_content_dedup_accounting(spark, sf_dir):
    r = wave12.mm_content_dedup(spark, sf_dir).collect()[0]
    docs = load_table(spark, sf_dir, "documents")
    assert r["n_assets"] == docs.count()
    assert r["n_unique"] == docs.select("text").distinct().count()
    assert r["extra_copies"] == r["n_assets"] - r["n_unique"]
    assert r["bytes_stored"] <= r["bytes_total"]
    assert 0.0 <= r["savings_ratio"] < 1.0
    want_groups = (
        docs.groupBy("text")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    assert r["dup_groups"] == want_groups
