"""Semantic invariants of the wave-17 operators (plans/wave17.py) on
the sf0.001 fixtures."""

from __future__ import annotations

from movie_data_etl_pipeline_spark.plans import wave17
from movie_data_etl_pipeline_spark.sources import load_table

from pyspark.sql import functions as F


def test_pack_fragmentation_conserves_docs_and_bounds(spark, sf_dir):
    rows = wave17.tx_pack_fragmentation(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    n_nonempty = docs.filter(F.size(F.split(F.trim("text"), r"\s+")) > 0).count()
    assert sum(r["n_docs"] for r in rows) == n_nonempty
    for r in rows:
        assert r["fragments"] >= 1
        # a doc with t tokens spans at most t//64 + 1 bins; fixture docs
        # are short, so fragment counts stay small
        assert r["fragments"] <= 10
    # concatenate-and-cut must split SOME docs (that's its trade)
    assert any(r["fragments"] > 1 for r in rows)


def test_funnel_timebound_orderings(spark, sf_dir):
    rows = wave17.ev_funnel_timebound(spark, sf_dir).collect()
    assert len(rows) == 3
    for r in rows:
        assert 0 <= r["n_converted_24h"] <= r["n_converted_ever"] <= r["n_started"]
        assert 0.0 <= r["conv_rate_24h"] <= 1.0
    n_users = load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    assert all(r["n_started"] <= n_users for r in rows)


def test_median_polish_identity_and_robust_center(spark, sf_dir):
    rows = wave17.ag_median_polish(spark, sf_dir).collect()
    for r in rows:
        # the two-way decomposition is exact: cell = a + b + resid
        assert r["x_c"] == r["a"] + r["b"] + r["resid_c"]
    # after a full sweep ending on columns, every column's residual
    # lower-median is 0 (the defining fixed point of the last step)
    by_col: dict[str, list[int]] = {}
    for r in rows:
        by_col.setdefault(r["sta"], []).append(r["resid_c"])
    for res in by_col.values():
        res.sort()
        lower_median = res[(len(res) + 1) // 2 - 1]
        assert lower_median == 0
