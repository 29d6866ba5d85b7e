"""Semantic invariants of the wave-15 operators (plans/wave15.py) on
the sf0.001 fixtures."""

from __future__ import annotations

import math

from movie_data_etl_pipeline_spark.plans import wave15
from movie_data_etl_pipeline_spark.sources import load_table

from pyspark.sql import functions as F


def test_confusion_metrics_consistency(spark, sf_dir):
    rows = wave15.tx_langid_confusion(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_true"] for r in rows) == n_docs
    assert sum(r["n_pred"] for r in rows) == n_docs
    for r in rows:
        assert 0 <= r["tp"] <= min(r["n_true"], r["n_pred"])
        if r["precision"] is not None and r["recall"] is not None and r["f1"]:
            hm = 2 * r["precision"] * r["recall"] / (r["precision"] + r["recall"])
            assert abs(r["f1"] - hm) < 1e-4


def test_price_volume_mix_bridges_exactly(spark, sf_dir):
    rows = wave15.ag_price_volume_mix(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # exact bridge: volume + price + residue = delta
        assert (
            r["volume_effect_c"] + r["price_effect_c"] + r["residual_c"]
            == r["delta_c"]
        )
        # mean-snapping residue is bounded by half a cent per order
        assert abs(r["residual_c"]) <= (r["n1"] + r["n2"])


def test_woe_iv_identities(spark, sf_dir):
    rows = wave15.fe_woe_iv(spark, sf_dir).collect()
    o = load_table(spark, sf_dir, "orders")
    assert sum(r["good"] + r["bad"] for r in rows) == o.count()
    gg = sum(r["good"] for r in rows)
    bb = sum(r["bad"] for r in rows)
    iv = rows[0]["iv"]
    assert all(r["iv"] == iv for r in rows)
    assert iv >= -1e-9  # IV is a sum of nonnegative terms
    recomputed = 0.0
    for r in rows:
        woe = math.log((r["good"] * bb) / (r["bad"] * gg))
        assert abs(r["woe"] - woe) < 1e-5
        recomputed += (r["good"] / gg - r["bad"] / bb) * woe
    assert abs(iv - recomputed) < 1e-5
