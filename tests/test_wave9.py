"""Semantic invariants of the wave-9 operators (plans/wave9.py) on the
sf0.001 fixtures."""

from __future__ import annotations

from movie_data_etl_pipeline_spark.plans import wave9
from movie_data_etl_pipeline_spark.sources import load_table

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# fe_quantile_bins
# ---------------------------------------------------------------------------


def test_quantile_bins_partition_and_balance(spark, sf_dir):
    rows = sorted(wave9.fe_quantile_bins(spark, sf_dir).collect(), key=lambda r: r["bin"])
    n = load_table(spark, sf_dir, "orders").count()
    assert [r["bin"] for r in rows] == list(range(wave9._QB_BINS))
    assert sum(r["n_rows"] for r in rows) == n
    # equal-frequency: every bin within one boundary-duplication slack
    # of the ideal n/8 (prices are near-distinct in the fixture)
    for r in rows:
        assert abs(r["n_rows"] - n / wave9._QB_BINS) <= max(4, 0.02 * n)
    # bins tile the value axis in order without overlap
    for a, b in zip(rows, rows[1:]):
        assert a["hi_c"] < b["lo_c"]
        assert a["lo_c"] <= a["hi_c"]
        assert a["lo_c"] <= a["mean_c"] <= a["hi_c"]


# ---------------------------------------------------------------------------
# fe_target_encode
# ---------------------------------------------------------------------------


def test_target_encode_is_loo_mean(spark, sf_dir):
    out = wave9.fe_target_encode(spark, sf_dir)
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderpriority").alias("category"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("vc"),
    )
    stats = {
        r["category"]: (r["s"], r["n"])
        for r in o.groupBy("category")
        .agg(F.sum("vc").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    vals = {r["o_orderkey"]: r["vc"] for r in o.collect()}
    for r in out.limit(500).collect():
        s, n = stats[r["category"]]
        expect = round((s - vals[r["o_orderkey"]]) / (n - 1))
        assert abs(r["loo_mean_c"] - expect) <= 1
    # every row of the input is encoded
    assert out.count() == len(vals)


# ---------------------------------------------------------------------------
# fe_hashed_features
# ---------------------------------------------------------------------------


def test_hashed_features_conserve_rows_and_tokens(spark, sf_dir):
    rows = wave9.fe_hashed_features(spark, sf_dir).collect()
    o = load_table(spark, sf_dir, "orders")
    assert sum(r["n_rows"] for r in rows) == 2 * o.count()
    # each distinct token lands in exactly one bucket, so per-bucket
    # distinct counts sum to the global distinct token count
    n_tok = (
        o.select(F.col("o_orderstatus").alias("t")).distinct().count()
        + o.select(F.col("o_orderpriority").alias("t")).distinct().count()
    )
    assert sum(r["n_tokens"] for r in rows) == n_tok
    for r in rows:
        assert 0 <= r["feature_idx"] < wave9._FH_BUCKETS


# ---------------------------------------------------------------------------
# ev_step_latency
# ---------------------------------------------------------------------------


def test_step_latency_quantile_order(spark, sf_dir):
    rows = wave9.ev_step_latency(spark, sf_dir).collect()
    assert len(rows) == len(wave9._FUNNEL_PAIRS)
    n_users = load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    for r in rows:
        assert 0 < r["n_users"] <= n_users
        assert (
            r["min_s"] <= r["p25_s"] <= r["p50_s"] <= r["p75_s"] <= r["max_s"]
        )
        assert r["min_s"] <= r["mean_s"] <= r["max_s"]


# ---------------------------------------------------------------------------
# emb_pca_power
# ---------------------------------------------------------------------------


def test_pca_power_unit_vector_and_lambda_bounds(spark, sf_dir):
    rows = sorted(wave9.emb_pca_power(spark, sf_dir).collect(), key=lambda r: r["i"])
    assert len(rows) == wave9._PCA_DIMS
    norm2 = sum(r["v"] ** 2 for r in rows)
    assert abs(norm2 - 1.0) < 1e-3
    lam = rows[0]["lambda1"]
    assert all(r["lambda1"] == lam for r in rows)
    assert lam > 0
    # λ̂ of a PSD matrix is bounded by its trace
    from movie_data_etl_pipeline_spark.plans import wave7

    diag = sum(
        r["cov"] for r in wave7.emb_cov_audit(spark, sf_dir).collect() if r["i"] == r["j"]
    )
    assert lam <= diag + 1e-6


def test_pca_power_deterministic(spark, sf_dir):
    a = sorted(map(tuple, wave9.emb_pca_power(spark, sf_dir).collect()))
    b = sorted(map(tuple, wave9.emb_pca_power(spark, sf_dir).collect()))
    assert a == b
