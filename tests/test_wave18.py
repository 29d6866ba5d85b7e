"""Semantic invariants of the wave-18 operators (plans/wave18.py) on
the sf0.001 fixtures."""

from __future__ import annotations

from movie_data_etl_pipeline_spark.plans import wave5, wave18
from movie_data_etl_pipeline_spark.sources import load_table
from movie_data_etl_pipeline_spark.sources.parquet import TABLES

from pyspark.sql import functions as F


def test_cluster_purity_consistent_with_assignment(spark, sf_dir):
    purity = {r["cluster"]: r for r in wave18.sim_cluster_purity(spark, sf_dir).collect()}
    assign = {r["cluster"]: r for r in wave5.sim_kmeans_assign(spark, sf_dir).collect()}
    # identical clusters and identical per-cluster populations — the
    # purity query reuses the assignment kernel bit-for-bit
    assert set(purity) == set(assign)
    for c, r in purity.items():
        assert r["n_assigned"] == assign[c]["n_assigned"]
        assert 0 < r["top_n"] <= r["n_assigned"]
        assert 0.0 < r["purity"] <= 1.0
    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r["n_assigned"] for r in purity.values()) == n_vecs


def test_table_profiles_cover_catalog(spark, sf_dir):
    rows = {r["table_name"]: r["n_rows"] for r in
            wave18.qa_table_profiles(spark, sf_dir).collect()}
    assert set(rows) == set(TABLES)
    for name in TABLES:
        assert rows[name] == load_table(spark, sf_dir, name).count()


def test_grouped_quantiles_ordered_and_bounded(spark, sf_dir):
    rows = wave18.ag_grouped_quantiles(spark, sf_dir).collect()
    o = load_table(spark, sf_dir, "orders")
    assert sum(r["n_orders"] for r in rows) == o.count()
    for r in rows:
        assert r["p25_c"] <= r["p50_c"] <= r["p75_c"] <= r["p90_c"]
    # spot-check one group's median against a Python reference
    g = rows[0]["priority"]
    vals = sorted(
        r[0]
        for r in o.filter(F.col("o_orderpriority") == g)
        .select(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .collect()
    )
    lower_median = vals[(len(vals) + 1) // 2 - 1]
    assert rows[0]["p50_c"] == lower_median
