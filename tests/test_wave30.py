"""Wave-30 invariants: conductance consistency with the modularity
partition on the sf0.001 fixtures."""

from __future__ import annotations

from movie_data_etl_pipeline_spark.plans import wave23, wave30


def test_conductance_consistent_with_modularity_partition(spark, sf_dir):
    cond = {r["label"]: r for r in wave30.gr_conductance(spark, sf_dir).collect()}
    mod = {r["label"]: r for r in wave23.gr_modularity(spark, sf_dir).collect()}
    assert set(cond) == set(mod)
    m_edges = sum(r["d_c"] for r in mod.values()) // 2
    for lbl, r in cond.items():
        # volume identity: conductance's vol IS modularity's degree sum
        assert r["vol"] == mod[lbl]["d_c"]
        # cut identity: vol = 2*e_within + cut
        assert r["vol"] == 2 * mod[lbl]["e_c"] + r["cut"]
        assert 0.0 <= r["conductance"] <= 1.0
        denom = min(r["vol"], 2 * m_edges - r["vol"])
        assert abs(r["conductance"] - round(r["cut"] / denom, 6)) < 1e-9
