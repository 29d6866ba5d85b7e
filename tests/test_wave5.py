"""Semantic invariants of the wave-5 operators (plans/wave5.py) on the
sf0.001 fixtures; exact values are pinned by the DuckDB oracles."""

from __future__ import annotations

from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.plans import wave5
from movie_data_etl_pipeline_spark.sources import load_table


def test_simpsons_pooled_slope_constant(spark, sf_dir):
    rows = wave5.ag_simpsons(spark, sf_dir).collect()
    assert len(rows) == 5  # one per market segment
    pooled = {r["slope_all"] for r in rows}
    assert len(pooled) == 1
    for r in rows:
        if r["slope_seg"] is not None and r["slope_all"] is not None:
            assert r["reversed"] == (r["slope_seg"] * r["slope_all"] < 0)


def test_l_diversity_bounds(spark, sf_dir):
    r = wave5.qa_l_diversity(spark, sf_dir).collect()[0]
    assert 1 <= r["min_l"]
    assert 0 <= r["violating_groups"] <= r["n_groups"]
    assert r["rows_at_risk"] >= r["violating_groups"]  # each group has >=1 row


def test_containment_is_a_superset_of_jaccard(spark, sf_dir):
    """Every pair with Jaccard >= t also has max-containment >= t
    (J = I/(A+B-I) <= I/min(A,B) = max containment), so the
    containment detector must cover the exact-Jaccard pairs."""
    rows = wave5.dd_containment(spark, sf_dir).collect()
    for r in rows:
        c = max(r["cont_a_in_b"], r["cont_b_in_a"])
        assert 0.6 - 1e-9 <= c <= 1.0 + 1e-9
        assert min(r["cont_a_in_b"], r["cont_b_in_a"]) > 0


def test_pq_codebook_conserves_vectors(spark, sf_dir):
    out = wave5.emb_pq_codebook(spark, sf_dir).collect()
    total = sum(r["n_vectors"] for r in out)
    assert total == load_table(spark, sf_dir, "embeddings").count()
    assert all(0 <= r["code_lo"] <= 3 and 0 <= r["code_hi"] <= 3 for r in out)
    assert all(r["sq_err_int"] >= 0 for r in out)


def test_kmeans_assign_seeds_self_assigned(spark, sf_dir):
    out = wave5.sim_kmeans_assign(spark, sf_dir).collect()
    total = sum(r["n_assigned"] for r in out)
    assert total == load_table(spark, sf_dir, "embeddings").count()
    # each seed is distance 0 from itself, so all 8 clusters are non-empty
    assert len(out) == 8
    assert all(r["n_assigned"] >= 1 and r["sse_int"] >= 0 for r in out)


def test_late_audit_conserves_events(spark, sf_dir):
    out = wave5.st_late_audit(spark, sf_dir)
    total = out.agg(F.sum("n_events")).collect()[0][0]
    assert total == load_table(spark, sf_dir, "events").count()
    assert all(r["max_late_s"] >= 0 for r in out.collect())
