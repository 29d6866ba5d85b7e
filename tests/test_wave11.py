"""Semantic invariants of the wave-11 operators (plans/wave11.py) on
the sf0.001 fixtures."""

from __future__ import annotations

from movie_data_etl_pipeline_spark.plans import wave11
from movie_data_etl_pipeline_spark.sources import load_table

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# ag_did
# ---------------------------------------------------------------------------


def test_did_identity_and_coverage(spark, sf_dir):
    r = wave11.ag_did(spark, sf_dir).collect()[0]
    assert r["did_c"] == (r["treated_post_c"] - r["treated_pre_c"]) - (
        r["control_post_c"] - r["control_pre_c"]
    )
    assert r["n_orders"] == load_table(spark, sf_dir, "orders").count()
    for c in ("treated_pre_c", "treated_post_c", "control_pre_c", "control_post_c"):
        assert r[c] > 0


# ---------------------------------------------------------------------------
# ag_raking
# ---------------------------------------------------------------------------


def test_raking_converges_marginals(spark, sf_dir):
    rows = wave11.ag_raking(spark, sf_dir).collect()
    pris = sorted({r["pri"] for r in rows})
    stas = sorted({r["sta"] for r in rows})
    nn = sum(r["n"] for r in rows)
    # after 2 IPF rounds (ending on the status axis) the status
    # marginals are exact and the priority marginals near-uniform
    for s in stas:
        m = sum(r["weighted_n"] for r in rows if r["sta"] == s)
        assert abs(m - nn / len(stas)) < 0.05 * nn / len(stas)
    for p in pris:
        m = sum(r["weighted_n"] for r in rows if r["pri"] == p)
        assert abs(m - nn / len(pris)) < 0.15 * nn / len(pris)
    # total mass is preserved by IPF up to convergence slack
    assert abs(sum(r["weighted_n"] for r in rows) - nn) < 0.05 * nn
    assert all(r["weight"] > 0 for r in rows)


# ---------------------------------------------------------------------------
# ix_trigram_search
# ---------------------------------------------------------------------------


def test_trigram_candidates_superset_and_result_exact(spark, sf_dir):
    out = {r["doc_id"] for r in wave11.ix_trigram_search(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents")
    want = {
        r["doc_id"]
        for r in docs.filter(
            F.col("text").contains(wave11._TRIGRAM_NEEDLE)
        ).collect()
    }
    assert out == want
    assert out  # the fixture vocabulary contains the needle
    # the index candidate set is a superset of the true matches and
    # prunes relative to the corpus (the point of the index)
    tgs = wave11._needle_trigrams(wave11._TRIGRAM_NEEDLE)
    posting = (
        docs.filter(F.length("text") >= 3)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), F.length("text") - 2)).alias("i"),
            "text",
        )
        .select("doc_id", F.expr("substring(text, i, 3)").alias("tg"))
        .filter(F.col("tg").isin(tgs))
        .distinct()
    )
    cands = {
        r["doc_id"]
        for r in posting.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("cov"))
        .filter(F.col("cov") == len(tgs))
        .collect()
    }
    assert want <= cands
    assert len(cands) <= docs.count()
