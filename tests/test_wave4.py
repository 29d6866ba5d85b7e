"""Semantic invariants of the wave-4 monitoring/analysis operators
(plans/wave4.py) on the sf0.001 fixtures — each test asserts a
mathematical property of the operator, not just that it runs; the
value-exact checks live in the DuckDB oracles."""

from __future__ import annotations

from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.plans import wave4
from movie_data_etl_pipeline_spark.sources import load_table


def test_psi_nonnegative_and_counts_conserved(spark, sf_dir):
    out = wave4.qa_psi_drift(spark, sf_dir).collect()
    assert out, "psi output empty"
    # every per-bin term (p-q)ln(p/q) is >= 0, so the snapped sum is too
    assert all(r["psi"] >= 0.0 for r in out)
    n_docs = sum(r["n_docs"] for r in out)
    assert n_docs == load_table(spark, sf_dir, "documents").count()


def test_rfm_quartiles_balanced(spark, sf_dir):
    out = wave4.ev_rfm(spark, sf_dir)
    rows = out.collect()
    n = len(rows)
    assert n == (
        load_table(spark, sf_dir, "orders").select("o_custkey").distinct().count()
    )
    for col in ("r_q", "f_q", "m_q"):
        sizes = sorted(
            r["cnt"] for r in out.groupBy(col).agg(F.count("*").alias("cnt")).collect()
        )
        assert all(1 <= r[col] <= 4 for r in rows)
        # the explicit-rank formula packs buckets within 1 of each other
        assert sizes[-1] - sizes[0] <= 1, f"{col} buckets skewed: {sizes}"
    for r in rows[:50]:
        assert r["segment"] == f"{r['r_q']}{r['f_q']}{r['m_q']}"


def test_acf_bounded(spark, sf_dir):
    rows = wave4.ts_acf(spark, sf_dir).collect()
    assert [r["lag"] for r in rows] == [1, 2, 3, 4, 5, 6, 7]
    assert all(-1.0 <= r["acf"] <= 1.0 for r in rows)
    assert all(r["n_pairs"] > 0 for r in rows)


def test_cusum_ranked_and_means_split(spark, sf_dir):
    rows = wave4.ts_cusum(spark, sf_dir).collect()
    assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
    mags = [abs(r["cusum_c"]) for r in rows]
    assert mags == sorted(mags, reverse=True)
    for r in rows:
        assert r["mean_before_c"] is not None and r["mean_before_c"] > 0


def test_chi2_contributions_sum(spark, sf_dir):
    rows = wave4.qa_chi2(spark, sf_dir).collect()
    assert rows
    assert all(r["contrib"] >= 0.0 and r["expected"] > 0 for r in rows)
    chi2 = rows[0]["chi2"]
    assert all(r["chi2"] == chi2 for r in rows)
    assert abs(chi2 - sum(r["contrib"] for r in rows)) < 1e-3


def test_zipf_slope_negative(spark, sf_dir):
    row = wave4.tx_zipf_fit(spark, sf_dir).collect()[0]
    assert row["k"] >= 10  # sf0.001's synthetic vocab is small (~31)
    assert row["slope"] < 0, "rank-frequency curve must fall"
    assert 0.0 < row["r2"] <= 1.0


def test_kcore_survivors_had_initial_degree(spark, sf_dir):
    """Peeling can only remove nodes whose degree ever fell below k —
    a survivor's ORIGINAL degree must be >= k (degrees only shrink),
    where k is the data-adaptive lower-quartile initial degree. The
    peel must also be nonempty at every fixture sf (the degenerate
    outcome the fixed k=25 produced at sf0.001)."""
    out = wave4.gr_kcore(spark, sf_dir)
    assert out.count() > 0
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("u"),
            F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("v"),
        )
        .distinct()
    )
    deg0 = (
        li.select(F.col("u").alias("node"))
        .unionAll(li.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg0"))
    )
    # recompute the adaptive k the operator derives: smallest degree
    # whose cumulative node count reaches a quarter of all nodes
    degs = sorted(r["deg0"] for r in deg0.collect())
    total = len(degs)
    cum, k = 0, None
    for d in degs:
        cum += 1
        if cum * 4 >= total:
            k = d
            break
    viol = out.join(deg0, "node").filter(F.col("deg0") < k).count()
    assert viol == 0
    # and every output degree is <= the initial degree
    shrunk = out.join(deg0, "node").filter(F.col("degree") > F.col("deg0")).count()
    assert shrunk == 0


def test_markov_reach_monotone(spark, sf_dir):
    rows = wave4.ev_markov_reach(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["p1"] <= r["p2"] + 1e-9 <= r["p3"] + 2e-9
        assert r["p3"] <= 1.0
