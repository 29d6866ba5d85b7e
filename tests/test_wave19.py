"""Semantic invariants of the wave-19 operators (plans/wave19.py) on
the sf0.001 fixtures."""

from __future__ import annotations

import math

from movie_data_etl_pipeline_spark.plans import wave19
from movie_data_etl_pipeline_spark.sources import load_table

from pyspark.sql import functions as F


def test_srm_identity_and_coverage(spark, sf_dir):
    r = wave19.qa_srm_check(spark, sf_dir).collect()[0]
    n_users = load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    assert r["n_a"] + r["n_b"] == n_users
    d = r["n_a"] - r["n_b"]
    expect = d * d / (r["n_a"] + r["n_b"])
    assert abs(r["chi2"] - expect) < 1e-5
    assert r["srm_detected"] == (1 if r["chi2"] > 3.841459 else 0)
    # a hash split of a fixture this size should NOT trigger SRM
    assert r["srm_detected"] == 0


def test_user_outliers_matches_python(spark, sf_dir):
    rows = {r["user_id"]: r for r in wave19.ev_user_outliers(spark, sf_dir).collect()}
    cu = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    users = sorted({r["user_id"] for r in cu})
    types = sorted({r["event_type"] for r in cu})
    counts = {(r["user_id"], r["event_type"]): r["c"] for r in cu}
    n = len(users)
    stats = {}
    for t in types:
        vals = [counts.get((u, t), 0) for u in users]
        mu = sum(vals) / n
        var = sum(v * v for v in vals) / n - mu * mu
        stats[t] = (mu, var)
    for u in users:
        m2 = sum(
            (counts.get((u, t), 0) - mu) ** 2 / var for t, (mu, var) in stats.items()
        )
        # nano-snapping each term introduces ≤ 0.5e-9 per term
        assert abs(rows[u]["m2"] - m2) < 1e-5
    assert set(rows) == set(users)
    # the 0.99 cutoff flags a small minority at most
    assert sum(r["is_outlier"] for r in rows.values()) <= max(1, n // 5)


def test_assortativity_is_a_correlation(spark, sf_dir):
    r = wave19.gr_assortativity(spark, sf_dir).collect()[0]
    assert -1.0 - 1e-9 <= r["assortativity"] <= 1.0 + 1e-9
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_suppkey").alias("u"), F.col("l_partkey").alias("v"))
        .distinct()
    )
    assert r["ne"] == li.count()
    # python reference
    edges = [(x["u"], x["v"]) for x in li.collect()]
    from collections import Counter

    du = Counter(u for u, _ in edges)
    dv = Counter(v for _, v in edges)
    xs = [du[u] for u, v in edges]
    ys = [dv[v] for u, v in edges]
    ne = len(edges)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    want = (ne * sxy - sx * sy) / math.sqrt(ne * sxx - sx * sx) / math.sqrt(
        ne * syy - sy * sy
    )
    assert abs(r["assortativity"] - want) < 1e-5
