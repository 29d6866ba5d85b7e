"""Semantic invariants of the wave-31 operators (plans/wave31.py):
exact Python references on the sf0.001 fixtures."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.plans import wave27, wave31
from movie_data_etl_pipeline_spark.sources import load_table


def _py_kmeans(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").collect()
    q = {
        r["vec_id"]: [math.floor(float(v) * 1048576.0) for v in r["embedding"]]
        for r in emb
    }
    seeds = sorted(q)[: wave27._KM_K]
    cents = {i: list(q[s]) for i, s in enumerate(seeds)}
    assign = {}
    for _ in range(wave27._KM_ROUNDS):
        assign = {}
        for vid, v in q.items():
            best = min(
                (sum((a - b) * (a - b) for a, b in zip(v, c)), k)
                for k, c in cents.items()
            )
            assign[vid] = best[1]
        sums = defaultdict(lambda: [0] * wave27._KM_DIM)
        counts = defaultdict(int)
        for vid, k in assign.items():
            counts[k] += 1
            for j, v in enumerate(q[vid]):
                sums[k][j] += v
        for k in cents:
            if counts[k]:
                cents[k] = [s // counts[k] for s in sums[k]]
    return q, assign, cents


def test_silhouette_matches_python(spark, sf_dir):
    rows = {r["cluster"]: r for r in wave31.emb_silhouette(spark, sf_dir).collect()}
    q, assign, cents = _py_kmeans(spark, sf_dir)
    per = defaultdict(list)
    for vid, own in assign.items():
        d = {
            k: sum((a - b) * (a - b) for a, b in zip(q[vid], c))
            for k, c in cents.items()
        }
        a = d[own]
        b = min(v for k, v in d.items() if k != own)
        s = (math.sqrt(b) - math.sqrt(a)) / max(math.sqrt(a), math.sqrt(b))
        per[own].append(int(round(s * 1e6)))
    assert set(rows) == set(per)
    for k, sm in per.items():
        r = rows[k]
        assert r["n"] == len(sm)
        assert r["s_micro_sum"] == sum(sm)
        # 1e-6 tolerance: Spark ROUND is half-up, Python round() is
        # half-even — an exact .5 tie (hit on this fixture) differs in
        # the last decimal; the Spark↔DuckDB pair agrees (crosscheck)
        assert abs(r["mean_silhouette"] - round(sum(sm) / (1e6 * len(sm)), 6)) <= 1.01e-6
        assert -1.0 <= r["mean_silhouette"] <= 1.0


def test_quantile_irls_sits_above_the_mean_line(spark, sf_dir):
    row = wave31.ag_quantile_irls(spark, sf_dir).collect()[0]
    # tau=0.9: most days must fall BELOW the fitted line
    assert 0.5 < row["frac_below"] <= 1.0
    assert math.isfinite(row["slope_per_day"]) and math.isfinite(row["intercept"])


def test_hierarchy_rollup_matches_python(spark, sf_dir):
    rows = wave31.pt_hierarchy_rollup(spark, sf_dir).collect()
    parts = [
        (r["p_partkey"], int(round(r["p_retailprice"] * 100)))
        for r in load_table(spark, sf_dir, "part").collect()
    ]
    agg = defaultdict(lambda: [0, 0])
    for p, cents in parts:
        anc = p
        for _ in range(wave31._H_DEPTH):
            anc //= 10
            if anc <= 0:
                break
            agg[anc][0] += 1
            agg[anc][1] += cents
    want = sorted(
        ((v[1], a, v[0]) for a, v in agg.items()), key=lambda t: (-t[0], t[1])
    )[:100]
    assert len(rows) == min(100, len(want))
    for r, (total, anc, n) in zip(rows, want):
        assert (r["anc"], r["n_desc"], r["total_cents"]) == (anc, n, total)
