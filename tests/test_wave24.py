"""Semantic invariants of the wave-24 operators (plans/wave24.py):
pure-Python references for the Hilbert curve, the IRLS fit, and the
truncation-recall audit, run on the sf0.001 fixtures."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.plans import wave24
from movie_data_etl_pipeline_spark.sources import load_table


def py_hilbert(x: int, y: int, order: int = 8) -> int:
    """Independent Python rendering of the masked xy2d algorithm."""
    d = 0
    for p in range(order - 1, -1, -1):
        s = 1 << p
        rx = (x // s) % 2
        ry = (y // s) % 2
        d += s * s * ((3 * rx) ^ ry)
        xm, ym = x % s, y % s
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - ym, s - 1 - xm
            else:
                x, y = ym, xm
        else:
            x, y = xm, ym
    return d


def test_hilbert_is_a_bijection_with_unit_steps():
    """The defining property: d ↦ (x, y) is a bijection on the grid and
    consecutive d values are GRID NEIGHBORS (|Δx| + |Δy| = 1) — true of
    Hilbert, false of Z-order (whose jumps are the locality loss)."""
    n = 1 << 8
    pos = {}
    for x in range(n):
        for y in range(n):
            pos[py_hilbert(x, y)] = (x, y)
    assert len(pos) == n * n  # bijection
    for d in range(0, n * n - 1, 997):  # stride-sampled adjacency
        x0, y0 = pos[d]
        x1, y1 = pos[d + 1]
        assert abs(x0 - x1) + abs(y0 - y1) == 1


def test_hilbert_blocks_match_python_reference(spark, sf_dir):
    rows = wave24.ly_hilbert(spark, sf_dir).collect()
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.pmod(F.round(F.col("c_acctbal") * 100).cast("bigint"), F.lit(256)).alias("gx"),
        F.pmod(F.col("c_custkey"), F.lit(256)).alias("gy"),
    ).collect()
    blocks: dict[int, list] = {}
    for r in cust:
        d = py_hilbert(r["gx"], r["gy"])
        blocks.setdefault(d // 256, []).append((r["gx"], r["gy"]))
    got = {r["block"]: r for r in rows}
    assert set(got) == set(blocks)
    for b, pts in blocks.items():
        r = got[b]
        assert r["n"] == len(pts)
        assert r["x_min"] == min(p[0] for p in pts)
        assert r["x_max"] == max(p[0] for p in pts)
        assert r["y_min"] == min(p[1] for p in pts)
        assert r["y_max"] == max(p[1] for p in pts)


def test_huber_irls_matches_python_reference(spark, sf_dir):
    row = wave24.ag_huber_irls(spark, sf_dir).collect()[0]
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.sum(F.round("o_totalprice").cast("bigint")).alias("y"))
        .collect()
    )
    base = min(r["d"] for r in daily)
    import datetime

    epoch = datetime.date(1992, 1, 1)
    pts = [((r["d"] - epoch).days, r["y"]) for r in daily]
    assert base >= epoch

    def fit(ws):
        sw = sum(w for w, _, _ in ws)
        swx = sum(w * x for w, x, _ in ws)
        swy = sum(w * y for w, _, y in ws)
        swx2 = sum(w * x * x for w, x, _ in ws)
        swxy = sum(w * x * y for w, x, y in ws)
        beta = (float(sw) * float(swxy) - float(swx) * float(swy)) / (
            float(sw) * float(swx2) - float(swx) * float(swx)
        )
        alpha = (float(swy) - beta * float(swx)) / float(sw)
        return alpha, beta, sw

    ws = [(1000, x, y) for x, y in pts]
    alpha, beta, sw = fit(ws)
    for _ in range(wave24._IRLS_ROUNDS):
        ws = []
        for x, y in pts:
            r = float(y) - (alpha + beta * float(x))
            if abs(r) < 1e-9:
                w = 1000
            else:
                w = int(round(min(1.0, wave24._HUBER_C / abs(r)) * 1000.0))
            ws.append((w, x, y))
        alpha, beta, sw = fit(ws)
    assert abs(row["slope_per_day"] - round(beta, 6)) < 1e-9
    assert abs(row["intercept"] - round(alpha, 2)) < 1e-9
    assert row["milliweight_sum"] == sw
    # robustness: weights actually down-weight something, or all days inline
    assert 0 < sw <= 1000 * len(pts)


def test_matryoshka_recall_matches_python(spark, sf_dir):
    rows = {r["query_id"]: r["n_overlap"] for r in wave24.sim_matryoshka_recall(spark, sf_dir).collect()}
    emb = load_table(spark, sf_dir, "embeddings").collect()
    q = {r["vec_id"]: [math.floor(float(v) * 1048576.0) for v in r["embedding"]] for r in emb}
    queries = [i for i in q if i % wave24._MRL_SAMPLE_MOD == 0]
    assert set(rows) == set(queries)
    for qid in queries:
        full = []
        pref = []
        for nid, v in q.items():
            if nid == qid:
                continue
            full.append((-sum(a * b for a, b in zip(q[qid], v)), nid))
            pref.append((-sum(a * b for a, b in zip(q[qid][:16], v[:16])), nid))
        topf = {nid for _, nid in sorted(full)[: wave24._MRL_K]}
        topp = {nid for _, nid in sorted(pref)[: wave24._MRL_K]}
        assert rows[qid] == len(topf & topp)
        assert 0 <= rows[qid] <= wave24._MRL_K
