"""Semantic invariants of the wave-26 operators (plans/wave26.py):
exact Python references on the sf0.001 fixtures."""

from __future__ import annotations

import json
import math
from collections import defaultdict

from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.plans import wave26
from movie_data_etl_pipeline_spark.sources import load_table


def test_khop_reach_matches_python_bfs(spark, sf_dir):
    rows = {r["seed"]: r for r in wave26.gr_khop_reach(spark, sf_dir).collect()}
    orders = {r["o_orderkey"]: r["o_custkey"] for r in load_table(spark, sf_dir, "orders").collect()}
    adj = defaultdict(set)
    for r in load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey").collect():
        c = orders.get(r["l_orderkey"])
        if c is not None:
            cn, sn = c * 2, r["l_suppkey"] * 2 + 1
            adj[cn].add(sn)
            adj[sn].add(cn)
    seeds = [
        r["c_custkey"] * 2
        for r in load_table(spark, sf_dir, "customer").collect()
        if r["c_custkey"] % wave26._SEED_MOD == 0
    ]
    assert set(rows) == set(seeds)
    for s in seeds:
        visited = {s}
        frontier = {s}
        reaches = []
        for _ in range(wave26._KHOP):
            frontier = {n for f in frontier for n in adj[f]} - visited
            visited |= frontier
            reaches.append(len(visited) - 1)
        r = rows[s]
        assert (r["reach_1"], r["reach_2"], r["reach_3"]) == tuple(reaches)
        assert r["reach_1"] <= r["reach_2"] <= r["reach_3"]


def test_map_surface_matches_python(spark, sf_dir):
    rows = wave26.fn_map_surface(spark, sf_dir).collect()
    g = defaultdict(lambda: defaultdict(int))
    for r in load_table(spark, sf_dir, "orders").select("o_orderpriority", "o_orderstatus").collect():
        g[r["o_orderpriority"]][r["o_orderstatus"]] += 1
    want = {}
    for pri, statuses in g.items():
        total = sum(statuses.values())
        kept = {
            s: int(round(n * 1_000_000 / total))
            for s, n in statuses.items()
            if n >= 5
        }
        if kept:
            want[pri] = (total, [{"status": s, "ppm": kept[s]} for s in sorted(kept)])
    assert {r["o_orderpriority"] for r in rows} == set(want)
    for r in rows:
        total, shares = want[r["o_orderpriority"]]
        assert r["total"] == total
        assert json.loads(r["shares_json"]) == shares


def test_esd_outliers_match_python(spark, sf_dir):
    rows = wave26.ts_esd_outliers(spark, sf_dir).collect()
    assert [r["k"] for r in rows] == [1, 2, 3]
    daily = {}
    for r in load_table(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice").collect():
        d = str(r["o_orderdate"])[:10]
        daily[d] = daily.get(d, 0) + int(round(r["o_totalprice"]))
    remaining = dict(daily)
    for r in rows:
        n = len(remaining)
        sy = sum(remaining.values())
        sy2 = sum(v * v for v in remaining.values())
        mean = sy / n
        sd = math.sqrt((sy2 - sy * sy / n) / (n - 1))
        best = max(remaining.items(), key=lambda kv: (abs(kv[1] - mean) / sd, [-ord(c) for c in kv[0]]))
        # deterministic tiebreak is (r desc, date asc)
        cand = sorted(
            remaining.items(), key=lambda kv: (-abs(kv[1] - mean) / sd, kv[0])
        )[0]
        assert r["removed_day"] == cand[0]
        assert r["y"] == cand[1]
        assert abs(r["r_stat"] - round(abs(cand[1] - mean) / sd, 6)) < 1e-9
        del remaining[cand[0]]
        del best
