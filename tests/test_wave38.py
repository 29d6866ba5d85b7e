"""Wave-38 invariants: BFS hops, PR curve, Bloom semi-join, and the
uniqueness profile vs exact Python references on sf0.001."""

from __future__ import annotations

from collections import defaultdict

from movie_data_etl_pipeline_spark.plans import wave38
from movie_data_etl_pipeline_spark.sources import load_table


def test_bfs_hops_matches_python(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey").collect()
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey").collect()
    cust_of = {r["o_orderkey"]: r["o_custkey"] for r in orders}
    edges = {
        (2 * cust_of[r["l_orderkey"]], 2 * r["l_suppkey"] + 1)
        for r in li
        if r["l_orderkey"] in cust_of
    }
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    seeds = {u for u in adj if u % (2 * wave38._BFS_SEED_MOD) == 0}
    levels = {0: set(seeds)}
    known = set(seeds)
    frontier = set(seeds)
    for k in range(1, wave38._BFS_ROUNDS + 1):
        nxt = {v for u in frontier for v in adj[u]} - known
        levels[k] = nxt
        known |= nxt
        frontier = nxt
    got = {r["hop"]: r for r in wave38.gr_bfs_hops(spark, sf_dir).collect()}
    want = {k: v for k, v in levels.items() if v}
    assert set(got) == set(want)
    for hop, nodes in want.items():
        assert got[hop]["n_nodes"] == len(nodes)
        assert got[hop]["checksum"] == sum(nodes)
    # bipartite sanity: odd hops are suppliers (odd ids), even hops customers
    for hop, nodes in want.items():
        assert all(n % 2 == hop % 2 for n in nodes)


def test_pr_curve_matches_python(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select("o_totalprice", "o_orderstatus").collect()
    scored = [
        (round(float(r["o_totalprice"]) * 100), 1 if r["o_orderstatus"] == "F" else 0)
        for r in o
    ]
    hist = defaultdict(lambda: [0, 0])  # p, n_s
    for s, y in scored:
        hist[s][0] += y
        hist[s][1] += 1
    n = len(scored)
    pos = sum(y for _, y in scored)
    deciles = {}
    cum_n = cum_p = 0
    for s in sorted(hist, reverse=True):
        p, n_s = hist[s]
        d = (10 * cum_n) // n
        cum_n += n_s
        cum_p += p
        cur = deciles.setdefault(d, [s, 0, 0])
        cur[0] = min(cur[0], s)
        cur[1] = max(cur[1], cum_n)
        cur[2] = max(cur[2], cum_p)
    got = wave38.ml_pr_curve(spark, sf_dir).collect()
    assert [r["decile"] for r in got] == sorted(deciles)
    prev_recall = 0.0
    for r in got:
        thresh, k, tp = deciles[r["decile"]]
        assert (r["thresh_cents"], r["pred_pos"], r["tp"]) == (thresh, k, tp)
        assert r["precision"] == tp / float(k)
        assert r["recall"] == tp / float(pos)
        assert r["f1"] == 2 * tp / float(k + pos)
        assert r["recall"] >= prev_recall  # recall monotone in threshold
        prev_recall = r["recall"]
    assert got[-1]["recall"] == 1.0


def test_bloom_semijoin_equals_plain_semijoin(spark, sf_dir):
    from pyspark.sql import functions as F

    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_orderstatus") == "F")
    )
    li = load_table(spark, sf_dir, "lineitem")
    plain = (
        li.join(
            o.select(F.col("o_orderkey").alias("l_orderkey")), "l_orderkey", "left_semi"
        )
        .groupBy("l_returnflag")
        .count()
        .collect()
    )
    want = {r["l_returnflag"]: r["count"] for r in plain}
    got = {r["l_returnflag"]: r["n_items"] for r in wave38.jx_bloom_semijoin(spark, sf_dir).collect()}
    assert got == want


def test_uniqueness_profile_matches_python(spark, sf_dir):
    rows = load_table(spark, sf_dir, "orders").collect()
    got = {r["col"]: r for r in wave38.qa_uniqueness_profile(spark, sf_dir).collect()}
    assert set(got) == set(wave38._PROFILE_COLS)
    for c in wave38._PROFILE_COLS:
        vals = [r[c] for r in rows]
        non_null = [v for v in vals if v is not None]
        counts = defaultdict(int)
        for v in non_null:
            counts[v] += 1
        r = got[c]
        assert r["n"] == len(vals)
        assert r["n_null"] == len(vals) - len(non_null)
        assert r["n_distinct"] == len(counts)
        assert r["max_freq"] == max(counts.values())
        assert r["uniq_ratio"] == len(counts) / float(len(non_null))
    # key column must profile as unique
    assert got["o_orderkey"]["uniq_ratio"] == 1.0