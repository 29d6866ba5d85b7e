"""Wave-35 invariants: NDCG/MRR, HITS, local clustering vs exact
Python references on the sf0.001 fixtures."""

from __future__ import annotations

import math
from collections import defaultdict

from movie_data_etl_pipeline_spark.operators import ml_eval
from movie_data_etl_pipeline_spark.plans import wave35
from movie_data_etl_pipeline_spark.sources import load_table


def test_ndcg_mrr_matches_python(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").collect()
    vecs = {
        r["vec_id"]: (
            r["label"],
            [math.floor(float(x) * (1 << 20)) for x in r["embedding"]],
        )
        for r in emb
    }
    queries = {i: v for i, v in vecs.items() if i < 50}
    cands = {i: v for i, v in vecs.items() if i >= 50}
    lab_counts = defaultdict(int)
    for _, (lab, _) in cands.items():
        lab_counts[lab] += 1
    out = {r["query_id"]: r for r in wave35.ir_ndcg_mrr(spark, sf_dir).collect()}
    assert set(out) == set(queries)
    for qid, (qlab, qv) in queries.items():
        scored = sorted(
            (
                (-sum(a * b for a, b in zip(qv, cv)), cid, clab)
                for cid, (clab, cv) in cands.items()
            )
        )[:10]
        rels = [1 if clab == qlab else 0 for _, _, clab in scored]
        dcg = sum(r * d for r, d in zip(rels, ml_eval.NDCG_DISC))
        total_rel = lab_counts.get(qlab, 0)
        idcg = (
            ml_eval.NDCG_IDCG_PREF[min(total_rel, 10) - 1] if total_rel > 0 else None
        )
        frank = next((i + 1 for i, r in enumerate(rels) if r), None)
        row = out[qid]
        assert row["n_rel_topk"] == sum(rels)
        assert row["total_rel"] == total_rel
        assert row["dcg"] == dcg
        assert row["idcg"] == idcg
        if idcg:
            assert math.isclose(row["ndcg"], dcg / idcg, rel_tol=0, abs_tol=0)
        assert row["rr2520"] == (2520 // frank if frank else 0)


def test_hits_matches_python_fixed_point(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey").collect()
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey").collect()
    cust_of = {r["o_orderkey"]: r["o_custkey"] for r in orders}
    pairs = sorted(
        {
            (cust_of[r["l_orderkey"]], r["l_suppkey"])
            for r in li
            if r["l_orderkey"] in cust_of
        }
    )
    scale = 1 << 20
    h = {c: scale for c, _ in pairs}
    a = {}
    for _ in range(2):
        a_raw = defaultdict(int)
        for c, s in pairs:
            a_raw[s] += h[c]
        mx = max(a_raw.values())
        a = {s: (v * scale) // mx for s, v in a_raw.items()}
        h_raw = defaultdict(int)
        for c, s in pairs:
            h_raw[c] += a[s]
        mx = max(h_raw.values())
        h = {c: (v * scale) // mx for c, v in h_raw.items()}
    want_auth = sorted(a.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    want_hub = sorted(h.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    rows = wave35.gr_hits(spark, sf_dir).collect()
    got_auth = [(r["node"], r["score"]) for r in rows if r["role"] == "authority"]
    got_hub = [(r["node"], r["score"]) for r in rows if r["role"] == "hub"]
    assert got_auth == want_auth
    assert got_hub == want_hub
    # normalization invariant: every score in [0, scale], max == scale
    assert max(s for _, s in got_auth) == scale
    assert max(s for _, s in got_hub) == scale


def test_local_clustering_matches_python(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    sh = {}
    for r in docs:
        toks = [t for t in r["text"].split() if t]
        if len(toks) >= 3:
            sh[r["doc_id"]] = {
                " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
            }
    ids = sorted(sh)
    edges = set()
    for i, da in enumerate(ids):
        for db in ids[i + 1 :]:
            inter = len(sh[da] & sh[db])
            if inter and inter / len(sh[da] | sh[db]) >= 0.5:
                edges.add((da, db))
    adj = defaultdict(set)
    for x, y in edges:
        adj[x].add(y)
        adj[y].add(x)
    rows = {r["node"]: r for r in wave35.gr_local_clustering(spark, sf_dir).collect()}
    want_nodes = {u for u in adj if len(adj[u]) >= 2}
    assert set(rows) == want_nodes
    for u in want_nodes:
        d = len(adj[u])
        tri = sum(
            1
            for v in adj[u]
            for w in adj[u]
            if v < w and w in adj[v]
        )
        r = rows[u]
        assert r["degree"] == d
        assert r["n_tri"] == tri
        assert math.isclose(r["coef"], 2 * tri / (d * (d - 1)), rel_tol=1e-12)
