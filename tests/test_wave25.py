"""Semantic invariants of the wave-25 operators (plans/wave25.py):
exact Python references on the sf0.001 fixtures."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

from movie_data_etl_pipeline_spark.plans import wave25
from movie_data_etl_pipeline_spark.sources import load_table


def _toks(text: str) -> list[str]:
    return [t for t in re.split(r"\s+", text) if t != ""]


def test_perplexity_matches_python_reference(spark, sf_dir):
    rows = {r["doc_id"]: r for r in wave25.tx_perplexity(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    bigrams = {}
    for r in docs:
        t = _toks(r["text"])
        if len(t) >= 2:
            bigrams[r["doc_id"]] = list(zip(t, t[1:]))
    c12 = Counter()
    c1 = Counter()
    vocab = set()
    for d, bgs in bigrams.items():
        if d % 5 != 0:
            for w1, w2 in bgs:
                c12[(w1, w2)] += 1
                c1[w1] += 1
                vocab.add(w1)
                vocab.add(w2)
    v = len(vocab) + 1
    held = {d: bgs for d, bgs in bigrams.items() if d % 5 == 0}
    assert set(rows) == set(held)
    for d, bgs in held.items():
        nll = 0
        for w1, w2 in bgs:
            p = (c12.get((w1, w2), 0) + 1.0) / (c1.get(w1, 0) + float(v))
            nll -= int(round(math.log(p) * 1e6))
        r = rows[d]
        assert r["n_bigrams"] == len(bgs)
        assert r["nll_micro"] == nll
        assert abs(r["ppl"] - round(math.exp(nll / (1e6 * len(bgs))), 3)) < 1e-9
        # smoothed bigram model: worst per-bigram probability is
        # 1/(max_c1 + V), which bounds the geometric mean
        max_c1 = max(c1.values(), default=0)
        assert 1.0 <= r["ppl"] <= max_c1 + v + 1


def test_link_prediction_matches_python_reference(spark, sf_dir):
    rows = wave25.gr_link_prediction(spark, sf_dir).collect()
    orders = {r["o_orderkey"]: r["o_custkey"] for r in load_table(spark, sf_dir, "orders").collect()}
    neigh = defaultdict(set)
    part_fan = defaultdict(set)
    for r in load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").collect():
        c = orders.get(r["l_orderkey"])
        if c is not None:
            neigh[c].add(r["l_partkey"])
            part_fan[r["l_partkey"]].add(c)
    ok_parts = {p for p, cs in part_fan.items() if len(cs) <= 200}
    shared = Counter()
    for p in ok_parts:
        cs = sorted(part_fan[p])
        for i, a in enumerate(cs):
            for b in cs[i + 1 :]:
                shared[(a, b)] += 1
    scored = []
    for (a, b), n in shared.items():
        if n >= 2:
            j = n / (len(neigh[a]) + len(neigh[b]) - n)
            scored.append((-round(j, 6), a, b, n))
    scored.sort()
    want = scored[:100]
    assert len(rows) == min(100, len(want))
    for r, (nj, a, b, n) in zip(rows, want):
        assert (r["c_a"], r["c_b"], r["n_shared"]) == (a, b, n)
        assert abs(r["jaccard"] - (-nj)) < 1e-9


def test_incident_overlap_matches_python_reference(spark, sf_dir):
    rows = wave25.ev_incident_overlap(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    ).collect()
    err_min = sorted(
        {int(r["ts"].timestamp()) // 60 * 60 for r in ev if r["event_type"] == "error"}
    )
    incidents = []
    for m in err_min:
        if incidents and m - incidents[-1][1] <= wave25._INC_GAP_MIN * 60:
            incidents[-1][1] = m
        else:
            incidents.append([m, m])
    incidents = [(i + 1, s, e + 60) for i, (s, e) in enumerate(incidents)]

    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append((r["ts"], r["event_id"], int(r["ts"].timestamp())))
    want = []
    for u, evs in by_user.items():
        evs.sort()
        seq = 0
        sessions = []
        prev = None
        for _, _, es in evs:
            if prev is None or es - prev > wave25._SES_GAP_MIN * 60:
                seq += 1
                sessions.append([seq, es, es])
            else:
                sessions[-1][2] = es
            prev = es
        for sid, s0, s1 in sessions:
            for iid, i0, i1 in incidents:
                if s0 < i1 and i0 <= s1:
                    want.append((u, sid, iid, min(s1, i1 - 1) - max(s0, i0)))
    want.sort()
    got = [(r["user_id"], r["session_seq"], r["inc_id"], r["overlap_s"]) for r in rows]
    assert got == want and len(got) > 0
