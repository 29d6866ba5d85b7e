"""Wave-39 invariants: batch sessions, RFM segments, Cramér's V vs
exact Python references on sf0.001."""

from __future__ import annotations

import math
from collections import defaultdict

from movie_data_etl_pipeline_spark.plans import wave39
from movie_data_etl_pipeline_spark.sources import load_table


def test_batch_sessions_matches_python(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts").collect()
    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append(int(r["ts"].timestamp()))
    sessions = []
    for _, secs in by_user.items():
        secs.sort()
        cur = [secs[0]]
        for a, b in zip(secs, secs[1:]):
            if b - a > wave39._SESSION_GAP_S:
                sessions.append(cur)
                cur = []
            cur.append(b)
        sessions.append(cur)
    buckets = defaultdict(lambda: [0, 0, 0, 0])
    for s in sessions:
        b = min(len(s), 6)
        buckets[b][0] += 1
        buckets[b][1] += len(s)
        buckets[b][2] += s[-1] - s[0]
        buckets[b][3] = max(buckets[b][3], s[-1] - s[0])
    got = wave39.ev_batch_sessions(spark, sf_dir).collect()
    assert [r["events_bucket"] for r in got] == sorted(buckets)
    for r in got:
        n, se, sd, mx = buckets[r["events_bucket"]]
        assert (r["n_sessions"], r["sum_events"], r["sum_duration_s"]) == (n, se, sd)
        assert r["max_duration_s"] == mx


def _quintile(values):
    """value -> quintile via the prefix-sum identity (ties share)."""
    hist = defaultdict(int)
    for v in values:
        hist[v] += 1
    n = len(values)
    out, cum = {}, 0
    for v in sorted(hist):
        out[v] = (5 * cum) // n
        cum += hist[v]
    return out


def test_rfm_segments_matches_python(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    ).collect()
    hwm = max(r["o_orderdate"] for r in o)
    cust = defaultdict(lambda: [10**9, 0, 0])
    for r in o:
        c = cust[r["o_custkey"]]
        c[0] = min(c[0], (hwm - r["o_orderdate"]).days)
        c[1] += 1
        c[2] += round(float(r["o_totalprice"]) * 100)
    rq = _quintile([c[0] for c in cust.values()])
    fq = _quintile([c[1] for c in cust.values()])
    mq = _quintile([c[2] for c in cust.values()])
    segs = defaultdict(lambda: [0, 0, 0, 0])
    for rec, freq, money in cust.values():
        k = (rq[rec], fq[freq], mq[money])
        segs[k][0] += 1
        segs[k][1] += rec
        segs[k][2] += freq
        segs[k][3] += money
    got = wave39.ev_rfm_segments(spark, sf_dir).collect()
    assert [(r["rec_q"], r["freq_q"], r["money_q"]) for r in got] == sorted(segs)
    for r in got:
        n, sr, so, sc = segs[(r["rec_q"], r["freq_q"], r["money_q"])]
        assert (r["n_cust"], r["sum_rec_days"], r["sum_orders"], r["sum_cents"]) == (
            n,
            sr,
            so,
            sc,
        )
    assert sum(r["n_cust"] for r in got) == len(cust)


def test_cramers_v_matches_python(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderstatus"
    ).collect()
    cells = defaultdict(int)
    for r in o:
        cells[(r["o_orderpriority"], r["o_orderstatus"])] += 1
    n = len(o)
    rt = defaultdict(int)
    ct = defaultdict(int)
    for (pr, st), c in cells.items():
        rt[pr] += c
        ct[st] += c
    chi2_micro = 0
    for (pr, st), c in cells.items():
        num = n * c - rt[pr] * ct[st]
        chi2_micro += round(1e6 * (num * num) / float(n * rt[pr] * ct[st]))
    r_, c_ = len(rt), len(ct)
    got = wave39.ag_cramers_v(spark, sf_dir).collect()
    assert len(got) == 1
    row = got[0]
    assert (row["n"], row["r"], row["c"]) == (n, r_, c_)
    assert row["chi2_micro"] == chi2_micro
    v = math.sqrt((chi2_micro / 1e6) / float(n * min(r_ - 1, c_ - 1)))
    assert row["cramers_v"] == v
    assert 0.0 <= row["cramers_v"] <= 1.0
