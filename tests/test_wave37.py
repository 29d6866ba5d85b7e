"""Wave-37 invariants: association rules, calibration bins, and the
bitwise surfaces vs exact Python references on sf0.001."""

from __future__ import annotations

import math
from collections import defaultdict
from functools import reduce

from movie_data_etl_pipeline_spark.plans import wave36, wave37
from movie_data_etl_pipeline_spark.sources import load_table


def _kept_baskets(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey").collect()
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").collect()
    cust_of = {r["o_orderkey"]: r["o_custkey"] for r in orders}
    baskets = defaultdict(set)
    for r in li:
        c = cust_of.get(r["l_orderkey"])
        if c is not None:
            baskets[c].add(r["l_partkey"])
    return {c: ps for c, ps in baskets.items() if len(ps) <= wave36._CF_MAX_BASKET}


def test_assoc_rules_matches_python(spark, sf_dir):
    kept = _kept_baskets(spark, sf_dir)
    n_baskets = len(kept)
    item_n = defaultdict(int)
    for ps in kept.values():
        for p in ps:
            item_n[p] += 1
    n_ab = defaultdict(int)
    for ps in kept.values():
        sp = sorted(ps)
        for i, pa in enumerate(sp):
            for pb in sp[i + 1 :]:
                n_ab[(pa, pb)] += 1
    rules = []
    for (pa, pb), n in n_ab.items():
        if n < wave36._CF_MIN_SUPPORT:
            continue
        na, nb = item_n[pa], item_n[pb]
        lift = (n_baskets * n) / float(na * nb)
        rules.append((pa, pb, n, na, nb, n / float(n_baskets), n / float(na), lift))
        rules.append((pb, pa, n, nb, na, n / float(n_baskets), n / float(nb), lift))
    rules.sort(key=lambda t: (-t[7], -t[6], t[0], t[1]))
    want = rules[: wave37._AR_TOP]

    got = wave37.rc_assoc_rules(spark, sf_dir).collect()
    assert len(got) == len(want)
    for row, w in zip(got, want):
        assert (row["antecedent"], row["consequent"], row["n_ab"]) == w[:3]
        assert (row["n_ante"], row["n_cons"]) == w[3:5]
        assert row["support"] == w[5]
        assert row["confidence"] == w[6]
        assert row["lift"] == w[7]


def test_calibration_matches_python(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select("o_totalprice", "o_orderstatus").collect()
    scored = [
        (round(float(r["o_totalprice"]) * 100), 1 if r["o_orderstatus"] == "F" else 0)
        for r in o
    ]
    hist = defaultdict(lambda: [0, 0])
    for s, y in scored:
        hist[s][0] += y
        hist[s][1] += 1 - y
    n = len(scored)
    bins = defaultdict(lambda: [0, 0, 0, 0])  # n, pos, sum_phat, brier_num
    cum = 0
    for s in sorted(hist):
        p, m = hist[s]
        n_s = p + m
        phat = (10_000 * (2 * cum + n_s)) // (2 * n)
        b = min(phat // 1000, 9)
        bins[b][0] += n_s
        bins[b][1] += p
        bins[b][2] += n_s * phat
        bins[b][3] += p * (phat - 10_000) ** 2 + m * phat**2
        cum += n_s
    got = wave37.ml_calibration(spark, sf_dir).collect()
    assert [r["bin"] for r in got] == sorted(bins)
    for r in got:
        bn, pos, sp, bnum = bins[r["bin"]]
        assert (r["bin_n"], r["bin_pos"], r["sum_phat"], r["brier_num"]) == (
            bn,
            pos,
            sp,
            bnum,
        )
        assert r["mean_phat"] == sp / float(bn * 10_000)
        assert r["frac_pos"] == pos / float(bn)
        assert r["brier"] == bnum / float(bn * 10_000 * 10_000)
        assert 0.0 <= r["mean_phat"] <= 1.0
    # global Brier of a percentile "probability" against a ~balanced
    # label must sit near the uninformative 1/4 + calibration slack
    total_brier = sum(v[3] for v in bins.values()) / (n * 1e8)
    assert 0.0 < total_brier < 1.0


def test_bitwise_surface_matches_python(spark, sf_dir):
    keys = sorted(
        r["p_partkey"]
        for r in load_table(spark, sf_dir, "part").select("p_partkey").collect()
        if r["p_partkey"] < 200
    )
    got = wave37.fn_bitwise_surface(spark, sf_dir).collect()
    assert [r["k"] for r in got] == keys
    for r in got:
        k = r["k"]
        assert r["band"] == k & 181
        assert r["bor"] == k | 74
        assert r["bxor"] == k ^ 99
        assert r["shl3"] == k << 3
        assert r["shr2"] == k >> 2
        assert r["bnot"] == ~k
        assert r["bcount"] == bin(k).count("1")
        assert r["parity"] == bin(k).count("1") % 2
        assert r["nib"] == (k >> 4) & 15
        assert r["bit5"] == (k >> 5) & 1
        assert r["hexs"] == format(k, "X")
        assert r["flag64"] == (1 if k & 64 else 0)


def test_bitagg_surface_matches_python(spark, sf_dir):
    rows = [
        r
        for r in load_table(spark, sf_dir, "part")
        .select("p_partkey", "p_brand", "p_size")
        .collect()
        if r["p_partkey"] < 2000
    ]
    groups = defaultdict(list)
    for r in rows:
        groups[r["p_brand"]].append(r)
    got = wave37.fn_bitagg_surface(spark, sf_dir).collect()
    assert [r["p_brand"] for r in got] == sorted(groups)
    for r in got:
        ks = [g["p_partkey"] for g in groups[r["p_brand"]]]
        big = [g["p_size"] > 25 for g in groups[r["p_brand"]]]
        assert r["n"] == len(ks)
        assert r["k_and"] == reduce(lambda a, b: a & b, ks)
        assert r["k_or"] == reduce(lambda a, b: a | b, ks)
        assert r["k_xor"] == reduce(lambda a, b: a ^ b, ks)
        assert r["all_big"] == all(big)
        assert r["any_big"] == any(big)
