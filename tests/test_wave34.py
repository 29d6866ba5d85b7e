"""Wave-34 invariants: AUC / gains / Gini stump vs exact Python
references on the sf0.001 fixtures."""

from __future__ import annotations

import math
from collections import Counter

from movie_data_etl_pipeline_spark.plans import wave34
from movie_data_etl_pipeline_spark.sources import load_table


def _scored(spark, sf_dir):
    rows = load_table(spark, sf_dir, "orders").select(
        "o_totalprice", "o_orderstatus"
    ).collect()
    return [
        (int(round(r["o_totalprice"] * 100)), 1 if r["o_orderstatus"] == "F" else 0)
        for r in rows
    ]


def test_auc_matches_scipy_style_reference(spark, sf_dir):
    data = _scored(spark, sf_dir)
    row = wave34.ml_auc_mw(spark, sf_dir).collect()[0]
    pos = sorted(s for s, y in data if y == 1)
    neg = sorted(s for s, y in data if y == 0)
    # O(P·N) literal Mann-Whitney: wins + half-ties
    u2 = 0
    for sp in pos:
        for sn in neg:
            if sp > sn:
                u2 += 2
            elif sp == sn:
                u2 += 1
    assert row["n_pos"] == len(pos)
    assert row["n_neg"] == len(neg)
    assert row["u2"] == u2
    assert math.isclose(row["auc"], u2 / (2 * len(pos) * len(neg)), rel_tol=0, abs_tol=0)


def test_gains_deciles_partition_and_monotonicity(spark, sf_dir):
    data = _scored(spark, sf_dir)
    out = wave34.ml_gains_deciles(spark, sf_dir).collect()
    n = len(data)
    pos = sum(y for _, y in data)
    # reference: descending sort, bin by count of strictly-greater scores
    above = Counter()
    cnt = Counter(s for s, _ in data)
    run = 0
    for s in sorted(cnt, reverse=True):
        above[s] = run
        run += cnt[s]
    ref_bins = Counter()
    ref_pos = Counter()
    for s, y in data:
        b = (10 * above[s]) // n
        ref_bins[b] += 1
        ref_pos[b] += y
    assert {r["decile"]: r["bin_n"] for r in out} == dict(ref_bins)
    assert {r["decile"]: r["bin_pos"] for r in out} == {
        b: ref_pos[b] for b in ref_bins
    }
    assert out[-1]["cum_n"] == n
    assert out[-1]["cum_pos"] == pos
    assert math.isclose(out[-1]["capture"], 1.0)
    # capture is non-decreasing in decile
    caps = [r["capture"] for r in out]
    assert caps == sorted(caps)


def test_gini_stump_matches_exhaustive_reference(spark, sf_dir):
    data = _scored(spark, sf_dir)
    out = wave34.ml_gini_stump(spark, sf_dir).collect()
    n = len(data)
    pos = sum(y for _, y in data)

    def imp_at(t):
        n_l = sum(1 for s, _ in data if s <= t)
        p_l = sum(y for s, y in data if s <= t)
        n_r, p_r = n - n_l, pos - p_l
        if n_l == 0 or n_r == 0:
            return None
        return (
            n_l - (p_l * p_l + (n_l - p_l) ** 2) / n_l
            + n_r - (p_r * p_r + (n_r - p_r) ** 2) / n_r
        ) / n

    for r in out:
        want = imp_at(r["threshold"])
        assert want is not None
        assert math.isclose(r["imp"], want, rel_tol=1e-12)
        assert r["n_l"] == sum(1 for s, _ in data if s <= r["threshold"])
        assert r["p_l"] == sum(y for s, y in data if s <= r["threshold"])
        assert r["n_l"] + r["n_r"] == n
        assert r["p_l"] + r["p_r"] == pos
    # rank 1 really is the impurity argmin among the candidates
    best = min(out, key=lambda r: (r["imp"], r["threshold"]))
    assert best["pick_rank"] == 1
    ranks = sorted(r["pick_rank"] for r in out)
    assert ranks == list(range(1, len(out) + 1))
