"""Wave-44 invariants: rolling median and Spearman rho vs exact Python
references on sf0.001."""

from __future__ import annotations

import math
from collections import defaultdict

from movie_data_etl_pipeline_spark.plans import wave44
from movie_data_etl_pipeline_spark.sources import load_table


def test_rolling_median_matches_python(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select("o_orderdate").collect()
    days = defaultdict(int)
    for r in o:
        days[r["o_orderdate"]] += 1
    series = sorted(days.items())
    got = wave44.ts_rolling_median(spark, sf_dir).collect()
    assert len(got) == max(0, len(series) - 6)
    for i, row in enumerate(got):
        window = sorted(n for _, n in series[i : i + 7])
        d, n = series[i + 6]
        assert row["d"] == d
        assert row["n"] == n
        assert row["median7"] == window[3]
        assert row["min7"] == window[0]
        assert row["max7"] == window[6]


def _midranks(values):
    hist = defaultdict(int)
    for v in values:
        hist[v] += 1
    out, cum = {}, 0
    for v in sorted(hist):
        out[v] = 2 * cum + hist[v] + 1
        cum += hist[v]
    return out


def test_spearman_matches_python(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_shipdate", "l_quantity", "l_extendedprice"
    ).collect()
    days = defaultdict(lambda: [0, 0])
    for r in li:
        d = days[r["l_shipdate"]]
        d[0] += int(r["l_quantity"])
        d[1] += round(float(r["l_extendedprice"]) * 100)
    xs = [v[0] for v in days.values()]
    ys = [v[1] for v in days.values()]
    rxm, rym = _midranks(xs), _midranks(ys)
    rx = [rxm[x] for x in xs]
    ry = [rym[y] for y in ys]
    n = len(rx)
    sx, sy = sum(rx), sum(ry)
    sxx = sum(r * r for r in rx)
    syy = sum(r * r for r in ry)
    sxy = sum(a * b for a, b in zip(rx, ry))
    nn = float(n)
    cov = sxy / nn - (sx / nn) * (sy / nn)
    vx = sxx / nn - (sx / nn) * (sx / nn)
    vy = syy / nn - (sy / nn) * (sy / nn)
    rho = cov / (math.sqrt(vx) * math.sqrt(vy))
    got = wave44.ag_spearman(spark, sf_dir).collect()
    assert len(got) == 1
    row = got[0]
    assert (row["n"], row["sx"], row["sy"], row["sxy"]) == (n, sx, sy, sxy)
    assert row["spearman_rho"] == rho
    assert -1.0 <= rho <= 1.0
    # scaled midranks over n values must sum to n*(n+1)
    assert sx == n * (n + 1)
    assert sy == n * (n + 1)
