"""Wave-50 invariants: Brown–Forsythe test vs an exact Python
reference on sf0.001."""

from __future__ import annotations

import math
from collections import defaultdict

from movie_data_etl_pipeline_spark.plans import wave50
from movie_data_etl_pipeline_spark.sources import load_table


def test_levene_bf_matches_python(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice"
    ).collect()
    groups = defaultdict(list)
    for r in o:
        groups[r["o_orderpriority"]].append(math.floor(float(r["o_totalprice"])))
    meds = {}
    for g, xs in groups.items():
        xs.sort()
        meds[g] = xs[(len(xs) - 1) // 2]  # lower median
    moments = {}
    for g, xs in groups.items():
        zs = [abs(x - meds[g]) for x in xs]
        moments[g] = (len(zs), sum(zs), sum(z * z for z in zs))
    order = wave50._PRIORITIES
    assert sorted(groups) == sorted(order)
    n = sum(moments[g][0] for g in order)
    sz_all = sum(moments[g][1] for g in order)
    zbar = sz_all / float(n)
    between = 0.0
    within = 0.0
    for g in order:
        ng, sz, szz = moments[g]
        zb = sz / float(ng)
        between += ng * (zb - zbar) ** 2
        within += szz - ng * zb * zb
    w = ((n - 5) / 4.0) * between / within

    got = wave50.ag_levene_bf(spark, sf_dir).collect()
    assert [r["grp"] for r in got] == sorted(order)
    for r in got:
        ng, sz, szz = moments[r["grp"]]
        assert (r["n_g"], r["sz"], r["szz"]) == (ng, sz, szz)
        assert r["median_dollars"] == meds[r["grp"]]
        assert r["n"] == n
        assert math.isclose(r["w_stat"], w, rel_tol=1e-9)
        assert r["w_stat"] >= 0.0
