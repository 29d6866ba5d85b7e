"""Wave-49 invariants: CUPED readout vs an exact Python reference on
sf0.001."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict


from movie_data_etl_pipeline_spark.plans import wave49
from movie_data_etl_pipeline_spark.sources import load_table


def test_cuped_matches_python(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    ).collect()
    split = wave49._CUPED_SPLIT
    cust = defaultdict(lambda: [0, 0])
    for r in o:
        dollars = math.floor(float(r["o_totalprice"]))
        c = cust[r["o_custkey"]]
        if str(r["o_orderdate"])[:10] < split:
            c[0] += dollars
        else:
            c[1] += dollars
    variants = defaultdict(list)
    for k, (x, y) in cust.items():
        v = "A" if hashlib.md5(str(k).encode()).hexdigest()[0] in "01234567" else "B"
        variants[v].append((x, y))
    n = len(cust)
    sx = sum(x for xs in variants.values() for x, _ in xs)
    sy = sum(y for xs in variants.values() for _, y in xs)
    sxx = sum(x * x for xs in variants.values() for x, _ in xs)
    sxy = sum(x * y for xs in variants.values() for x, y in xs)
    nn = float(n)
    theta = (sxy / nn - (sx / nn) * (sy / nn)) / (sxx / nn - (sx / nn) * (sx / nn))
    mean_x_pool = sx / nn

    got = {r["variant"]: r for r in wave49.ag_cuped(spark, sf_dir).collect()}
    assert set(got) == {"A", "B"}
    for v, rows in variants.items():
        nv = float(len(rows))
        sx_v = sum(x for x, _ in rows)
        sy_v = sum(y for _, y in rows)
        sxx_v = sum(x * x for x, _ in rows)
        syy_v = sum(y * y for _, y in rows)
        sxy_v = sum(x * y for x, y in rows)
        mean_x_v, mean_y_v = sx_v / nv, sy_v / nv
        var_y = syy_v / nv - mean_y_v * mean_y_v
        var_x_v = sxx_v / nv - mean_x_v * mean_x_v
        cov_v = sxy_v / nv - mean_x_v * mean_y_v
        var_adj = var_y - 2 * theta * cov_v + theta * theta * var_x_v
        r = got[v]
        assert r["n_v"] == len(rows)
        assert (r["sx_v"], r["sy_v"]) == (sx_v, sy_v)
        assert math.isclose(r["theta"], theta, rel_tol=1e-12)
        assert math.isclose(r["mean_y"], mean_y_v, rel_tol=1e-12)
        assert math.isclose(
            r["mean_y_cuped"], mean_y_v - theta * (mean_x_v - mean_x_pool), rel_tol=1e-12
        )
        assert math.isclose(r["var_y"], var_y, rel_tol=1e-12)
        assert math.isclose(r["var_y_cuped"], var_adj, rel_tol=1e-9)
        assert math.isclose(r["var_reduction"], 1.0 - var_adj / var_y, rel_tol=1e-6)
        # CUPED must not INCREASE variance when x, y correlate; with a
        # pooled theta the guarantee is approximate, so allow tiny slack
        assert r["var_y_cuped"] <= r["var_y"] * 1.01
