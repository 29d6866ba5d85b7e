"""Wave-51 invariants: Granger-lite F-test vs an exact Python
reference on sf0.001."""

from __future__ import annotations

import math
from collections import defaultdict

from movie_data_etl_pipeline_spark.plans import wave51
from movie_data_etl_pipeline_spark.sources import load_table


def test_granger_lite_matches_python(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_shipdate", "l_quantity", "l_extendedprice"
    ).collect()
    days = defaultdict(lambda: [0, 0])
    for r in li:
        d = days[r["l_shipdate"]]
        d[0] += int(r["l_quantity"])
        d[1] += math.floor(float(r["l_extendedprice"]))
    series = [v for _, v in sorted(days.items())]  # (vol, rev)
    rows = [
        (series[i][1], series[i - 1][1], series[i - 1][0])
        for i in range(1, len(series))
    ]  # (y, x1=rev_lag, x2=vol_lag)
    n = len(rows)
    ay = sum(y for y, _, _ in rows) // n
    a1 = sum(x1 for _, x1, _ in rows) // n
    a2 = sum(x2 for _, _, x2 in rows) // n
    dv = [(y - ay, x1 - a1, x2 - a2) for y, x1, x2 in rows]
    sy = sum(d[0] for d in dv)
    s1 = sum(d[1] for d in dv)
    s2 = sum(d[2] for d in dv)
    s11 = sum(d[1] * d[1] for d in dv)
    s22 = sum(d[2] * d[2] for d in dv)
    s12 = sum(d[1] * d[2] for d in dv)
    s1y = sum(d[1] * d[0] for d in dv)
    s2y = sum(d[2] * d[0] for d in dv)
    syy = sum(d[0] * d[0] for d in dv)
    nn = float(n)
    c11 = s11 - s1 * float(s1) / nn
    c22 = s22 - s2 * float(s2) / nn
    c12 = s12 - s1 * float(s2) / nn
    c1y = s1y - s1 * float(sy) / nn
    c2y = s2y - s2 * float(sy) / nn
    cyy = syy - sy * float(sy) / nn
    rss_r = cyy - c1y * c1y / c11
    det = c11 * c22 - c12 * c12
    b1 = (c22 * c1y - c12 * c2y) / det
    b2 = (c11 * c2y - c12 * c1y) / det
    rss_f = cyy - b1 * c1y - b2 * c2y
    f_stat = (rss_r - rss_f) / (rss_f / (nn - 3.0))

    got = wave51.ag_granger_lite(spark, sf_dir).collect()
    assert len(got) == 1
    row = got[0]
    assert row["n"] == n
    assert (row["s11"], row["s22"], row["s12"]) == (s11, s22, s12)
    assert (row["s1y"], row["s2y"], row["syy"]) == (s1y, s2y, syy)
    assert math.isclose(row["rss_restricted"], rss_r, rel_tol=1e-12)
    assert math.isclose(row["rss_full"], rss_f, rel_tol=1e-12)
    assert math.isclose(row["b_lagged_volume"], b2, rel_tol=1e-9)
    assert math.isclose(row["f_stat"], f_stat, rel_tol=1e-9)
    # adding a regressor can never increase RSS
    assert row["rss_full"] <= row["rss_restricted"]
    assert row["f_stat"] >= 0.0
