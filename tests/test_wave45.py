"""Wave-45 invariants: two-regressor OLS vs an exact Python reference
on sf0.001."""

from __future__ import annotations

import math
from collections import defaultdict

from movie_data_etl_pipeline_spark.plans import wave45
from movie_data_etl_pipeline_spark.sources import load_table


def test_ols2_matches_python(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_shipdate", "l_quantity", "l_discount", "l_extendedprice"
    ).collect()
    days = defaultdict(lambda: [0, 0, 0])
    for r in li:
        d = days[r["l_shipdate"]]
        d[0] += int(r["l_quantity"])
        d[1] += round(float(r["l_discount"]) * 100)
        d[2] += math.floor(float(r["l_extendedprice"]))
    rows = list(days.values())
    n = len(rows)
    a1 = sum(r[0] for r in rows) // n
    a2 = sum(r[1] for r in rows) // n
    ay = sum(r[2] for r in rows) // n
    s1 = sum(r[0] - a1 for r in rows)
    s2 = sum(r[1] - a2 for r in rows)
    sy = sum(r[2] - ay for r in rows)
    s11 = sum((r[0] - a1) ** 2 for r in rows)
    s22 = sum((r[1] - a2) ** 2 for r in rows)
    s12 = sum((r[0] - a1) * (r[1] - a2) for r in rows)
    s1y = sum((r[0] - a1) * (r[2] - ay) for r in rows)
    s2y = sum((r[1] - a2) * (r[2] - ay) for r in rows)
    syy = sum((r[2] - ay) ** 2 for r in rows)
    nn = float(n)
    c11 = s11 - s1 * float(s1) / nn
    c22 = s22 - s2 * float(s2) / nn
    c12 = s12 - s1 * float(s2) / nn
    c1y = s1y - s1 * float(sy) / nn
    c2y = s2y - s2 * float(sy) / nn
    cyy = syy - sy * float(sy) / nn
    det = c11 * c22 - c12 * c12
    b1 = (c22 * c1y - c12 * c2y) / det
    b2 = (c11 * c2y - c12 * c1y) / det
    r2 = (b1 * c1y + b2 * c2y) / cyy

    got = wave45.ag_ols2_cramer(spark, sf_dir).collect()
    assert len(got) == 1
    row = got[0]
    assert row["n"] == n
    assert (row["s11"], row["s22"], row["s12"]) == (s11, s22, s12)
    assert (row["s1y"], row["s2y"], row["syy"]) == (s1y, s2y, syy)
    # coefficients agree to float noise against the independently
    # ordered Python arithmetic; the ORACLE twin is the bit-exact check
    assert math.isclose(row["b_qty"], b1, rel_tol=1e-12)
    assert math.isclose(row["b_disc"], b2, rel_tol=1e-12)
    assert math.isclose(row["r2"], r2, rel_tol=1e-12)
    assert 0.0 <= row["r2"] <= 1.0
    # sanity: revenue rises with quantity on this data
    assert row["b_qty"] > 0
