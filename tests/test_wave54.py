"""Wave-54 invariants: lateral top-N and NB fit vs exact Python
references on sf0.001."""

from __future__ import annotations

import math
from collections import defaultdict

from movie_data_etl_pipeline_spark.plans import wave54
from movie_data_etl_pipeline_spark.sources import load_table


def test_lateral_topn_matches_python(spark, sf_dir):
    regions = load_table(spark, sf_dir, "region").collect()
    nations = load_table(spark, sf_dir, "nation").collect()
    cust = load_table(spark, sf_dir, "customer").select("c_nationkey").collect()
    ncust = defaultdict(int)
    for r in cust:
        ncust[r["c_nationkey"]] += 1
    want = []
    for r in sorted(regions, key=lambda x: x["r_name"]):
        ns = [
            (n["n_name"], ncust.get(n["n_nationkey"], 0))
            for n in nations
            if n["n_regionkey"] == r["r_regionkey"]
        ]
        ns.sort(key=lambda t: (-t[1], t[0]))
        for name, c in ns[:2]:
            want.append((r["r_name"], name, c))
    got = [(r["r_name"], r["n_name"], r["n_cust"]) for r in wave54.sq_lateral_topn(spark, sf_dir).collect()]
    assert got == want
    # every region contributes exactly 2 rows
    per_region = defaultdict(int)
    for rn, _, _ in got:
        per_region[rn] += 1
    assert all(v == 2 for v in per_region.values())


def test_negbin_fit_matches_python(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("user_id").collect()
    per = defaultdict(int)
    for r in ev:
        per[r["user_id"]] += 1
    ks = list(per.values())
    n = len(ks)
    a = sum(ks) // n
    s1 = sum(k - a for k in ks)
    s2 = sum((k - a) ** 2 for k in ks)
    mean = a + s1 / float(n)
    var = s2 / float(n) - (s1 / float(n)) ** 2
    got = wave54.ag_negbin_fit(spark, sf_dir).collect()
    assert len(got) == 1
    row = got[0]
    assert (row["n"], row["s1"], row["s2"]) == (n, s1, s2)
    assert row["mean_events"] == mean
    assert row["var_events"] == var
    assert math.isclose(row["dispersion"], var / mean, rel_tol=1e-12)
    assert math.isclose(row["nb_r"], mean * mean / (var - mean), rel_tol=1e-9)
    assert math.isclose(row["nb_p"], mean / var, rel_tol=1e-12)
    # the fixture event stream is overdispersed (bursty), so NB applies
    assert row["dispersion"] > 1.0
    assert row["nb_r"] > 0.0
    assert 0.0 < row["nb_p"] < 1.0
