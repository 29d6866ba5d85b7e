"""Wave-55 invariants: URL surface and MASE baselines vs exact Python
references on sf0.001."""

from __future__ import annotations

from collections import defaultdict

from movie_data_etl_pipeline_spark.plans import wave55
from movie_data_etl_pipeline_spark.sources import load_table


def test_url_surface_matches_python(spark, sf_dir):
    keys = sorted(
        r["p_partkey"]
        for r in load_table(spark, sf_dir, "part").select("p_partkey").collect()
        if r["p_partkey"] < 300
    )
    got = wave55.fn_url_surface(spark, sf_dir).collect()
    assert [r["k"] for r in got] == keys
    for r in got:
        k = r["k"]
        url = (
            f"https://w{k % 5}.example.com/cat/{k % 11}"
            f"/item?page={k % 7}&sort=price#sec{k % 3}"
        )
        assert r["url"] == url
        assert r["proto"] == "https"
        assert r["host"] == f"w{k % 5}.example.com"
        assert r["path"] == f"/cat/{k % 11}/item"
        assert r["query"] == f"page={k % 7}&sort=price"
        assert r["fragment"] == f"sec{k % 3}"
        assert r["page"] == str(k % 7)
        assert r["missing_param"] is None


def test_mase_baselines_matches_python(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select("o_orderdate").collect()
    days = defaultdict(int)
    for r in o:
        days[r["o_orderdate"]] += 1
    series = [y for _, y in sorted(days.items())]
    targets = list(range(7, len(series)))
    ae1 = sum(abs(series[i] - series[i - 1]) for i in targets)
    ae7 = sum(abs(series[i] - series[i - 7]) for i in targets)
    got = wave55.ts_mase_baselines(spark, sf_dir).collect()
    assert len(got) == 1
    row = got[0]
    assert row["n_days"] == len(targets)
    assert row["ae_naive"] == ae1
    assert row["ae_seasonal"] == ae7
    assert row["mase_seasonal_vs_naive"] == ae7 / float(ae1)
    assert row["mase_seasonal_vs_naive"] > 0.0
