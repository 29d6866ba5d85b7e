"""Mergeable histogram quantile sketch (`operators/sketches.py`):
merge-equivalence, partition independence, saturation, error bound."""

from __future__ import annotations

from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.operators import sketches

LO, HI, BINS = 0, 1000, 100
QS = [("p50", 1, 2), ("p90", 9, 10)]


def _df(spark, vals, key="k"):
    return spark.createDataFrame([(key, v) for v in vals], "g STRING, x LONG")


def test_rollup_equals_direct_profile(spark):
    rows = [("a", "u", v) for v in range(0, 500, 7)] + [("a", "w", v) for v in range(200, 900, 3)]
    df = spark.createDataFrame(rows, "coarse STRING, fine STRING, x LONG")
    fine = sketches.histogram_profile(df, ["coarse", "fine"], "x", LO, HI, BINS)
    rolled = sketches.histogram_rollup(fine, ["coarse"])
    direct = sketches.histogram_profile(df, ["coarse"], "x", LO, HI, BINS)
    assert sorted(map(tuple, rolled.collect())) == sorted(map(tuple, direct.collect()))


def test_partition_independence(spark):
    vals = [(i * 37) % 1000 for i in range(500)]
    a = sketches.histogram_quantiles(
        sketches.histogram_profile(_df(spark, vals).repartition(1), ["g"], "x", LO, HI, BINS),
        ["g"], QS, LO, HI, BINS,
    ).collect()
    b = sketches.histogram_quantiles(
        sketches.histogram_profile(_df(spark, vals).repartition(16), ["g"], "x", LO, HI, BINS),
        ["g"], QS, LO, HI, BINS,
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_saturation_preserves_count(spark):
    vals = [-50, -1, 0, 500, 999, 1000, 5000]
    prof = sketches.histogram_profile(_df(spark, vals), ["g"], "x", LO, HI, BINS)
    rows = {r["bin"]: r["cnt"] for r in prof.collect()}
    assert sum(rows.values()) == len(vals)
    assert rows[0] == 3  # two below-range + the exact lo
    assert rows[BINS - 1] == 3  # 999 (in-range top bin) + two at/above hi


def test_error_bound_vs_exact_quantiles(spark):
    vals = [(i * i * 13) % 1000 for i in range(2000)]
    est = sketches.histogram_quantiles(
        sketches.histogram_profile(_df(spark, vals), ["g"], "x", LO, HI, BINS),
        ["g"], QS, LO, HI, BINS,
    ).collect()[0]
    bin_width = (HI - LO) // BINS
    s = sorted(vals)
    for name, num, den in QS:
        # lower-quantile convention: smallest value v with rank(v) ≥ q·n
        exact = s[max(0, (num * len(s) + den - 1) // den - 1)]
        assert abs(est[name] - exact) <= bin_width


def test_merge_is_sum_of_states(spark):
    a = sketches.histogram_profile(_df(spark, list(range(100))), ["g"], "x", LO, HI, BINS)
    b = sketches.histogram_profile(_df(spark, list(range(50, 200))), ["g"], "x", LO, HI, BINS)
    merged = sketches.histogram_rollup(a.unionByName(b), ["g"])
    direct = sketches.histogram_profile(
        _df(spark, list(range(100)) + list(range(50, 200))), ["g"], "x", LO, HI, BINS
    )
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))
