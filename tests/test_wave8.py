"""Semantic invariants of the wave-8 operators (plans/wave8.py) on the
sf0.001 fixtures."""

from __future__ import annotations

from movie_data_etl_pipeline_spark.operators import merge
from movie_data_etl_pipeline_spark.plans import wave8
from movie_data_etl_pipeline_spark.sources import load_table

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# ts_decompose
# ---------------------------------------------------------------------------


def test_decompose_additive_identity_and_edges(spark, sf_dir):
    rows = wave8.ts_decompose(spark, sf_dir).orderBy("day").collect()
    n_days = (
        load_table(spark, sf_dir, "events")
        .select(F.to_date("ts"))
        .distinct()
        .count()
    )
    assert len(rows) == n_days
    # centered 7-day MA is undefined on the first/last 3 days only
    missing = [r["day"] for r in rows if r["trend"] is None]
    assert missing == [r["day"] for r in rows[:3]] + [r["day"] for r in rows[-3:]]
    for r in rows:
        if r["trend"] is not None:
            # components were rounded to 6dp independently: allow 3 ulps
            assert abs(r["cnt"] - (r["trend"] + r["seasonal"] + r["resid"])) < 3e-6


# ---------------------------------------------------------------------------
# ts_m4_downsample
# ---------------------------------------------------------------------------


def test_m4_bounds_and_conservation(spark, sf_dir):
    rows = wave8.ts_m4_downsample(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    assert sum(r["n"] for r in rows) == ev.count()
    for r in rows:
        assert r["v_min_c"] <= r["v_first_c"] <= r["v_max_c"]
        assert r["v_min_c"] <= r["v_last_c"] <= r["v_max_c"]
        assert r["n"] >= 1


# ---------------------------------------------------------------------------
# ev_audience_overlap
# ---------------------------------------------------------------------------


def test_audience_overlap_pairs_and_bounds(spark, sf_dir):
    rows = wave8.ev_audience_overlap(spark, sf_dir).collect()
    n_types = (
        load_table(spark, sf_dir, "events").select("event_type").distinct().count()
    )
    assert len(rows) == n_types * (n_types - 1) // 2
    for r in rows:
        assert r["type_a"] < r["type_b"]
        assert 0 <= r["inter"] <= min(r["n_a"], r["n_b"])
        assert 0.0 <= r["jaccard"] <= 1.0


# ---------------------------------------------------------------------------
# ag_cohort_ltv
# ---------------------------------------------------------------------------


def test_cohort_ltv_monotone_and_conserves_revenue(spark, sf_dir):
    rows = wave8.ag_cohort_ltv(spark, sf_dir).collect()
    by_cohort: dict[str, list] = {}
    for r in rows:
        by_cohort.setdefault(r["cohort"], []).append(r)
    for curve in by_cohort.values():
        curve.sort(key=lambda r: r["age"])
        # age 0 always exists (the cohort-defining order) and the
        # cumulative is nondecreasing
        assert curve[0]["age"] == 0
        for a, b in zip(curve, curve[1:]):
            assert b["cum_rev_c"] >= a["cum_rev_c"]
            assert b["n_cohort"] == a["n_cohort"]
    # final cumulative cents across cohorts == total order cents
    total = sum(c[-1]["cum_rev_c"] for c in by_cohort.values())
    expect = (
        load_table(spark, sf_dir, "orders")
        .select(F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")))
        .collect()[0][0]
    )
    assert total == expect


# ---------------------------------------------------------------------------
# ly_zonemap
# ---------------------------------------------------------------------------


def test_zonemap_clustered_beats_natural_and_skips_truly(spark, sf_dir):
    rows = {r["layout"]: r for r in wave8.ly_zonemap(spark, sf_dir).collect()}
    assert set(rows) == {"natural", "clustered"}
    li = load_table(spark, sf_dir, "lineitem")
    for r in rows.values():
        assert r["rows_total"] == li.count()
        assert 0 <= r["rows_skipped"] <= r["rows_total"]
    # re-clustering by the predicate column can only help
    assert (
        rows["clustered"]["skip_ratio"] >= rows["natural"]["skip_ratio"]
    )
    # skipping is sound: skipped rows are exactly the out-of-range ones
    # under the clustered (month) layout, because month blocks align
    # with the month-boundary predicate
    out_of_range = li.filter(
        (F.col("l_shipdate") < F.lit(wave8._ZM_LO).cast("timestamp"))
        | (F.col("l_shipdate") >= F.lit(wave8._ZM_HI).cast("timestamp"))
    ).count()
    assert rows["clustered"]["rows_skipped"] == out_of_range


# ---------------------------------------------------------------------------
# o14 / merge.upsert_evolve
# ---------------------------------------------------------------------------


def test_upsert_evolve_lifecycle(spark):
    target = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "k int, kept string, stale int"
    )
    updates = spark.createDataFrame(
        [(2, "B", "x"), (3, "C", "y")], "k int, kept string, fresh string"
    )
    out = {r["k"]: r for r in merge.upsert_evolve(target, updates, ["k"]).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["kept"] == "a" and out[1]["stale"] == 10 and out[1]["fresh"] is None
    # matched: incoming wins on shared, old survives on stale, gains fresh
    assert out[2]["kept"] == "B" and out[2]["stale"] == 20 and out[2]["fresh"] == "x"
    # insert: no old value for the stale column
    assert out[3]["kept"] == "C" and out[3]["stale"] is None and out[3]["fresh"] == "y"
    # union schema, target columns first
    assert merge.upsert_evolve(target, updates, ["k"]).columns == [
        "k",
        "kept",
        "stale",
        "fresh",
    ]


def test_upsert_evolve_without_evolution_matches_upsert(spark):
    target = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    updates = spark.createDataFrame([(2, "B"), (3, "C")], "k int, v string")
    a = {
        tuple(r)
        for r in merge.upsert_evolve(target, updates, ["k"]).collect()
    }
    b = {tuple(r) for r in merge.upsert(target, updates, ["k"]).collect()}
    assert a == b


def test_o14_priority_preserved_and_channel_added(spark, sf_dir):
    out = wave8.o14_upsert_evolve(spark, sf_dir)
    assert out.columns[-1] == "o_channel"
    rows = out.collect()
    target_keys = {
        r["o_orderkey"]
        for r in load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 3 != 0)
        .select("o_orderkey")
        .collect()
    }
    for r in rows:
        k = r["o_orderkey"]
        if k % 2 == 0:  # updated or inserted by the batch
            assert r["o_orderstatus"] == "E"
            assert r["o_channel"] == f"ch-{k % 3}"
            if k not in target_keys:  # pure insert: dropped column is null
                assert r["o_orderpriority"] is None
            else:  # matched: dropped column survives from the target
                assert r["o_orderpriority"] is not None
        else:
            assert k in target_keys
            assert r["o_channel"] is None
