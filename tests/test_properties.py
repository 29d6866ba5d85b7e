"""Property-based tests (hypothesis): the operator contracts hold for
arbitrary inputs, not just the fixture corpus.

* upsert / insert-if-absent are idempotent (fixed point on rerun) — the
  reference's core load contract (`README.md:81`).
* last-wins dedup keeps exactly the latest occurrence per key
  (`02_etl.py:224-231` semantics).
* asof_join agrees with pandas ``merge_asof`` (the de-facto reference
  implementation) on random keyed timestamp data.
* range_join_binned agrees with the naive theta join for random
  intervals, any bin width.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.operators import joins
from movie_data_etl_pipeline_spark.operators.dedup import dedup_last_wins
from movie_data_etl_pipeline_spark.operators.merge import insert_if_absent, upsert

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

kv_rows = st.lists(
    st.tuples(st.integers(0, 12), st.integers(-5, 5)), min_size=0, max_size=40
)


@given(target=kv_rows, updates=kv_rows)
@settings(**SETTINGS)
def test_upsert_idempotent(spark, target, updates):
    t = spark.createDataFrame(
        [(k, v, i) for i, (k, v) in enumerate(target)], "k long, v long, seq long"
    ).dropDuplicates(["k"])
    u = spark.createDataFrame(
        [(k, v, i) for i, (k, v) in enumerate(updates)], "k long, v long, seq long"
    ).dropDuplicates(["k"])
    once = upsert(t, u, key_cols=["k"])
    twice = upsert(once, u, key_cols=["k"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
    # every update key reflects the update's value
    got = {r["k"]: r["v"] for r in once.collect()}
    for r in u.collect():
        assert got[r["k"]] == r["v"]


@given(target=kv_rows, updates=kv_rows)
@settings(**SETTINGS)
def test_insert_if_absent_never_overwrites(spark, target, updates):
    t = spark.createDataFrame(target or [(99, 99)], "k long, v long").dropDuplicates(["k"])
    u = spark.createDataFrame(updates or [(98, 98)], "k long, v long").dropDuplicates(["k"])
    merged = insert_if_absent(t, u, key_cols=["k"])
    got = {r["k"]: r["v"] for r in merged.collect()}
    for r in t.collect():
        assert got[r["k"]] == r["v"]  # existing rows untouched
    assert set(got) == {r["k"] for r in t.collect()} | {r["k"] for r in u.collect()}


@given(rows=st.lists(st.tuples(st.integers(0, 5), st.integers(-100, 100)), min_size=1, max_size=50))
@settings(**SETTINGS)
def test_dedup_last_wins_keeps_latest(spark, rows):
    df = spark.createDataFrame(
        [(k, v, i) for i, (k, v) in enumerate(rows)], "k long, v long, seq long"
    )
    out = {r["k"]: (r["v"], r["seq"]) for r in dedup_last_wins(df, ["k"], [F.desc("seq")]).collect()}
    expected: dict[int, tuple[int, int]] = {}
    for i, (k, v) in enumerate(rows):
        expected[k] = (v, i)  # later occurrence overwrites
    assert out == expected


@given(
    left=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 3600)), min_size=1, max_size=30),
    right=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 3600), st.integers(0, 99)), min_size=1, max_size=30),
)
@settings(**SETTINGS)
def test_asof_join_matches_pandas(spark, left, right):
    base = dt.datetime(2024, 1, 1)
    ldf = spark.createDataFrame(
        [(i, k, base + dt.timedelta(seconds=s)) for i, (k, s) in enumerate(left)],
        "row_id long, k long, ts timestamp",
    )
    rdf = spark.createDataFrame(
        [(k, base + dt.timedelta(seconds=s), v) for (k, s, v) in right],
        "k long, ts timestamp, v long",
    # pandas merge_asof requires unique right keys per (key, ts): dedup like our engine
    ).groupBy("k", "ts").agg(F.max("v").alias("v"))
    got = {
        r["row_id"]: r["v_r"]
        for r in joins.asof_join(ldf, rdf, on=["k"]).collect()
    }
    lpd = pd.DataFrame(
        [(i, k, base + dt.timedelta(seconds=s)) for i, (k, s) in enumerate(left)],
        columns=["row_id", "k", "ts"],
    ).sort_values("ts", kind="stable")
    rpd = (
        pd.DataFrame([r.asDict() for r in rdf.collect()])
        .sort_values("ts", kind="stable")
    )
    want_df = pd.merge_asof(lpd, rpd, on="ts", by="k", direction="backward")
    want = {
        int(r.row_id): (None if pd.isna(r.v) else int(r.v))
        for r in want_df.itertuples()
    }
    assert got == want


@given(
    points=st.lists(st.integers(-50, 150), min_size=1, max_size=40),
    intervals=st.lists(st.tuples(st.integers(-50, 150), st.integers(0, 60)), min_size=1, max_size=10),
    bin_width=st.sampled_from([1.0, 7.0, 25.0, 100.0]),
)
@settings(**SETTINGS)
def test_range_join_matches_theta(spark, points, intervals, bin_width):
    pts = spark.createDataFrame(
        [(i, float(p)) for i, p in enumerate(points)], "pid long, val double"
    )
    ivs = spark.createDataFrame(
        [(j, float(lo), float(lo + w)) for j, (lo, w) in enumerate(intervals)],
        "iid long, lo double, hi double",
    )
    binned = joins.range_join_binned(pts, ivs, "val", "lo", "hi", bin_width=bin_width)
    naive = pts.join(ivs, (pts.val >= ivs.lo) & (pts.val < ivs.hi), "inner")
    got = sorted((r["pid"], r["iid"]) for r in binned.collect())
    want = sorted((r["pid"], r["iid"]) for r in naive.collect())
    assert got == want


def test_ts_ewma_closed_form_equals_recurrence(spark, sf_dir):
    """The window-parallel closed form must equal the sequential
    zero-init recurrence s_t = 0.25*x_t + 0.75*s_{t-1} it replaces."""
    from movie_data_etl_pipeline_spark.plans.fixture_queries import ts_ewma

    out = ts_ewma(spark, sf_dir).collect()
    by_type: dict[str, list] = {}
    for r in out:
        by_type.setdefault(r["event_type"], []).append(r)
    assert by_type
    for rows in by_type.values():
        rows.sort(key=lambda r: r["day"])
        s = 0.0
        for r in rows:
            s = 0.25 * r["n_events"] + 0.75 * s
            assert abs(r["ewma"] - s) < 1e-6, (r["day"], r["ewma"], s)
