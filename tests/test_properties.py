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


packing_manifests = st.lists(
    st.tuples(st.integers(0, 200), st.integers(1, 5000)),
    min_size=1,
    max_size=30,
    unique_by=lambda t: t[0],
)


@given(manifest=packing_manifests, target=st.integers(100, 3000))
@settings(**SETTINGS)
def test_compaction_plan_conserves_and_bounds(spark, manifest, target):
    from movie_data_etl_pipeline_spark.operators.layout import compaction_plan

    df = spark.createDataFrame(manifest, "file_id long, rows long")
    plan = compaction_plan(df, target=target).collect()
    # conservation: every file exactly once, sizes add up
    files = [int(f) for r in plan for f in r["files"].split(",")]
    assert sorted(files) == sorted(k for k, _ in manifest)
    assert sum(r["total_rows"] for r in plan) == sum(v for _, v in manifest)
    # bin bound: by sequential packing, a bin exceeds target only via
    # its LAST-packed file, so total < target + max member size
    biggest = max(v for _, v in manifest)
    for r in plan:
        assert r["total_rows"] < target + biggest + 1


@given(a_old=kv_rows, da=kv_rows, b_old=kv_rows, db=kv_rows)
@settings(**SETTINGS)
def test_delta_join_identity_property(spark, a_old, da, b_old, db):
    from movie_data_etl_pipeline_spark.operators.incremental import delta_join

    # disjointness precondition: old and delta must not share rows
    mk = lambda rows, tag: [(k, f"{tag}{v}") for k, v in rows]
    A0 = spark.createDataFrame(mk(a_old, "a") or [(999, "x")], "k long, va string").distinct()
    dA = spark.createDataFrame(mk(da, "A") or [(998, "y")], "k long, va string").distinct()
    B0 = spark.createDataFrame(mk(b_old, "b") or [(999, "x")], "k long, vb string").distinct()
    dB = spark.createDataFrame(mk(db, "B") or [(998, "y")], "k long, vb string").distinct()
    full = A0.unionByName(dA).join(B0.unionByName(dB), "k")
    incr = A0.join(B0, "k").unionByName(delta_join(A0, dA, B0, dB, ["k"]))
    assert sorted(map(tuple, full.collect())) == sorted(map(tuple, incr.collect()))


@given(rows=st.lists(st.tuples(st.integers(0, 50), st.integers(1, 100)),
                     min_size=3, max_size=40, unique_by=lambda t: t[0]))
@settings(**SETTINGS)
def test_weighted_sample_exact_k_and_subset(spark, rows):
    from movie_data_etl_pipeline_spark.operators.sampling import weighted_sample_es

    df = spark.createDataFrame(
        [(f"id{k}", "s", w) for k, w in rows], "key string, src string, w long"
    )
    k = min(5, len(rows))
    out = weighted_sample_es(df, "key", "w", k=k, strata=("src",)).collect()
    assert len(out) == k
    keys = {r["key"] for r in out}
    assert keys <= {f"id{k_}" for k_, _ in rows}
    # determinism under repartitioning
    again = weighted_sample_es(df.repartition(7), "key", "w", k=k, strata=("src",)).collect()
    assert {r["key"] for r in again} == keys
