"""Property-based differentials (hypothesis) for the merge family's
new clause shapes:

* ``merge_conditional`` with unconditional update+insert clauses IS
  ``upsert`` — on arbitrary keyed tables (the clause machinery adds
  conditions without changing the base algebra).
* ``merge_conditional`` against a pure-Python clause interpreter on
  arbitrary tables and threshold conditions.
* ``partition_overwrite`` against a pure-Python reference on
  arbitrary partitioned tables (wholesale replacement, pass-through,
  no resurrection).
* ``upsert_evolve`` never loses a key and respects the union schema.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from movie_data_etl_pipeline_spark.operators import merge

SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

rows = st.lists(
    st.tuples(st.integers(0, 15), st.integers(-50, 50)),
    min_size=0,
    max_size=12,
    unique_by=lambda t: t[0],
)


@given(t=rows, u=rows)
@settings(**SETTINGS)
def test_unconditional_merge_equals_upsert(spark, t, u):
    target = spark.createDataFrame(t or [(99, 0)], "k int, x int")
    updates = spark.createDataFrame(u or [(98, 0)], "k int, x int")
    a = {
        tuple(r)
        for r in merge.merge_conditional(
            target,
            updates,
            ["k"],
            when_matched_update="true",
            when_not_matched_insert="true",
        ).collect()
    }
    b = {tuple(r) for r in merge.upsert(target, updates, ["k"]).collect()}
    assert a == b


@given(t=rows, u=rows, thr=st.integers(-40, 40))
@settings(**SETTINGS)
def test_merge_conditional_matches_python_interpreter(spark, t, u, thr):
    target = spark.createDataFrame(t or [(99, 0)], "k int, x int")
    updates = spark.createDataFrame(u or [(98, 0)], "k int, x int")
    got = {
        tuple(r)
        for r in merge.merge_conditional(
            target,
            updates,
            ["k"],
            when_matched_update=f"u.x > {thr}",
            when_matched_delete=f"u.x <= {thr}",
            when_not_matched_insert=f"u.x >= {thr}",
        ).collect()
    }
    tmap = dict(t or [(99, 0)])
    umap = dict(u or [(98, 0)])
    want = set()
    for k, x in tmap.items():
        if k in umap:
            if umap[k] > thr:
                want.add((k, umap[k]))
            # else: delete clause fires (<= thr) — key removed
        else:
            want.add((k, x))
    for k, x in umap.items():
        if k not in tmap and x >= thr:
            want.add((k, x))
    assert got == want


parts = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 30), st.integers(-9, 9)),
    min_size=0,
    max_size=14,
    unique_by=lambda t: t[1],
)


@given(t=parts, u=parts)
@settings(**SETTINGS)
def test_partition_overwrite_matches_python(spark, t, u):
    target = spark.createDataFrame(t or [(0, 99, 0)], "p int, k int, v int")
    updates = spark.createDataFrame(u or [(3, 98, 0)], "p int, k int, v int")
    got = {
        tuple(r)
        for r in merge.partition_overwrite(target, updates, ["p"]).collect()
    }
    urows = u or [(3, 98, 0)]
    uparts = {r[0] for r in urows}
    want = set(urows) | {r for r in (t or [(0, 99, 0)]) if r[0] not in uparts}
    assert got == want


@given(t=rows, u=rows)
@settings(**SETTINGS)
def test_upsert_evolve_key_conservation(spark, t, u):
    target = spark.createDataFrame(t or [(99, 0)], "k int, stale int")
    updates = spark.createDataFrame(u or [(98, 0)], "k int, fresh int")
    out = merge.upsert_evolve(target, updates, ["k"]).collect()
    keys = {r["k"] for r in out}
    assert keys == {r[0] for r in (t or [(99, 0)])} | {r[0] for r in (u or [(98, 0)])}
    tmap = dict(t or [(99, 0)])
    umap = dict(u or [(98, 0)])
    for r in out:
        # stale column survives for target keys, null for pure inserts
        assert r["stale"] == tmap.get(r["k"])
        # fresh column populated exactly for batch keys
        assert r["fresh"] == umap.get(r["k"])


# Nullable condition columns: a clause condition evaluating to SQL NULL
# must behave as "clause does not fire" (ANSI MERGE), never drop the row.
nullable_rows = st.lists(
    st.tuples(st.integers(0, 15), st.none() | st.integers(-50, 50)),
    min_size=0,
    max_size=12,
    unique_by=lambda t: t[0],
)


@given(t=nullable_rows, u=nullable_rows, thr=st.integers(-40, 40))
@settings(**SETTINGS)
def test_merge_conditional_null_condition_is_false(spark, t, u, thr):
    target = spark.createDataFrame(t or [(99, 0)], "k int, x int")
    updates = spark.createDataFrame(u or [(98, 0)], "k int, x int")
    got = {
        tuple(r)
        for r in merge.merge_conditional(
            target,
            updates,
            ["k"],
            when_matched_update=f"u.x > {thr}",
            when_matched_delete=f"u.x <= {thr}",
            when_not_matched_insert=f"u.x >= {thr}",
        ).collect()
    }
    tmap = dict(t or [(99, 0)])
    umap = dict(u or [(98, 0)])
    want = set()
    for k, x in tmap.items():
        if k in umap:
            ux = umap[k]
            if ux is not None and ux > thr:
                want.add((k, ux))
            elif ux is not None and ux <= thr:
                pass  # delete fires
            else:
                want.add((k, x))  # both conditions NULL -> target survives
        else:
            want.add((k, x))
    for k, x in umap.items():
        if k not in tmap and x is not None and x >= thr:
            want.add((k, x))
    assert got == want


def test_partition_overwrite_rejects_column_mismatch(spark):
    target = spark.createDataFrame([(0, 1, 2)], "p int, k int, v int")
    import pytest as _pytest

    missing = spark.createDataFrame([(0, 1)], "p int, k int")
    with _pytest.raises(ValueError, match="missing target columns.*v"):
        merge.partition_overwrite(target, missing, ["p"])
    extra = spark.createDataFrame([(0, 1, 2, 3)], "p int, k int, v int, w int")
    with _pytest.raises(ValueError, match="absent from target.*w"):
        merge.partition_overwrite(target, extra, ["p"])
