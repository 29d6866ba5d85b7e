"""Upsert/merge semantics (SURVEY.md §2.6 O8/O9) — including the
reference's idempotency contract ("safe to rerun",
``/root/reference/README.md:81``) and the column-preserving
``runtime_minutes`` trap (``02_etl.py:92-100``).
"""

from __future__ import annotations

from movie_data_etl_pipeline_spark.operators import merge

SCHEMA = "k INT, v STRING, runtime INT"


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_upsert_insert_update_passthrough(spark):
    target = spark.createDataFrame([(1, "old1", 100), (2, "old2", 200)], SCHEMA)
    updates = spark.createDataFrame([(2, "new2", 999), (3, "new3", 300)], SCHEMA)
    out = merge.upsert(target, updates, ["k"])
    assert _rows(out) == [(1, "old1", 100), (2, "new2", 999), (3, "new3", 300)]


def test_upsert_idempotent(spark):
    target = spark.createDataFrame([(1, "a", 1), (2, "b", 2)], SCHEMA)
    updates = spark.createDataFrame([(2, "B", 20), (3, "C", 30)], SCHEMA)
    once = merge.upsert(target, updates, ["k"])
    twice = merge.upsert(once, updates, ["k"])
    assert _rows(once) == _rows(twice)


def test_upsert_preserve_column(spark):
    """The runtime_minutes semantics: the preserved column keeps the OLD
    non-null value on conflict; incoming value only fills target-nulls
    and inserts."""
    target = spark.createDataFrame([(1, "old1", 100), (2, "old2", None)], SCHEMA)
    updates = spark.createDataFrame([(1, "new1", None), (2, "new2", 222), (3, "new3", 333)], SCHEMA)
    out = merge.upsert(target, updates, ["k"], preserve_cols=["runtime"])
    assert _rows(out) == [
        (1, "new1", 100),   # old runtime preserved, other cols updated
        (2, "new2", 222),   # old was NULL → incoming backfills
        (3, "new3", 333),   # pure insert
    ]


def test_insert_if_absent(spark):
    target = spark.createDataFrame([(1, "keep", 1)], SCHEMA)
    incoming = spark.createDataFrame(
        [(1, "SHOULD_NOT_REPLACE", 9), (2, "add", 2), (2, "dup_in_batch", 3)], SCHEMA
    )
    out = merge.insert_if_absent(target, incoming, ["k"])
    got = {r["k"]: r["v"] for r in out.collect()}
    assert got[1] == "keep"
    assert got[2] in ("add", "dup_in_batch")
    assert out.count() == 2


def test_insert_if_absent_idempotent(spark):
    target = spark.createDataFrame([(1, "a", 1)], SCHEMA)
    incoming = spark.createDataFrame([(2, "b", 2)], SCHEMA)
    once = merge.insert_if_absent(target, incoming, ["k"])
    twice = merge.insert_if_absent(once, incoming, ["k"])
    assert _rows(once) == _rows(twice)


def test_scd2_close_insert_and_noop(spark):
    """Changed keys get the old version closed + a new open version;
    no-op change rows (tracked value unchanged) produce nothing; new
    keys insert an open version only."""
    cur = spark.createDataFrame(
        [(1, "a", "2020", None), (2, "b", "2020", None)],
        "k INT, v STRING, valid_from STRING, valid_to STRING",
    )
    changes = spark.createDataFrame(
        [(1, "a2"), (2, "b"), (3, "c")], "k INT, v STRING"
    )
    out = merge.scd2_apply(cur, changes, ["k"], ["v"], "2021")
    assert _rows(out) == [
        (1, "a", "2020", "2021"),
        (1, "a2", "2021", None),
        (2, "b", "2020", None),  # no-op: unchanged value, no new version
        (3, "c", "2021", None),
    ]


def test_scd2_replay_fixed_point(spark):
    """Applying the same change batch twice yields the same history —
    the reference's rerun-safety contract lifted to versioned rows."""
    cur = spark.createDataFrame(
        [(1, "a", "2020", None)], "k INT, v STRING, valid_from STRING, valid_to STRING"
    )
    changes = spark.createDataFrame([(1, "a2")], "k INT, v STRING")
    once = merge.scd2_apply(cur, changes, ["k"], ["v"], "2021")
    twice = merge.scd2_apply(once, changes, ["k"], ["v"], "2021")
    assert _rows(once) == _rows(twice)


def test_scd2_null_tracked_values_compare_null_safe(spark):
    cur = spark.createDataFrame(
        [(1, None, "2020", None)], "k INT, v STRING, valid_from STRING, valid_to STRING"
    )
    noop = spark.createDataFrame([(1, None)], "k INT, v STRING")
    out = merge.scd2_apply(cur, noop, ["k"], ["v"], "2021")
    assert _rows(out) == [(1, None, "2020", None)]
