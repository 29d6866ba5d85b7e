"""Semantic invariants of the wave-16 operators (plans/wave16.py) on
the sf0.001 fixtures."""

from __future__ import annotations

from movie_data_etl_pipeline_spark.operators import merge
from movie_data_etl_pipeline_spark.plans import wave16
from movie_data_etl_pipeline_spark.sources import load_table

from pyspark.sql import functions as F


def test_merge_conditional_clause_semantics(spark):
    target = spark.createDataFrame(
        [(1, "t1", 10), (2, "t2", 20), (3, "t3", 30)], "k int, v string, x int"
    )
    updates = spark.createDataFrame(
        [(1, "u1", 11), (2, "u2", 5), (4, "u4", 40), (5, "u5", 50)],
        "k int, v string, x int",
    )
    out = {
        r["k"]: r
        for r in merge.merge_conditional(
            target,
            updates,
            ["k"],
            when_matched_update="u.x > t.x",      # fires for k=1 (11>10)
            when_matched_delete="u.x <= t.x",     # fires for k=2 (5<=20)
            when_not_matched_insert="u.x >= 50",  # fires for k=5 only
        ).collect()
    }
    assert out[1]["v"] == "u1"          # matched, updated
    assert 2 not in out                  # matched, deleted
    assert out[3]["v"] == "t3"          # matched by nothing: untouched target
    assert 4 not in out                  # unmatched, insert condition false
    assert out[5]["v"] == "u5"          # unmatched, inserted
    assert set(out) == {1, 3, 5}


def test_merge_conditional_none_clauses_are_noops(spark):
    target = spark.createDataFrame([(1, "a")], "k int, v string")
    updates = spark.createDataFrame([(1, "b"), (2, "c")], "k int, v string")
    out = {
        (r["k"], r["v"])
        for r in merge.merge_conditional(target, updates, ["k"]).collect()
    }
    assert out == {(1, "a")}  # nothing fires: target passes through


def test_o16_partitioned_outcomes(spark, sf_dir):
    rows = {r["o_orderkey"]: r for r in
            wave16.o16_merge_conditional(spark, sf_dir).collect()}
    orders = {r["o_orderkey"]: r for r in
              load_table(spark, sf_dir, "orders").collect()}
    for k, src in orders.items():
        in_target = k % 3 != 0
        in_batch = k % 2 == 0
        if in_target and in_batch:
            if src["o_custkey"] % 2 == 0:
                assert rows[k]["o_orderstatus"] == "M"   # updated
            else:
                assert k not in rows                      # deleted
        elif in_target:
            assert rows[k]["o_orderstatus"] == src["o_orderstatus"]
        elif in_batch:
            assert (k in rows) == (k % 4 == 0)            # conditional insert
        else:
            assert k not in rows


def test_interleave_round_robin_properties(spark, sf_dir):
    rows = sorted(
        wave16.px_interleave_order(spark, sf_dir).collect(),
        key=lambda r: r["global_pos"],
    )
    docs = load_table(spark, sf_dir, "documents")
    assert len(rows) == docs.count()
    # positions are unique and dense from 0
    assert [r["global_pos"] for r in rows] == list(range(len(rows)))
    # any window of n_src consecutive positions holds n_src distinct
    # sources while every source still has documents remaining
    n_src = docs.select("source").distinct().count()
    first_window = rows[:n_src]
    assert len({r["source"] for r in first_window}) == n_src
