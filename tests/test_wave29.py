"""Semantic invariants of wave-29 (plans/wave29.py): multiset algebra
identities checked exactly in Python on the sf0.001 fixtures."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.plans import wave29
from movie_data_etl_pipeline_spark.sources import load_table


def test_set_ops_all_match_python_bag_algebra(spark, sf_dir):
    rows = {r["op"]: r for r in wave29.su_set_ops_all(spark, sf_dir).collect()}
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.year("o_orderdate").alias("y")
    ).collect()
    y94 = Counter(r["o_custkey"] for r in orders if r["y"] == 1994)
    y95 = Counter(r["o_custkey"] for r in orders if r["y"] == 1995)
    bags = {
        "intersect_all": y94 & y95,           # min multiplicity
        "except_all_94_95": y94 - y95,        # bag difference
        "except_all_95_94": y95 - y94,
        "union_all": y94 + y95,
    }
    assert set(rows) == set(bags)
    for op, bag in bags.items():
        r = rows[op]
        assert r["n_rows"] == sum(bag.values()), op
        assert r["n_custs"] == len(bag), op
        assert r["key_checksum"] == sum(k * v for k, v in bag.items()), op
    # bag identity: |A ∩all B| + |A −all B| == |A|
    assert (
        rows["intersect_all"]["n_rows"] + rows["except_all_94_95"]["n_rows"]
        == sum(y94.values())
    )
