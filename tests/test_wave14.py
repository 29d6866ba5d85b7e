"""Semantic invariants of the wave-14 operators (plans/wave14.py) on
the sf0.001 fixtures."""

from __future__ import annotations

import math

from movie_data_etl_pipeline_spark.operators import sampling
from movie_data_etl_pipeline_spark.plans import wave14
from movie_data_etl_pipeline_spark.sources import load_table

from pyspark.sql import functions as F


def test_split_leakage_accounting(spark, sf_dir):
    r = wave14.sa_split_leakage(spark, sf_dir).collect()[0]
    docs = sampling.hash_split(
        load_table(spark, sf_dir, "documents"),
        "doc_id",
        {"train": 0.75, "val": 0.125, "test": 0.125},
    )
    splits = {
        row["split"]: row["n"]
        for row in docs.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert r["n_train"] == splits.get("train", 0)
    assert r["n_test"] == splits.get("test", 0)
    assert 0 <= r["test_docs_leaked"] <= r["n_test"]
    assert 0.0 <= r["contamination_rate"] <= 1.0
    # exact-duplicate texts upper-bound the possible leakage
    dup_docs = (
        load_table(spark, sf_dir, "documents")
        .groupBy("text")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    assert r["leaky_texts"] <= dup_docs


def test_centroid_drift_matches_numpy(spark, sf_dir):
    rows = {r["label"]: r for r in wave14.emb_centroid_drift(spark, sf_dir).collect()}
    raw = load_table(spark, sf_dir, "embeddings").select(
        "label", "vec_id", "embedding"
    ).collect()
    by_label: dict[int, dict[int, list]] = {}
    for r in raw:
        e = [round(float(x) * 1e6) for x in r["embedding"][: wave14._DRIFT_DIMS]]
        by_label.setdefault(r["label"], {0: [], 1: []})[r["vec_id"] % 2].append(e)
    for label, halves in by_label.items():
        if not halves[0] or not halves[1]:
            assert label not in rows
            continue
        ce = [sum(v[i] for v in halves[0]) / len(halves[0]) for i in range(wave14._DRIFT_DIMS)]
        co = [sum(v[i] for v in halves[1]) / len(halves[1]) for i in range(wave14._DRIFT_DIMS)]
        du = [round(a - b) for a, b in zip(ce, co)]
        l2 = math.sqrt(sum(d * d for d in du)) / 1e6
        got = rows[label]
        assert abs(got["l2_drift"] - l2) < 1e-5
        assert got["n_even"] == len(halves[0])
        assert got["n_odd"] == len(halves[1])


def test_key_gaps_blocks_tile_and_account(spark, sf_dir):
    rows = sorted(wave14.qa_key_gaps(spark, sf_dir).collect(), key=lambda r: r["blk"])
    orders = load_table(spark, sf_dir, "orders")
    n_keys = orders.select("o_orderkey").distinct().count()
    assert sum(r["present"] for r in rows) == n_keys
    for r in rows:
        assert 0 <= r["missing"] == r["expected"] - r["present"]
    # the fixture key space is dense: no gaps expected
    assert sum(r["missing"] for r in rows) == 0
    # removing a whole block's keys must surface as missing
    sliced = orders.filter(
        ~F.col("o_orderkey").between(wave14._GAP_BLOCK, 2 * wave14._GAP_BLOCK - 1)
    )
    keys = sliced.select(F.col("o_orderkey").alias("k"))
    blocks = keys.groupBy(F.expr(f"k DIV {wave14._GAP_BLOCK}").alias("blk")).agg(
        F.countDistinct("k").alias("present")
    )
    assert blocks.filter(F.col("blk") == 1).count() == 0  # block fully absent
