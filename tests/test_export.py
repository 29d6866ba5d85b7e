"""Deterministic shard export (operators/export): stable assignment,
balanced layout, one-directory-per-shard physical write, manifest
consistency with a recount."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.operators import export
from movie_data_etl_pipeline_spark.sources import load_table


def test_shard_assignment_deterministic_and_balanced(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = export.assign_shards(docs, "doc_id", 8).select("doc_id", "shard")
    b = export.assign_shards(docs, "doc_id", 8).select("doc_id", "shard")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    counts = [r["n"] for r in a.groupBy("shard").agg(F.count("*").alias("n")).collect()]
    n, k = sum(counts), len(counts)
    assert k == 8
    # md5-uniform: no shard should exceed 2x the ideal share even on
    # the tiny fixture
    assert max(counts) <= 2 * (n / k) + 1


def test_shard_assignment_stable_under_append(spark, sf_dir):
    """Appending rows must not move existing rows between shards —
    membership is a pure function of the key, not of the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    subset = docs.where(F.col("doc_id") % 3 == 0)
    full = export.assign_shards(docs, "doc_id", 8).select("doc_id", "shard")
    part = export.assign_shards(subset, "doc_id", 8).select("doc_id", "shard")
    joined = part.alias("p").join(full.alias("f"), "doc_id")
    assert joined.where(F.col("p.shard") != F.col("f.shard")).count() == 0


def test_shard_export_layout_and_roundtrip(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "shards")
    export.shard_export(docs, path, "doc_id", 4)
    dirs = sorted(d for d in os.listdir(path) if d.startswith("shard="))
    assert dirs == ["shard=0", "shard=1", "shard=2", "shard=3"]
    back = spark.read.parquet(path)
    assert back.count() == docs.count()
    # partition column round-trips as the assignment function
    expect = export.assign_shards(docs, "doc_id", 4).select("doc_id", "shard")
    got = back.select("doc_id", F.col("shard").cast("int").alias("shard"))
    assert got.exceptAll(expect).count() == 0 and expect.exceptAll(got).count() == 0


def test_manifest_matches_recount(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    man = export.shard_manifest(docs, "doc_id", 8, "n_chars")
    total_rows = sum(r["n_rows"] for r in man.collect())
    total_size = sum(r["total_size"] for r in man.collect())
    agg = docs.agg(F.count("*").alias("n"), F.sum("n_chars").alias("s")).first()
    assert total_rows == agg["n"]
    assert total_size == agg["s"]


def test_range_layout_nonoverlapping_sorted_runs(spark, sf_dir, tmp_path):
    from movie_data_etl_pipeline_spark.operators.export import range_layout, range_manifest

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    path = str(tmp_path / "ranged")
    range_layout(docs, path, ("doc_id",), n_files=6)
    man = range_manifest(spark, path, "doc_id").collect()
    assert sum(r["n_rows"] for r in man) == docs.count()
    # non-overlapping, ordered key slices across files
    for prev, nxt in zip(man, man[1:]):
        assert prev["max_key"] < nxt["min_key"]
    # rows inside each file are sorted (read preserves file order per split)
    one = spark.read.parquet(man[0]["file"]).select("doc_id").collect()
    ids = [r["doc_id"] for r in one]
    assert ids == sorted(ids)


def test_global_row_number_equals_sql_window(spark, sf_dir):
    from movie_data_etl_pipeline_spark.operators.indexing import global_row_number
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    got = global_row_number(li, ["l_orderkey", "l_linenumber"])
    want = li.withColumn(
        "rn",
        F.row_number().over(Window.orderBy("l_orderkey", "l_linenumber")).cast("bigint"),
    )
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_global_row_number_no_exchange_reuse_dependence(spark, sf_dir):
    from movie_data_etl_pipeline_spark.operators.indexing import global_row_number

    old = spark.conf.get("spark.sql.exchange.reuse", "true")
    try:
        spark.conf.set("spark.sql.exchange.reuse", "false")
        li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
        got = global_row_number(li, ["l_orderkey", "l_linenumber"])
        # a correct numbering is a bijection onto 1..N
        n = li.count()
        stats = got.agg(
            F.count("*").alias("c"),
            F.countDistinct("rn").alias("d"),
            F.min("rn").alias("lo"),
            F.max("rn").alias("hi"),
        ).first()
        assert (stats["c"], stats["d"], stats["lo"], stats["hi"]) == (n, n, 1, n)
    finally:
        spark.conf.set("spark.sql.exchange.reuse", old)
