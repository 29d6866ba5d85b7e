"""Python extension-function surface (functions/python_api): pandas
UDAF and Python UDTF."""

from __future__ import annotations

from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.functions.python_api import sentences, weighted_median


def test_weighted_median_known_values(spark):
    df = spark.createDataFrame(
        [("a", 1.0, 1.0), ("a", 10.0, 3.0), ("a", 100.0, 1.0),
         ("b", 5.0, 2.0), ("b", 7.0, 1.0)],
        "g string, v double, w double",
    )
    out = {
        r["g"]: r["wm"]
        for r in df.groupBy("g").agg(weighted_median("v", "w").alias("wm")).collect()
    }
    # a: weights 1,3,1 -> half=2.5, cum at 10 is 4 -> 10
    # b: weights 2,1 -> half=1.5, cum at 5 is 2 -> 5
    assert out == {"a": 10.0, "b": 5.0}


def test_weighted_median_partition_independent(spark, sf_dir):
    from movie_data_etl_pipeline_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_quantity"
    )
    a = li.groupBy("l_returnflag").agg(
        weighted_median("l_extendedprice", "l_quantity").alias("m"))
    b = li.repartition(7).groupBy("l_returnflag").agg(
        weighted_median("l_extendedprice", "l_quantity").alias("m"))
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_sentences_udtf_lateral(spark):
    spark.udtf.register("sentences", sentences)
    rows = spark.sql(
        "SELECT t.id, s.pos, s.sentence "
        "FROM VALUES (1, 'Hi there. How are you? Good!'), (2, NULL), (3, '...') "
        "t(id, x), LATERAL sentences(x) s ORDER BY id, pos"
    ).collect()
    assert [(r["id"], r["pos"], r["sentence"]) for r in rows] == [
        (1, 0, "Hi there"), (1, 1, "How are you"), (1, 2, "Good"),
    ]
