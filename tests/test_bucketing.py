"""Bucketed tables: pre-shuffled layout makes the join exchange-free.

This is the Spark rendering of the reference's FK-side btree indexes
(`sql/01_schema.sql:62-65`): the *intent* — make key joins cheap — maps
to bucketing, which hash-partitions rows on disk so a later join on the
bucket key needs NO shuffle on either side (SURVEY.md §4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.sources import load_table, write_table


@pytest.fixture()
def bucketed_pair(spark, sf_dir, tmp_path):
    order_cnt = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    line_cnt = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    write_table(
        order_cnt, str(tmp_path / "b_orders"), bucket_by=(8, ("o_orderkey",)), table_name="b_orders"
    )
    write_table(
        line_cnt, str(tmp_path / "b_lineitem"), bucket_by=(8, ("l_orderkey",)), table_name="b_lineitem"
    )
    yield spark.table("b_orders"), spark.table("b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_is_shuffle_free(spark, bucketed_pair):
    orders, lineitem = bucketed_pair
    # disable broadcast so the join must co-locate by partitioning
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey
        ).groupBy("o_orderkey").agg(F.sum("l_quantity").alias("q"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # both sides arrive pre-hashed: a sort-merge join with zero
        # shuffle exchanges before it
        assert "SortMergeJoin" in plan, plan
        join_part = plan.split("SortMergeJoin")[1] if "SortMergeJoin" in plan else plan
        assert "Exchange hashpartitioning" not in join_part, plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_bucketed_agg_skips_exchange(spark, bucketed_pair):
    _, lineitem = bucketed_pair
    agg = lineitem.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    # grouping on the bucket key reuses the on-disk partitioning
    assert "Exchange hashpartitioning" not in plan, plan
    assert agg.count() > 0
