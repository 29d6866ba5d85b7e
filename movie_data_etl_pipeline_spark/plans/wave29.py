"""Round-4 wave 29: multiset set-operation surface (INTERSECT ALL /
EXCEPT ALL multiplicity semantics).

Determinism contract unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.sources import load_table


def su_set_ops_all(spark: SparkSession, sf: str) -> DataFrame:
    """The ALL variants `su_set_ops` leaves out — multiset semantics,
    where INTERSECT ALL keeps min(multiplicity) and EXCEPT ALL
    subtracts occurrence-by-occurrence (the bag algebra ANSI SQL
    defines and `distinct`-based rewrites get wrong): the multisets
    are each customer's order rows in 1994 vs 1995, so a customer with
    3 orders in '94 and 1 in '95 contributes 1 to the intersection and
    2 to the '94-only remainder. Output: per operation, row count,
    distinct-customer count, and the exact integer key checksum (the
    multiplicity-weighted sum — wrong under any distinct rewrite).
    One shuffle per set op on the key; all integers."""
    orders = load_table(spark, sf, "orders")
    y94 = orders.filter(F.year("o_orderdate") == 1994).select("o_custkey")
    y95 = orders.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    parts = [
        ("intersect_all", y94.intersectAll(y95)),
        ("except_all_94_95", y94.exceptAll(y95)),
        ("except_all_95_94", y95.exceptAll(y94)),
        ("union_all", y94.unionAll(y95)),
    ]
    outs = []
    for tag, df in parts:
        outs.append(
            df.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.countDistinct("o_custkey").cast("bigint").alias("n_custs"),
                F.sum("o_custkey").cast("bigint").alias("key_checksum"),
            ).select(
                F.lit(tag).alias("op"),
                F.coalesce("n_rows", F.lit(0)).cast("bigint").alias("n_rows"),
                F.coalesce("n_custs", F.lit(0)).cast("bigint").alias("n_custs"),
                F.coalesce("key_checksum", F.lit(0)).cast("bigint").alias("key_checksum"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out.orderBy("op")


_SU_ALL_SQL = """
WITH y94 AS (
  SELECT o_custkey FROM orders WHERE EXTRACT(year FROM CAST(o_orderdate AS DATE)) = 1994
),
y95 AS (
  SELECT o_custkey FROM orders WHERE EXTRACT(year FROM CAST(o_orderdate AS DATE)) = 1995
),
ia AS (SELECT o_custkey FROM y94 INTERSECT ALL SELECT o_custkey FROM y95),
e45 AS (SELECT o_custkey FROM y94 EXCEPT ALL SELECT o_custkey FROM y95),
e54 AS (SELECT o_custkey FROM y95 EXCEPT ALL SELECT o_custkey FROM y94),
ua AS (SELECT o_custkey FROM y94 UNION ALL SELECT o_custkey FROM y95)
SELECT 'intersect_all' AS op, COUNT(*)::BIGINT AS n_rows,
       COUNT(DISTINCT o_custkey)::BIGINT AS n_custs,
       COALESCE(CAST(SUM(o_custkey) AS BIGINT), 0) AS key_checksum FROM ia
UNION ALL
SELECT 'except_all_94_95', COUNT(*)::BIGINT, COUNT(DISTINCT o_custkey)::BIGINT,
       COALESCE(CAST(SUM(o_custkey) AS BIGINT), 0) FROM e45
UNION ALL
SELECT 'except_all_95_94', COUNT(*)::BIGINT, COUNT(DISTINCT o_custkey)::BIGINT,
       COALESCE(CAST(SUM(o_custkey) AS BIGINT), 0) FROM e54
UNION ALL
SELECT 'union_all', COUNT(*)::BIGINT, COUNT(DISTINCT o_custkey)::BIGINT,
       COALESCE(CAST(SUM(o_custkey) AS BIGINT), 0) FROM ua
ORDER BY op
"""


QUERIES = {"su_set_ops_all": su_set_ops_all}
ORACLES = {"su_set_ops_all": _SU_ALL_SQL}
