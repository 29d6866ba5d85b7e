"""Round-4 wave 40: array-function surface, correlated-subquery
surface, and the rank-function window surface.

Determinism contract: arrays are constructed identically in both
engines and rendered to pipe-joined strings (sorted where the
builtin's output order is engine-defined); correlated predicates are
pure integer algebra (max·n ≥ 2·sum, no AVG doubles); rank metrics
are fixed double expressions over exact tie-stable integer ranks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.functions import scalar as SC
from movie_data_etl_pipeline_spark.sources import load_table


def fn_array_surface(spark: SparkSession, sf: str) -> DataFrame:
    """Array built-ins value-pinned vs DuckDB list functions on a
    key-pruned scan: construction, sort (asc/desc), distinct,
    contains/position, min/max/size, fold-sum, slice, sequence, and
    flatten — every array rendered to a '|'-joined string so the
    cross-engine hash sees identical scalars. Map-only."""
    p = load_table(spark, sf, "part").filter(F.col("p_partkey") < 300)
    k = F.col("p_partkey").cast("bigint")
    base = F.array(k % 7, k % 5, k % 3, k % 5, F.lit(2).cast("bigint"))

    def render(arr) -> F.Column:
        return F.concat_ws("|", F.transform(arr, lambda x: x.cast("string")))

    seq = F.sequence(F.lit(1).cast("bigint"), 1 + k % 4)
    return p.select(
        k.alias("k"),
        render(base).alias("base_s"),
        render(F.array_sort(base)).alias("sorted_s"),
        render(F.sort_array(base, asc=False)).alias("dsorted_s"),
        render(F.array_sort(F.array_distinct(base))).alias("distinct_s"),
        F.array_contains(base, F.lit(3).cast("bigint")).alias("has3"),
        F.array_position(base, k % 5).cast("bigint").alias("pos_k5"),
        F.size(base).cast("bigint").alias("sz"),
        F.array_min(base).alias("mn"),
        F.array_max(base).alias("mx"),
        F.aggregate(base, F.lit(0).cast("bigint"), lambda a, x: a + x).alias("total"),
        render(F.slice(base, 2, 3)).alias("slice23_s"),
        render(seq).alias("seq_s"),
        F.aggregate(seq, F.lit(0).cast("bigint"), lambda a, x: a + x).alias("seq_sum"),
        render(F.flatten(F.array(F.array_sort(base), seq))).alias("flat_s"),
    ).orderBy("k")


_FN_ARRAY_SQL = """
WITH p AS (
  SELECT CAST(p_partkey AS BIGINT) AS k FROM part WHERE p_partkey < 300
),
arrs AS (
  SELECT k,
         [k % 7, k % 5, k % 3, k % 5, CAST(2 AS BIGINT)] AS base,
         generate_series(CAST(1 AS BIGINT), 1 + k % 4) AS seq
  FROM p
)
SELECT k,
       array_to_string(base, '|') AS base_s,
       array_to_string(list_sort(base), '|') AS sorted_s,
       array_to_string(list_sort(base, 'DESC'), '|') AS dsorted_s,
       array_to_string(list_sort(list_distinct(base)), '|') AS distinct_s,
       list_contains(base, 3) AS has3,
       CAST(list_position(base, k % 5) AS BIGINT) AS pos_k5,
       CAST(len(base) AS BIGINT) AS sz,
       CAST(list_min(base) AS BIGINT) AS mn,
       CAST(list_max(base) AS BIGINT) AS mx,
       CAST(list_sum(base) AS BIGINT) AS total,
       array_to_string(list_slice(base, 2, 4), '|') AS slice23_s,
       array_to_string(seq, '|') AS seq_s,
       CAST(list_sum(seq) AS BIGINT) AS seq_sum,
       array_to_string(flatten([list_sort(base), seq]), '|') AS flat_s
FROM arrs
ORDER BY k
"""


def sq_correlated_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Correlated-subquery surface, exercised as literal SQL text so
    Catalyst's decorrelation (RewriteCorrelatedScalarSubquery /
    ExistenceJoin) is what runs: customers with an EXISTS'd urgent
    order whose max order total reaches twice their average — stated
    as pure integer algebra (max·n ≥ 2·sum over exact cents, no AVG
    doubles), rolled up per market segment. Reference semantics:
    the reference's view layer nests correlated scalar lookups
    (`sql/create_views.sql`); here the engine decorrelates them into
    keyed joins — the 100 TB-safe plan — automatically."""
    load_table(spark, sf, "customer").createOrReplaceTempView("sq2_customer")
    load_table(spark, sf, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderpriority",
        SC.cents("o_totalprice").alias("cents"),
    ).createOrReplaceTempView("sq2_orders")
    return spark.sql(
        """
        SELECT c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n_cust,
               CAST(SUM(c_custkey) AS BIGINT) AS checksum
        FROM sq2_customer c
        WHERE EXISTS (
                SELECT 1 FROM sq2_orders o
                WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderpriority = '1-URGENT'
              )
          AND (SELECT MAX(o.cents) FROM sq2_orders o
               WHERE o.o_custkey = c.c_custkey)
              * (SELECT COUNT(*) FROM sq2_orders o
                 WHERE o.o_custkey = c.c_custkey)
              >= 2 * (SELECT SUM(o.cents) FROM sq2_orders o
                      WHERE o.o_custkey = c.c_custkey)
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
        """
    )


_SQ_CORR_SQL = """
WITH o AS (
  SELECT o_custkey, o_orderpriority,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
)
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_cust,
       CAST(SUM(c_custkey) AS BIGINT) AS checksum
FROM customer c
WHERE EXISTS (
        SELECT 1 FROM o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
      )
  AND (SELECT MAX(cents) FROM o WHERE o.o_custkey = c.c_custkey)
      * (SELECT COUNT(*) FROM o WHERE o.o_custkey = c.c_custkey)
      >= 2 * (SELECT SUM(cents) FROM o WHERE o.o_custkey = c.c_custkey)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def w11_rank_surface(spark: SparkSession, sf: str) -> DataFrame:
    """Rank-function window surface on a deterministic ~1% key sample
    of orders: rank, dense_rank, percent_rank, and cume_dist by order
    value within each priority class — tie-stable by construction
    (every metric is a pure function of the cents value's position in
    its partition), so duplicate-value rows hash identically in both
    engines. Partitioned windows only."""
    o = load_table(spark, sf, "orders").filter(
        F.pmod(F.col("o_orderkey"), F.lit(97)) == 0
    )
    s = o.select(
        "o_orderkey",
        F.col("o_orderpriority").alias("priority"),
        SC.cents("o_totalprice").alias("cents"),
    )
    w = Window.partitionBy("priority").orderBy(F.desc("cents"))
    return s.select(
        "o_orderkey",
        "priority",
        "cents",
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        F.percent_rank().over(w).alias("prnk"),
        F.cume_dist().over(w).alias("cdist"),
    ).orderBy("priority", F.desc("cents"), "o_orderkey")


_W11_RANK_SQL = """
SELECT o_orderkey,
       o_orderpriority AS priority,
       CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
       CAST(rank() OVER w AS BIGINT) AS rnk,
       CAST(dense_rank() OVER w AS BIGINT) AS drnk,
       percent_rank() OVER w AS prnk,
       cume_dist() OVER w AS cdist
FROM orders
WHERE o_orderkey % 97 = 0
WINDOW w AS (PARTITION BY o_orderpriority
             ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT) DESC)
ORDER BY priority, cents DESC, o_orderkey
"""


QUERIES = {
    "fn_array_surface": fn_array_surface,
    "sq_correlated_agg": sq_correlated_agg,
    "w11_rank_surface": w11_rank_surface,
}

ORACLES = {
    "fn_array_surface": _FN_ARRAY_SQL,
    "sq_correlated_agg": _SQ_CORR_SQL,
    "w11_rank_surface": _W11_RANK_SQL,
}
