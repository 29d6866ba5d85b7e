"""Round-4 wave 30: community conductance — the cut-quality metric
completing the partition-evaluation pair started by `gr_modularity`.

Determinism contract unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.operators import graph
from movie_data_etl_pipeline_spark.plans import _hints
from movie_data_etl_pipeline_spark.plans.wave23 import _lp_round_sql
from movie_data_etl_pipeline_spark.sources import load_table


def gr_conductance(spark: SparkSession, sf: str) -> DataFrame:
    """Conductance of each label-prop community: φ(C) = cut(C) /
    min(vol(C), 2m − vol(C)) — the bottleneck measure (how leaky is
    the community boundary relative to its volume) that complements
    `gr_modularity`'s null-model comparison; low conductance = a
    community random walks stay inside, the property spectral
    clustering optimizes. Same graph, same 3-round partition, same
    integer discipline: cut and volume are exact edge counts, one
    division renders at the end."""
    from movie_data_etl_pipeline_spark.plans.graph_edges import (
        cotx_labels,
        cotx_node_pairs,
    )

    edges_cs = cotx_node_pairs(spark, sf)
    # family-shared cached label-propagation fixed point (also feeds
    # gr_label_prop and gr_modularity)
    lab = cotx_labels(spark, sf).filter(F.col("label").isNotNull())
    # node/dimension-grain bound, gr_modularity's exact shape: `lab` is
    # one row per labeled graph node (customer/supplier dimension
    # keys); pin the broadcast the r8 AQE flip-off removed — A/B'd
    # interleaved with value equality (tools/ab_r9_hints_sf01.json).
    e = (
        edges_cs.join(
            _hints.bounded_broadcast(
                lab.select(F.col("node").alias("c_node"), F.col("label").alias("la"))
            ),
            "c_node",
        )
        .join(
            _hints.bounded_broadcast(
                lab.select(F.col("node").alias("s_node"), F.col("label").alias("lb"))
            ),
            "s_node",
        )
        .select("la", "lb")
    )
    m = e.agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    per = (
        e.select(F.col("la").alias("label"), (F.col("la") != F.col("lb")).cast("bigint").alias("x"))
        .unionAll(
            e.select(F.col("lb").alias("label"), (F.col("la") != F.col("lb")).cast("bigint").alias("x"))
        )
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("vol"),
            F.sum("x").cast("bigint").alias("cut"),
        )
    )
    return (
        per.crossJoin(F.broadcast(m))
        .select(
            "label",
            "vol",
            "cut",
            F.round(
                F.col("cut").cast("double")
                / F.least(F.col("vol"), F.lit(2) * F.col("m") - F.col("vol")).cast("double"),
                6,
            ).alias("conductance"),
        )
        .orderBy("label")
    )


_GR_CONDUCTANCE_SQL = f"""
WITH pairs AS (
  SELECT DISTINCT o_custkey * 2 AS c_node, l_suppkey * 2 + 1 AS s_node
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
sym AS (
  SELECT c_node AS src, s_node AS dst FROM pairs
  UNION ALL
  SELECT s_node AS src, c_node AS dst FROM pairs
),
nodes AS (SELECT DISTINCT src AS node FROM sym),
seeds AS (
  SELECT c_custkey * 2 AS node, c_mktsegment AS label
  FROM customer WHERE c_custkey % 4 = 0
),
l0 AS (SELECT n.node, s.label FROM nodes n LEFT JOIN seeds s USING (node)),
{_lp_round_sql('l0', 'l1')},
{_lp_round_sql('l1', 'l2')},
{_lp_round_sql('l2', 'l3')},
lab AS (SELECT node, label FROM l3 WHERE label IS NOT NULL),
e AS (
  SELECT ca.label AS la, sa.label AS lb
  FROM pairs
  JOIN lab ca ON ca.node = pairs.c_node
  JOIN lab sa ON sa.node = pairs.s_node
),
mm AS (SELECT COUNT(*)::BIGINT AS m FROM e),
per AS (
  SELECT label, COUNT(*)::BIGINT AS vol, CAST(SUM(x) AS BIGINT) AS cut
  FROM (
    SELECT la AS label, CASE WHEN la <> lb THEN 1 ELSE 0 END AS x FROM e
    UNION ALL
    SELECT lb AS label, CASE WHEN la <> lb THEN 1 ELSE 0 END AS x FROM e
  ) GROUP BY label
)
SELECT label, vol, cut,
       ROUND(CAST(cut AS DOUBLE)
             / CAST(LEAST(vol, 2 * mm.m - vol) AS DOUBLE), 6) AS conductance
FROM per CROSS JOIN mm
ORDER BY label
"""


QUERIES = {"gr_conductance": gr_conductance}
ORACLES = {"gr_conductance": _GR_CONDUCTANCE_SQL}
