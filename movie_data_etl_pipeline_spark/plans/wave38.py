"""Round-4 wave 38: multi-source BFS hop histogram, precision-recall
curve, Bloom semi-join reduction, and a column uniqueness profile.

Determinism contract: BFS levels are set-exact (3 unrolled rounds in
lockstep with chained-CTE oracles — the iterative-lockstep recipe);
PR points are fixed doubles over exact int64 prefix counts; the Bloom
path's oracle is the plain semi-join (false positives are verified
away, so one truth, two plans); profile stats are exact counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.functions import scalar as SC
from movie_data_etl_pipeline_spark.operators import bloom, ml_eval
from movie_data_etl_pipeline_spark.sources import load_table

_BFS_ROUNDS = 3
_BFS_SEED_MOD = 100  # seed customers: c_custkey % 100 == 0


def gr_bfs_hops(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-source BFS over the customer–supplier co-order graph
    (nodes: customer c → 2c, supplier s → 2s+1; undirected edges from
    distinct order pairs): 3 unrolled rounds of frontier-expand +
    anti-join against the known set — each round is one equi-join and
    one distinct, the per-round shape PageRank/k-core already use.
    Output: per-hop reached-node count and an integer node-id checksum
    (hop 0 = the seed customers). At 100 TB: rounds are bounded, every
    join keys on node id, frontiers only shrink the unknown set."""
    from movie_data_etl_pipeline_spark.plans.graph_edges import cotx_node_pairs

    e = cotx_node_pairs(spark, sf).select(
        F.col("c_node").alias("u"), F.col("s_node").alias("v")
    )
    und = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    seeds = (
        und.select("u")
        .filter(F.col("u") % (2 * _BFS_SEED_MOD) == 0)
        .distinct()
        .select(F.col("u").alias("node"))
    )
    known = seeds.withColumn("hop", F.lit(0).cast("bigint"))
    frontier = seeds
    for k in range(1, _BFS_ROUNDS + 1):
        nbr = (
            frontier.join(und, frontier["node"] == und["u"])
            .select(F.col("v").alias("node"))
            .distinct()
        )
        new = nbr.join(known.select("node"), "node", "left_anti").localCheckpoint()
        known = known.unionByName(new.withColumn("hop", F.lit(k).cast("bigint")))
        frontier = new
    return (
        known.groupBy("hop")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.sum("node").cast("bigint").alias("checksum"),
        )
        .orderBy("hop")
    )


_GR_BFS_SQL = f"""
WITH e AS (
  SELECT DISTINCT 2 * o_custkey AS u, 2 * l_suppkey + 1 AS v
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
und AS (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
d0 AS (SELECT DISTINCT u AS node FROM und WHERE u % {2 * _BFS_SEED_MOD} = 0),
f1 AS (SELECT DISTINCT v AS node FROM und JOIN d0 ON und.u = d0.node),
n1 AS (SELECT node FROM f1 WHERE node NOT IN (SELECT node FROM d0)),
f2 AS (SELECT DISTINCT v AS node FROM und JOIN n1 ON und.u = n1.node),
n2 AS (SELECT node FROM f2 WHERE node NOT IN
        (SELECT node FROM d0 UNION ALL SELECT node FROM n1)),
f3 AS (SELECT DISTINCT v AS node FROM und JOIN n2 ON und.u = n2.node),
n3 AS (SELECT node FROM f3 WHERE node NOT IN
        (SELECT node FROM d0 UNION ALL SELECT node FROM n1
         UNION ALL SELECT node FROM n2)),
lv AS (
  SELECT CAST(0 AS BIGINT) AS hop, node FROM d0
  UNION ALL SELECT 1, node FROM n1
  UNION ALL SELECT 2, node FROM n2
  UNION ALL SELECT 3, node FROM n3
)
SELECT hop, COUNT(*)::BIGINT AS n_nodes, CAST(SUM(node) AS BIGINT) AS checksum
FROM lv GROUP BY hop ORDER BY hop
"""


def ml_pr_curve(spark: SparkSession, sf: str) -> DataFrame:
    """Precision-recall curve at descending-score decile cuts over the
    wave-34 scored relation: from the score histogram's distributed
    exclusive prefix sums, each decile's boundary carries predicted
    positives k = max(cum+own) and true positives tp — both exact
    int64 — so precision = tp/k, recall = tp/pos, F1 = 2tp/(k+pos)
    are fixed double expressions. No global row rank; bins are pure
    integer arithmetic on the prefix sums (ties share a bin). Reads the
    family-shared cached cum relation (``plans/ml_scored``); the
    descending prefixes it needs are derived map-side
    (``desc_X = tot_X − asc_X − own``)."""
    from movie_data_etl_pipeline_spark.plans.ml_scored import orders_score_cum

    rel = orders_score_cum(spark, sf).select(
        "s",
        "n_s",
        "p",
        "n",
        "pos",
        (F.col("n") - F.col("cum_n_s") - F.col("n_s")).alias("dcum_n_s"),
        (F.col("pos") - F.col("cum_p") - F.col("p")).alias("dcum_p"),
    )
    return (
        rel.withColumn("decile", F.expr("(10 * dcum_n_s) div n"))
        .groupBy("decile")
        .agg(
            F.min("s").cast("bigint").alias("thresh_cents"),
            F.max(F.col("dcum_n_s") + F.col("n_s")).cast("bigint").alias("pred_pos"),
            F.max(F.col("dcum_p") + F.col("p")).cast("bigint").alias("tp"),
            F.max("pos").alias("pos"),
        )
        .select(
            "decile",
            "thresh_cents",
            "pred_pos",
            "tp",
            (F.col("tp").cast("double") / F.col("pred_pos").cast("double")).alias(
                "precision"
            ),
            (F.col("tp").cast("double") / F.col("pos").cast("double")).alias("recall"),
            (
                (2 * F.col("tp")).cast("double")
                / (F.col("pred_pos") + F.col("pos")).cast("double")
            ).alias("f1"),
        )
        .orderBy("decile")
    )


_ML_PR_SQL = """
WITH scored AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS s,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
  FROM orders
),
hist AS (
  SELECT s, CAST(SUM(y) AS BIGINT) AS p, COUNT(*)::BIGINT AS n_s
  FROM scored GROUP BY 1
),
cum AS (
  SELECT s, p, n_s,
         COALESCE(CAST(SUM(n_s) OVER (ORDER BY s DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
           0) AS cum_n_s,
         COALESCE(CAST(SUM(p) OVER (ORDER BY s DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
           0) AS cum_p
  FROM hist
),
tot AS (SELECT CAST(SUM(n_s) AS BIGINT) AS n, CAST(SUM(p) AS BIGINT) AS pos
        FROM hist)
SELECT decile, thresh_cents, pred_pos, tp,
       CAST(tp AS DOUBLE) / CAST(pred_pos AS DOUBLE) AS precision,
       CAST(tp AS DOUBLE) / CAST(pos AS DOUBLE) AS recall,
       CAST(2 * tp AS DOUBLE) / CAST(pred_pos + pos AS DOUBLE) AS f1
FROM (
  SELECT (10 * cum_n_s) // n AS decile,
         CAST(MIN(s) AS BIGINT) AS thresh_cents,
         CAST(MAX(cum_n_s + n_s) AS BIGINT) AS pred_pos,
         CAST(MAX(cum_p + p) AS BIGINT) AS tp,
         MAX(pos) AS pos
  FROM cum CROSS JOIN tot
  GROUP BY 1
)
ORDER BY decile
"""


def jx_bloom_semijoin(spark: SparkSession, sf: str) -> DataFrame:
    """Semi-join reduction via a broadcast Bloom filter
    (``operators/bloom.bloom_semi_join``): lineitem is reduced to the
    rows belonging to urgent fulfilled orders — keys failing the
    filter never reach the exchange; the sliver is verified exactly,
    so the oracle is the plain EXISTS. Result: per-shipmode revenue
    rollup of the surviving rows (exact cents)."""
    o = load_table(spark, sf, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_orderstatus") == "F")
    )
    li = load_table(spark, sf, "lineitem")
    kept = bloom.bloom_semi_join(
        li,
        o.select(F.col("o_orderkey").alias("l_orderkey")),
        "l_orderkey",
        m_bits=1 << 17,
        k=5,
    )
    return (
        kept.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("sum_qty"),
            F.sum(SC.cents("l_extendedprice")).cast("bigint").alias("revenue_cents"),
        )
        .orderBy("l_returnflag")
    )


_JX_BLOOM_SQL = """
SELECT l_returnflag,
       COUNT(*)::BIGINT AS n_items,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM lineitem
WHERE EXISTS (
  SELECT 1 FROM orders
  WHERE o_orderkey = l_orderkey
    AND o_orderpriority = '1-URGENT' AND o_orderstatus = 'F'
)
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

_PROFILE_COLS = ["o_orderstatus", "o_orderpriority", "o_orderdate", "o_custkey", "o_orderkey"]


def qa_uniqueness_profile(spark: SparkSession, sf: str) -> DataFrame:
    """Column uniqueness/cardinality profile over five orders columns
    in ONE pass: stack to (col, value) pairs, count per value, then per
    column report rows, nulls, exact distinct (non-null), the modal
    value's frequency, and the uniqueness ratio distinct/non-null —
    the data-quality profile a catalog crawler emits. Scale: one
    shuffle at (col, value) grain, then a 5-row rollup."""
    o = load_table(spark, sf, "orders")
    stack_args = ", ".join(
        f"'{c}', cast({c} as string)" for c in _PROFILE_COLS
    )
    stacked = o.select(
        F.expr(f"stack({len(_PROFILE_COLS)}, {stack_args}) as (col, value)")
    )
    per_val = stacked.groupBy("col", "value").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    return (
        per_val.groupBy("col")
        .agg(
            F.sum("cnt").cast("bigint").alias("n"),
            F.coalesce(
                F.sum(F.when(F.col("value").isNull(), F.col("cnt"))), F.lit(0)
            )
            .cast("bigint")
            .alias("n_null"),
            F.count(F.when(F.col("value").isNotNull(), F.lit(1)))
            .cast("bigint")
            .alias("n_distinct"),
            F.max(F.when(F.col("value").isNotNull(), F.col("cnt")))
            .cast("bigint")
            .alias("max_freq"),
        )
        .select(
            "col",
            "n",
            "n_null",
            "n_distinct",
            "max_freq",
            (
                F.col("n_distinct").cast("double")
                / (F.col("n") - F.col("n_null")).cast("double")
            ).alias("uniq_ratio"),
        )
        .orderBy("col")
    )


def _profile_sql() -> str:
    blocks = []
    for c in _PROFILE_COLS:
        blocks.append(
            f"SELECT '{c}' AS col, CAST({c} AS VARCHAR) AS value FROM orders"
        )
    stacked = "\nUNION ALL\n".join(blocks)
    return f"""
WITH stacked AS (
{stacked}
),
per_val AS (
  SELECT col, value, COUNT(*)::BIGINT AS cnt FROM stacked GROUP BY 1, 2
)
SELECT col,
       CAST(SUM(cnt) AS BIGINT) AS n,
       CAST(COALESCE(SUM(cnt) FILTER (WHERE value IS NULL), 0) AS BIGINT)
         AS n_null,
       CAST(COUNT(*) FILTER (WHERE value IS NOT NULL) AS BIGINT) AS n_distinct,
       CAST(MAX(cnt) FILTER (WHERE value IS NOT NULL) AS BIGINT) AS max_freq,
       CAST(COUNT(*) FILTER (WHERE value IS NOT NULL) AS DOUBLE)
         / CAST(SUM(cnt) - COALESCE(SUM(cnt) FILTER (WHERE value IS NULL), 0)
                AS DOUBLE) AS uniq_ratio
FROM per_val
GROUP BY col
ORDER BY col
"""


_QA_PROFILE_SQL = _profile_sql()


QUERIES = {
    "gr_bfs_hops": gr_bfs_hops,
    "ml_pr_curve": ml_pr_curve,
    "jx_bloom_semijoin": jx_bloom_semijoin,
    "qa_uniqueness_profile": qa_uniqueness_profile,
}

ORACLES = {
    "gr_bfs_hops": _GR_BFS_SQL,
    "ml_pr_curve": _ML_PR_SQL,
    "jx_bloom_semijoin": _JX_BLOOM_SQL,
    "qa_uniqueness_profile": _QA_PROFILE_SQL,
}
