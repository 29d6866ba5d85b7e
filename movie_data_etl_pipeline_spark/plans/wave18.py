"""Round-3 wave 18: clustering evaluation (purity vs labels), catalog
row profiling, and grouped exact quantile bands.

Determinism contract unchanged: integer counts and snapped distances;
quantiles are order statistics off value-grain histograms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.functions import scalar as SC
from movie_data_etl_pipeline_spark.plans import wave5 as _w5
from movie_data_etl_pipeline_spark.sources import load_table
from movie_data_etl_pipeline_spark.sources.parquet import TABLES


# ---------------------------------------------------------------------------
# sim_cluster_purity — k-means assignment vs ground-truth labels
# ---------------------------------------------------------------------------


def sim_cluster_purity(spark: SparkSession, sf: str) -> DataFrame:
    """Purity of the one-step k-means assignment against the
    embeddings' ground-truth labels: per cluster, the majority label
    and its share — the external-validation readout that tells you
    whether `sim_kmeans_assign`'s geometry recovers the label
    structure (purity ≈ 1/|labels| means it doesn't).

    Reuses wave5's snapped-integer distance kernel so the assignment
    is bit-identical to `sim_kmeans_assign`; majority selection is a
    deterministic (count desc, label asc) rank at cluster×label
    grain."""
    emb = load_table(spark, sf, "embeddings").select(
        "vec_id", "label", _w5._snap(F.col("embedding")).alias("e")
    )
    seeds = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("seed_id"), F.col("e").alias("se")
    )
    cand = emb.crossJoin(F.broadcast(seeds)).select(
        "vec_id", "label", "seed_id", _w5._d2(F.col("e"), F.col("se")).alias("d2")
    )
    w = Window.partitionBy("vec_id").orderBy("d2", "seed_id")
    best = cand.withColumn("r", F.row_number().over(w)).filter(F.col("r") == 1)
    cl = best.groupBy(F.col("seed_id").alias("cluster"), "label").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = cl.groupBy("cluster").agg(F.sum("n").alias("n_assigned"))
    wtop = Window.partitionBy("cluster").orderBy(F.desc("n"), F.asc("label"))
    top = (
        cl.withColumn("r", F.row_number().over(wtop))
        .filter(F.col("r") == 1)
        .select("cluster", F.col("label").alias("top_label"), F.col("n").alias("top_n"))
    )
    return (
        tot.join(top, "cluster")
        .select(
            F.col("cluster").cast("bigint").alias("cluster"),
            "n_assigned",
            F.col("top_label").cast("bigint").alias("top_label"),
            "top_n",
            F.round(F.col("top_n") / F.col("n_assigned").cast("double"), 6).alias(
                "purity"
            ),
        )
        .orderBy("cluster")
    )


_SIM_PURITY_SQL = f"""
WITH e AS (
  SELECT vec_id, label, {_w5._SNAP_SQL.format(col="embedding")} AS s FROM embeddings
),
seeds AS (SELECT vec_id AS seed_id, s AS se FROM e WHERE vec_id < 8),
cand AS (
  SELECT e.vec_id, e.label, seed_id, {_w5._D2_SQL.format(a="s", b="se")} AS d2
  FROM e CROSS JOIN seeds
),
best AS (
  SELECT vec_id, label, seed_id,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, seed_id) AS r
  FROM cand
),
cl AS (
  SELECT seed_id AS cluster, label, COUNT(*) AS n
  FROM best WHERE r = 1 GROUP BY 1, 2
),
tot AS (SELECT cluster, CAST(SUM(n) AS BIGINT) AS n_assigned FROM cl GROUP BY 1),
top AS (
  SELECT cluster, label AS top_label, CAST(n AS BIGINT) AS top_n,
         ROW_NUMBER() OVER (PARTITION BY cluster ORDER BY n DESC, label ASC) AS r
  FROM cl
)
SELECT CAST(t.cluster AS BIGINT) AS cluster, t.n_assigned,
       CAST(p.top_label AS BIGINT) AS top_label, p.top_n,
       ROUND(CAST(p.top_n AS DOUBLE) / CAST(t.n_assigned AS DOUBLE), 6) AS purity
FROM tot t JOIN top p ON t.cluster = p.cluster AND p.r = 1
"""


# ---------------------------------------------------------------------------
# qa_table_profiles — catalog row profile
# ---------------------------------------------------------------------------


def qa_table_profiles(spark: SparkSession, sf: str) -> DataFrame:
    """Catalog-level row profile: one row per fixture table with its
    row count — the cheapest cross-table sanity sweep (a table whose
    count moved 10× between runs is the first thing an on-call looks
    for; `qa_volume_anomaly` is the per-partition refinement). One
    count aggregate per table, unioned at metadata grain."""
    profiles = None
    for name in TABLES:
        t = load_table(spark, sf, name).agg(
            F.lit(name).alias("table_name"), F.count(F.lit(1)).alias("n_rows")
        )
        profiles = t if profiles is None else profiles.unionByName(t)
    return profiles.orderBy("table_name")


_QA_TABLES_SQL = """
SELECT 'region' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_rows FROM region
UNION ALL SELECT 'nation', CAST(COUNT(*) AS BIGINT) FROM nation
UNION ALL SELECT 'customer', CAST(COUNT(*) AS BIGINT) FROM customer
UNION ALL SELECT 'supplier', CAST(COUNT(*) AS BIGINT) FROM supplier
UNION ALL SELECT 'part', CAST(COUNT(*) AS BIGINT) FROM part
UNION ALL SELECT 'orders', CAST(COUNT(*) AS BIGINT) FROM orders
UNION ALL SELECT 'lineitem', CAST(COUNT(*) AS BIGINT) FROM lineitem
UNION ALL SELECT 'events', CAST(COUNT(*) AS BIGINT) FROM events
UNION ALL SELECT 'documents', CAST(COUNT(*) AS BIGINT) FROM documents
UNION ALL SELECT 'embeddings', CAST(COUNT(*) AS BIGINT) FROM embeddings
"""


# ---------------------------------------------------------------------------
# ag_grouped_quantiles — per-group exact quantile bands
# ---------------------------------------------------------------------------


def ag_grouped_quantiles(spark: SparkSession, sf: str) -> DataFrame:
    """Per-priority exact p25/p50/p75/p90 bands of order value — the
    grouped rendering of `ap_exact_quantiles`' histogram-cumulative
    idiom: quantiles are lower order statistics read off the
    (group, cents-value) histogram, with the cumulative window
    PARTITIONED by group at value grain. No per-row window, no
    sort of the fact table."""
    o = load_table(spark, sf, "orders").select(
        F.col("o_orderpriority").alias("priority"), SC.cents("o_totalprice").alias("vc")
    )
    hist = o.groupBy("priority", "vc").agg(F.count(F.lit(1)).alias("c"))
    tot = hist.groupBy("priority").agg(F.sum("c").alias("n"))
    wcum = (
        Window.partitionBy("priority")
        .orderBy("vc")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.select("priority", "vc", F.sum("c").over(wcum).alias("cc"))
    j = cum.join(F.broadcast(tot), "priority")

    def q(mult_c: int, mult_n: int, name: str):
        return F.min(
            F.when(F.col("cc") * mult_c >= mult_n * F.col("n"), F.col("vc"))
        ).alias(name)

    return (
        j.groupBy("priority")
        .agg(
            F.max("n").alias("n_orders"),
            q(4, 1, "p25_c"),
            q(2, 1, "p50_c"),
            q(4, 3, "p75_c"),
            q(10, 9, "p90_c"),
        )
        .orderBy("priority")
    )


_AG_GQ_SQL = """
WITH o AS (
  SELECT o_orderpriority AS priority,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS vc
  FROM orders
),
hist AS (SELECT priority, vc, COUNT(*) AS c FROM o GROUP BY 1, 2),
tot AS (SELECT priority, CAST(SUM(c) AS BIGINT) AS n FROM hist GROUP BY 1),
cum AS (
  SELECT priority, vc,
         CAST(SUM(c) OVER (PARTITION BY priority ORDER BY vc
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cc
  FROM hist
)
SELECT cum.priority,
       MAX(tot.n) AS n_orders,
       MIN(CASE WHEN cc * 4 >= 1 * n THEN vc END) AS p25_c,
       MIN(CASE WHEN cc * 2 >= 1 * n THEN vc END) AS p50_c,
       MIN(CASE WHEN cc * 4 >= 3 * n THEN vc END) AS p75_c,
       MIN(CASE WHEN cc * 10 >= 9 * n THEN vc END) AS p90_c
FROM cum JOIN tot USING (priority)
GROUP BY cum.priority
"""


QUERIES = {
    "sim_cluster_purity": sim_cluster_purity,
    "qa_table_profiles": qa_table_profiles,
    "ag_grouped_quantiles": ag_grouped_quantiles,
}

ORACLES = {
    "sim_cluster_purity": _SIM_PURITY_SQL,
    "qa_table_profiles": _QA_TABLES_SQL,
    "ag_grouped_quantiles": _AG_GQ_SQL,
}
