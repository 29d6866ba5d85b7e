"""Round-4 wave 49: CUPED variance-reduced A/B readout.

Determinism contract: per-customer pre/post spends are exact whole
dollars (cents-squared moment sums would exceed int64 at sf0.1);
variant assignment is the md5-uniform hash split; θ and every
adjusted mean/variance are fixed double expressions over exact int64
moment sums (no per-row double accumulates into an order-sensitive
aggregate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.sources import load_table

_CUPED_SPLIT = "1996-01-01"  # pre-period: orders before; post: from


def ag_cuped(spark: SparkSession, sf: str) -> DataFrame:
    """CUPED variance reduction for the A/B readout: per customer,
    pre-period spend x (the covariate) and post-period spend y (the
    metric), both in whole dollars (cents-squared would exceed int64), variant by md5-uniform parity of the key; θ = cov(x,y)/
    var(x) from pooled exact int64 moments; per variant, the adjusted
    mean ȳᵥ − θ(x̄ᵥ − x̄) and both raw and CUPED-adjusted variances —
    everything a fixed double expression over integer sums, so the
    variance-reduction claim itself is oracle-checked. The
    experimentation upgrade of `ag_ab_test` (z-test) and `ag_did`."""
    o = load_table(spark, sf, "orders")
    cust = o.groupBy("o_custkey").agg(
        # whole dollars, not cents: Σx² over 15k+ customers must stay
        # inside int64 (cents would overflow at sf0.1)
        F.sum(
            F.when(
                F.col("o_orderdate") < _CUPED_SPLIT,
                F.floor("o_totalprice").cast("bigint"),
            ).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("x"),
        F.sum(
            F.when(
                F.col("o_orderdate") >= _CUPED_SPLIT,
                F.floor("o_totalprice").cast("bigint"),
            ).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("y"),
    )
    tagged = cust.withColumn(
        "variant",
        F.when(
            F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 1).isin(
                *list("01234567")
            ),
            "A",
        ).otherwise("B"),
    )
    pooled = tagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    per_v = tagged.groupBy("variant").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_v"),
        F.sum("x").cast("bigint").alias("sx_v"),
        F.sum("y").cast("bigint").alias("sy_v"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx_v"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy_v"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy_v"),
    )
    j = per_v.join(F.broadcast(pooled))
    n, nv = F.col("n").cast("double"), F.col("n_v").cast("double")
    theta = (
        F.col("sxy").cast("double") / n
        - (F.col("sx").cast("double") / n) * (F.col("sy").cast("double") / n)
    ) / (
        F.col("sxx").cast("double") / n
        - (F.col("sx").cast("double") / n) * (F.col("sx").cast("double") / n)
    )
    mean_x_pool = F.col("sx").cast("double") / n
    mean_x_v = F.col("sx_v").cast("double") / nv
    mean_y_v = F.col("sy_v").cast("double") / nv
    var_y = F.col("syy_v").cast("double") / nv - mean_y_v * mean_y_v
    var_x_v = F.col("sxx_v").cast("double") / nv - mean_x_v * mean_x_v
    cov_v = F.col("sxy_v").cast("double") / nv - mean_x_v * mean_y_v
    var_adj = var_y - 2 * theta * cov_v + theta * theta * var_x_v
    return j.select(
        "variant",
        "n_v",
        "sx_v",
        "sy_v",
        theta.alias("theta"),
        mean_y_v.alias("mean_y"),
        (mean_y_v - theta * (mean_x_v - mean_x_pool)).alias("mean_y_cuped"),
        var_y.alias("var_y"),
        var_adj.alias("var_y_cuped"),
        (F.lit(1.0) - var_adj / var_y).alias("var_reduction"),
    ).orderBy("variant")


_AG_CUPED_SQL = f"""
WITH cust AS (
  SELECT o_custkey,
         CAST(SUM(CASE WHEN o_orderdate < DATE '{_CUPED_SPLIT}'
                       THEN CAST(FLOOR(o_totalprice) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS x,
         CAST(SUM(CASE WHEN o_orderdate >= DATE '{_CUPED_SPLIT}'
                       THEN CAST(FLOOR(o_totalprice) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS y
  FROM orders GROUP BY 1
),
tagged AS (
  SELECT *, CASE WHEN substring(md5(CAST(o_custkey AS VARCHAR)), 1, 1)
                      IN ('0','1','2','3','4','5','6','7')
                 THEN 'A' ELSE 'B' END AS variant
  FROM cust
),
pooled AS (
  SELECT COUNT(*)::BIGINT AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM tagged
),
per_v AS (
  SELECT variant,
         COUNT(*)::BIGINT AS n_v,
         CAST(SUM(x) AS BIGINT) AS sx_v,
         CAST(SUM(y) AS BIGINT) AS sy_v,
         CAST(SUM(x * x) AS BIGINT) AS sxx_v,
         CAST(SUM(y * y) AS BIGINT) AS syy_v,
         CAST(SUM(x * y) AS BIGINT) AS sxy_v
  FROM tagged GROUP BY 1
),
e AS (
  SELECT *,
         CAST(n AS DOUBLE) AS nn, CAST(n_v AS DOUBLE) AS nv,
         (CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE)
           - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)))
         / (CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
           - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
           AS theta
  FROM per_v CROSS JOIN pooled
),
f AS (
  SELECT *,
         CAST(sx AS DOUBLE) / nn AS mean_x_pool,
         CAST(sx_v AS DOUBLE) / nv AS mean_x_v,
         CAST(sy_v AS DOUBLE) / nv AS mean_y_v,
         CAST(syy_v AS DOUBLE) / nv - (CAST(sy_v AS DOUBLE) / nv) * (CAST(sy_v AS DOUBLE) / nv) AS var_y,
         CAST(sxx_v AS DOUBLE) / nv - (CAST(sx_v AS DOUBLE) / nv) * (CAST(sx_v AS DOUBLE) / nv) AS var_x_v,
         CAST(sxy_v AS DOUBLE) / nv - (CAST(sx_v AS DOUBLE) / nv) * (CAST(sy_v AS DOUBLE) / nv) AS cov_v
  FROM e
)
SELECT variant, n_v, sx_v, sy_v,
       theta,
       mean_y_v AS mean_y,
       mean_y_v - theta * (mean_x_v - mean_x_pool) AS mean_y_cuped,
       var_y,
       var_y - 2 * theta * cov_v + theta * theta * var_x_v AS var_y_cuped,
       1.0 - (var_y - 2 * theta * cov_v + theta * theta * var_x_v) / var_y
         AS var_reduction
FROM f
ORDER BY variant
"""


QUERIES = {
    "ag_cuped": ag_cuped,
}

ORACLES = {
    "ag_cuped": _AG_CUPED_SQL,
}
