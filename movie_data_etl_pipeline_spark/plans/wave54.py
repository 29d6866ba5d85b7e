"""Round-4 wave 54: LATERAL correlated-subquery surface and a
negative-binomial (method-of-moments) overdispersion fit.

Determinism contract: the lateral top-2 is integer-count ranked with
key tiebreaks; the NB fit is fixed double expressions over exact
anchored int64 moments of the per-user event-count histogram.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.sources import load_table


def sq_lateral_topn(spark: SparkSession, sf: str) -> DataFrame:
    """LATERAL correlated-subquery surface, exercised as literal SQL
    (Spark's LATERAL subquery — the per-outer-row derived table the
    reference's view layer writes as dependent subselects): for every
    region, the top-2 nations by customer count, computed by a lateral
    subquery correlated on the region key. Catalyst rewrites the
    lateral into a ranked join — the scale-safe plan — automatically;
    this pins both the SQL surface and the values."""
    load_table(spark, sf, "region").createOrReplaceTempView("lt_region")
    load_table(spark, sf, "nation").createOrReplaceTempView("lt_nation")
    load_table(spark, sf, "customer").createOrReplaceTempView("lt_customer")
    return spark.sql(
        """
        SELECT r.r_name, t.n_name, t.n_cust
        FROM lt_region r,
        LATERAL (
          SELECT n.n_name,
                 CAST(COUNT(c.c_custkey) AS BIGINT) AS n_cust
          FROM lt_nation n LEFT JOIN lt_customer c
            ON c.c_nationkey = n.n_nationkey
          WHERE n.n_regionkey = r.r_regionkey
          GROUP BY n.n_name
          ORDER BY n_cust DESC, n.n_name
          LIMIT 2
        ) t
        ORDER BY r.r_name, t.n_cust DESC, t.n_name
        """
    )


_SQ_LATERAL_SQL = """
SELECT r.r_name, t.n_name, t.n_cust
FROM region r,
LATERAL (
  SELECT n.n_name,
         CAST(COUNT(c.c_custkey) AS BIGINT) AS n_cust
  FROM nation n LEFT JOIN customer c
    ON c.c_nationkey = n.n_nationkey
  WHERE n.n_regionkey = r.r_regionkey
  GROUP BY n.n_name
  ORDER BY n_cust DESC, n.n_name
  LIMIT 2
) t
ORDER BY r.r_name, t.n_cust DESC, t.n_name
"""


def ag_negbin_fit(spark: SparkSession, sf: str) -> DataFrame:
    """Overdispersion profile of per-user event counts with a
    negative-binomial method-of-moments fit: mean m and variance v
    from exact anchored int64 moments, dispersion index v/m, and the
    NB parameters r̂ = m²/(v−m), p̂ = m/v — all fixed double
    expressions. The count-model screen (is traffic Poisson or
    bursty?) that decides which simulator a capacity model uses;
    `ts_fano_factor` is its windowed sibling."""
    ev = load_table(spark, sf, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("k")
    )
    anchors = per_user.agg(F.expr("sum(k) div count(*)").alias("a"))
    dv = per_user.join(F.broadcast(anchors)).select(
        (F.col("k") - F.col("a")).alias("dk"), "a"
    )
    m = dv.groupBy("a").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("dk").cast("bigint").alias("s1"),
        F.sum(F.col("dk") * F.col("dk")).cast("bigint").alias("s2"),
    )
    n = F.col("n").cast("double")
    mean = F.col("a").cast("double") + F.col("s1").cast("double") / n
    var = (
        F.col("s2").cast("double") / n
        - (F.col("s1").cast("double") / n) * (F.col("s1").cast("double") / n)
    )
    return m.select(
        "n",
        "s1",
        "s2",
        mean.alias("mean_events"),
        var.alias("var_events"),
        (var / mean).alias("dispersion"),
        (mean * mean / (var - mean)).alias("nb_r"),
        (mean / var).alias("nb_p"),
    )


_AG_NEGBIN_SQL = """
WITH per_user AS (
  SELECT user_id, COUNT(*)::BIGINT AS k FROM events GROUP BY 1
),
anchors AS (SELECT CAST(SUM(k) AS BIGINT) // COUNT(*) AS a FROM per_user),
dv AS (SELECT k - a AS dk, a FROM per_user CROSS JOIN anchors),
m AS (
  SELECT a, COUNT(*)::BIGINT AS n,
         CAST(SUM(dk) AS BIGINT) AS s1,
         CAST(SUM(dk * dk) AS BIGINT) AS s2
  FROM dv GROUP BY 1
)
SELECT n, s1, s2,
       CAST(a AS DOUBLE) + CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean_events,
       CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
         - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
           * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) AS var_events,
       (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
         - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
           * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
       / (CAST(a AS DOUBLE) + CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) AS dispersion,
       (CAST(a AS DOUBLE) + CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
         * (CAST(a AS DOUBLE) + CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
       / ((CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
           - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
             * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
          - (CAST(a AS DOUBLE) + CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))) AS nb_r,
       (CAST(a AS DOUBLE) + CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
       / (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
          - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
            * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))) AS nb_p
FROM m
"""


QUERIES = {
    "sq_lateral_topn": sq_lateral_topn,
    "ag_negbin_fit": ag_negbin_fit,
}

ORACLES = {
    "sq_lateral_topn": _SQ_LATERAL_SQL,
    "ag_negbin_fit": _AG_NEGBIN_SQL,
}
