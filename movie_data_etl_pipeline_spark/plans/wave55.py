"""Round-4 wave 55: URL-function surface and MASE forecast baselines.

Determinism contract: URLs are constructed from integer key arithmetic
(no percent-escapes — the container's DuckDB lacks url_decode, so the
oracle mirrors `parse_url` with anchored regexes over byte-identical
strings); MASE numerators/denominators are exact int64 absolute
errors at day grain with one fixed double ratio.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.sources import load_table


def fn_url_surface(spark: SparkSession, sf: str) -> DataFrame:
    """URL-function surface: build a URL per part row from key
    arithmetic, then pin ``parse_url``'s PROTOCOL / HOST / PATH /
    QUERY / REF extraction plus keyed query-parameter lookup (present
    AND missing key → NULL) value-for-value. The log-sessionization
    prerequisite every clickstream pipeline runs. Map-only."""
    p = load_table(spark, sf, "part").filter(F.col("p_partkey") < 300)
    k = F.col("p_partkey").cast("bigint")
    url = F.concat(
        F.lit("https://w"),
        (k % 5).cast("string"),
        F.lit(".example.com/cat/"),
        (k % 11).cast("string"),
        F.lit("/item?page="),
        (k % 7).cast("string"),
        F.lit("&sort=price#sec"),
        (k % 3).cast("string"),
    )
    u = p.select(k.alias("k"), url.alias("url"))
    return u.select(
        "k",
        "url",
        F.parse_url("url", F.lit("PROTOCOL")).alias("proto"),
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("REF")).alias("fragment"),
        F.parse_url("url", F.lit("QUERY"), F.lit("page")).alias("page"),
        F.parse_url("url", F.lit("QUERY"), F.lit("missing")).alias("missing_param"),
    ).orderBy("k")


_FN_URL_SQL = """
WITH u AS (
  SELECT CAST(p_partkey AS BIGINT) AS k,
         'https://w' || CAST(CAST(p_partkey AS BIGINT) % 5 AS VARCHAR)
           || '.example.com/cat/'
           || CAST(CAST(p_partkey AS BIGINT) % 11 AS VARCHAR)
           || '/item?page=' || CAST(CAST(p_partkey AS BIGINT) % 7 AS VARCHAR)
           || '&sort=price#sec' || CAST(CAST(p_partkey AS BIGINT) % 3 AS VARCHAR)
           AS url
  FROM part WHERE p_partkey < 300
)
SELECT k, url,
       regexp_extract(url, '^([a-z]+)://', 1) AS proto,
       regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
       regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1) AS path,
       regexp_extract(url, '\\?([^#]*)', 1) AS query,
       regexp_extract(url, '#(.*)$', 1) AS fragment,
       regexp_extract(url, '[?&]page=([^&#]*)', 1) AS page,
       CAST(NULL AS VARCHAR) AS missing_param
FROM u
ORDER BY k
"""


def ts_mase_baselines(spark: SparkSession, sf: str) -> DataFrame:
    """MASE-style baseline comparison on daily order counts: the mean
    absolute error of the naive (yesterday) and seasonal-naive
    (last week) one-step forecasts, as exact int64 absolute-error sums
    over the day grain, plus their ratio — the scale-free yardstick
    every forecast must beat (a model with MASE ratio > 1 loses to
    copying last week). Restricted to days where BOTH lags exist so
    the two baselines cover the identical target set."""
    o = load_table(spark, sf, "orders")
    days = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.count(F.lit(1)).cast("bigint").alias("y")
    )
    w = Window.orderBy("d")
    lagged = days.select(
        "d",
        "y",
        F.lag("y", 1).over(w).alias("y1"),
        F.lag("y", 7).over(w).alias("y7"),
    ).filter(F.col("y7").isNotNull())
    return lagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum(F.abs(F.col("y") - F.col("y1"))).cast("bigint").alias("ae_naive"),
        F.sum(F.abs(F.col("y") - F.col("y7"))).cast("bigint").alias("ae_seasonal"),
        (
            F.sum(F.abs(F.col("y") - F.col("y7"))).cast("double")
            / F.sum(F.abs(F.col("y") - F.col("y1"))).cast("double")
        ).alias("mase_seasonal_vs_naive"),
    )


_TS_MASE_SQL = """
WITH days AS (
  SELECT o_orderdate AS d, COUNT(*)::BIGINT AS y FROM orders GROUP BY 1
),
lagged AS (
  SELECT d, y,
         lag(y, 1) OVER (ORDER BY d) AS y1,
         lag(y, 7) OVER (ORDER BY d) AS y7
  FROM days
  QUALIFY y7 IS NOT NULL
)
SELECT COUNT(*)::BIGINT AS n_days,
       CAST(SUM(ABS(y - y1)) AS BIGINT) AS ae_naive,
       CAST(SUM(ABS(y - y7)) AS BIGINT) AS ae_seasonal,
       CAST(SUM(ABS(y - y7)) AS DOUBLE) / CAST(SUM(ABS(y - y1)) AS DOUBLE)
         AS mase_seasonal_vs_naive
FROM lagged
"""


QUERIES = {
    "fn_url_surface": fn_url_surface,
    "ts_mase_baselines": ts_mase_baselines,
}

ORACLES = {
    "fn_url_surface": _FN_URL_SQL,
    "ts_mase_baselines": _TS_MASE_SQL,
}
