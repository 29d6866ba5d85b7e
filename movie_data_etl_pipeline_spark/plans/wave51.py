"""Round-4 wave 51: Granger-style lagged-predictor F-test on the
daily series.

Determinism contract: the lagged day-grain relation is metadata-sized
(the sanctioned ts_* window domain); moments are anchored int64 (the
wave-45 discipline); both models' RSS and the F statistic are fixed
double expressions over those exact integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.sources import load_table


def ag_granger_lite(spark: SparkSession, sf: str) -> DataFrame:
    """Does yesterday's order VOLUME predict today's revenue beyond
    yesterday's revenue? One-lag Granger screen: restricted model
    y_t ~ y_{t−1} (simple OLS) vs full y_t ~ y_{t−1} + x_{t−1}
    (Cramer's rule, the `ag_ols2_cramer` machinery) on the day-grain
    series in whole dollars; F = (RSS_r − RSS_f) / (RSS_f/(n−3)).
    Every moment is an anchored exact sum (linear terms int64,
    products DECIMAL(38,0)); RSS_r, RSS_f, and F are fixed double
    expressions — the causal-screening gate a metrics team runs
    before trusting a leading indicator."""
    li = load_table(spark, sf, "lineitem")
    days = li.groupBy(F.col("l_shipdate").alias("d")).agg(
        F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("vol"),
        F.sum(F.floor(F.col("l_extendedprice")).cast("bigint"))
        .cast("bigint")
        .alias("rev"),
    )
    w = Window.orderBy("d")
    lagged = (
        days.select(
            "d",
            F.col("rev").alias("y"),
            F.lag("rev").over(w).alias("x1"),  # y_{t-1}
            F.lag("vol").over(w).alias("x2"),  # x_{t-1}
        )
        .filter(F.col("x1").isNotNull())
    )
    anchors = lagged.agg(
        F.expr("sum(y) div count(*)").alias("ay"),
        F.expr("sum(x1) div count(*)").alias("a1"),
        F.expr("sum(x2) div count(*)").alias("a2"),
    )
    dv = lagged.join(F.broadcast(anchors)).select(
        (F.col("y") - F.col("ay")).alias("dy"),
        (F.col("x1") - F.col("a1")).alias("d1"),
        (F.col("x2") - F.col("a2")).alias("d2"),
    )
    # deviation products in exact DECIMAL(38,0) — int64 squares of the
    # daily-revenue deviations overflow at 100x sf0.1 (caught by the
    # round-8 100x error sweep; the ag_ols2_cramer / qa_chi2 class)
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = dv.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("dy").cast("bigint").alias("sy"),
        F.sum("d1").cast("bigint").alias("s1"),
        F.sum("d2").cast("bigint").alias("s2"),
        F.sum(dec("d1") * dec("d1")).alias("s11"),
        F.sum(dec("d2") * dec("d2")).alias("s22"),
        F.sum(dec("d1") * dec("d2")).alias("s12"),
        F.sum(dec("d1") * dec("dy")).alias("s1y"),
        F.sum(dec("d2") * dec("dy")).alias("s2y"),
        F.sum(dec("dy") * dec("dy")).alias("syy"),
    )
    n = F.col("n").cast("double")

    def c(sab, sa, sb):
        return F.col(sab).cast("double") - F.col(sa).cast("double") * F.col(
            sb
        ).cast("double") / n

    c11, c22, c12 = c("s11", "s1", "s1"), c("s22", "s2", "s2"), c("s12", "s1", "s2")
    c1y, c2y, cyy = c("s1y", "s1", "sy"), c("s2y", "s2", "sy"), c("syy", "sy", "sy")
    # restricted: y ~ x1 alone
    rss_r = cyy - c1y * c1y / c11
    # full: Cramer's rule
    det = c11 * c22 - c12 * c12
    b1 = (c22 * c1y - c12 * c2y) / det
    b2 = (c11 * c2y - c12 * c1y) / det
    rss_f = cyy - b1 * c1y - b2 * c2y
    f_stat = (rss_r - rss_f) / (rss_f / (n - F.lit(3.0)))
    # moments surface as doubles (exact below 2^53 — all of sf0.01;
    # one deterministic rounding above; the decimal accumulation stays
    # exact) — see ag_ols2_cramer
    return m.select(
        "n",
        F.col("s11").cast("double").alias("s11"),
        F.col("s22").cast("double").alias("s22"),
        F.col("s12").cast("double").alias("s12"),
        F.col("s1y").cast("double").alias("s1y"),
        F.col("s2y").cast("double").alias("s2y"),
        F.col("syy").cast("double").alias("syy"),
        rss_r.alias("rss_restricted"),
        rss_f.alias("rss_full"),
        b2.alias("b_lagged_volume"),
        f_stat.alias("f_stat"),
    )


_AG_GRANGER_SQL = """
WITH days AS (
  SELECT l_shipdate AS d,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS vol,
         CAST(SUM(CAST(FLOOR(l_extendedprice) AS BIGINT)) AS BIGINT) AS rev
  FROM lineitem GROUP BY 1
),
lagged AS (
  SELECT d, rev AS y,
         lag(rev) OVER (ORDER BY d) AS x1,
         lag(vol) OVER (ORDER BY d) AS x2
  FROM days
  QUALIFY x1 IS NOT NULL
),
anchors AS (
  SELECT CAST(SUM(y) AS BIGINT) // COUNT(*) AS ay,
         CAST(SUM(x1) AS BIGINT) // COUNT(*) AS a1,
         CAST(SUM(x2) AS BIGINT) // COUNT(*) AS a2
  FROM lagged
),
dv AS (
  SELECT y - ay AS dy, x1 - a1 AS d1, x2 - a2 AS d2
  FROM lagged CROSS JOIN anchors
),
m AS (
  SELECT COUNT(*)::BIGINT AS n,
         CAST(SUM(dy) AS BIGINT) AS sy,
         CAST(SUM(d1) AS BIGINT) AS s1,
         CAST(SUM(d2) AS BIGINT) AS s2,
         SUM(CAST(d1 AS HUGEINT) * d1) AS s11,
         SUM(CAST(d2 AS HUGEINT) * d2) AS s22,
         SUM(CAST(d1 AS HUGEINT) * d2) AS s12,
         SUM(CAST(d1 AS HUGEINT) * dy) AS s1y,
         SUM(CAST(d2 AS HUGEINT) * dy) AS s2y,
         SUM(CAST(dy AS HUGEINT) * dy) AS syy
  FROM dv
),
e AS (
  SELECT *,
         CAST(n AS DOUBLE) AS nn,
         CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS c11,
         CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS c22,
         CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS c12,
         CAST(s1y AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS c1y,
         CAST(s2y AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS c2y,
         CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS cyy
  FROM m
),
b AS (
  SELECT *,
         cyy - c1y * c1y / c11 AS rss_r,
         (c22 * c1y - c12 * c2y) / (c11 * c22 - c12 * c12) AS b1,
         (c11 * c2y - c12 * c1y) / (c11 * c22 - c12 * c12) AS b2
  FROM e
)
SELECT n,
       CAST(s11 AS DOUBLE) AS s11, CAST(s22 AS DOUBLE) AS s22,
       CAST(s12 AS DOUBLE) AS s12, CAST(s1y AS DOUBLE) AS s1y,
       CAST(s2y AS DOUBLE) AS s2y, CAST(syy AS DOUBLE) AS syy,
       rss_r AS rss_restricted,
       cyy - b1 * c1y - b2 * c2y AS rss_full,
       b2 AS b_lagged_volume,
       (rss_r - (cyy - b1 * c1y - b2 * c2y))
         / ((cyy - b1 * c1y - b2 * c2y) / (nn - 3.0)) AS f_stat
FROM b
"""


QUERIES = {
    "ag_granger_lite": ag_granger_lite,
}

ORACLES = {
    "ag_granger_lite": _AG_GRANGER_SQL,
}
