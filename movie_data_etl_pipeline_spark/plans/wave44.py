"""Round-4 wave 44: exact 7-day rolling median and Spearman rank
correlation — two order-statistics operators on the day-grain series.

Determinism contract: the rolling median is the middle element of a
sorted full 7-element integer frame (odd frame → exact integer, no
interpolation); Spearman is Pearson over exact integer midranks
(scaled ×2 so ties stay integral), one fixed double at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.functions import scalar as SC
from movie_data_etl_pipeline_spark.sources import load_table


def ts_rolling_median(spark: SparkSession, sf: str) -> DataFrame:
    """Exact 7-day rolling median of daily order counts: the day-grain
    aggregate (metadata-sized — the gate-sanctioned single-partition
    window domain every ts_* member uses) collects the trailing
    7-element frame, sorts it, and picks the middle — emitted only for
    FULL frames, so the result is an exact integer in both engines (no
    even-count interpolation, no approximate percentile). The robust
    trend line a monitoring pipeline overlays on spiky dailies."""
    o = load_table(spark, sf, "orders")
    days = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    w = Window.orderBy("d").rowsBetween(-6, 0)
    rolled = days.select(
        "d",
        "n",
        F.sort_array(F.collect_list("n").over(w)).alias("frame"),
    ).filter(F.size("frame") == 7)
    return rolled.select(
        "d",
        "n",
        F.element_at("frame", 4).cast("bigint").alias("median7"),
        F.element_at("frame", 1).cast("bigint").alias("min7"),
        F.element_at("frame", 7).cast("bigint").alias("max7"),
    ).orderBy("d")


_TS_ROLLMED_SQL = """
WITH days AS (
  SELECT o_orderdate AS d, COUNT(*)::BIGINT AS n FROM orders GROUP BY 1
),
rolled AS (
  SELECT d, n,
         list_sort(list(n) OVER (ORDER BY d
           ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS frame
  FROM days
)
SELECT d, n,
       CAST(frame[4] AS BIGINT) AS median7,
       CAST(frame[1] AS BIGINT) AS min7,
       CAST(frame[7] AS BIGINT) AS max7
FROM rolled
WHERE len(frame) = 7
ORDER BY d
"""


def ag_spearman(spark: SparkSession, sf: str) -> DataFrame:
    """Spearman rank correlation between daily order volume and daily
    revenue: each series is converted to integer MIDRANKS scaled ×2
    (``2·CntBelow + n_ties + 1`` — ties share an integral midrank, the
    `ml_calibration` prefix discipline at day grain), then Pearson over
    those exact integer ranks via one moment aggregate — the
    rank-based robustness twin of `ag_corr_matrix`, tie-correct where
    `ag_kendall_tau` counts pair concordance."""
    li = load_table(spark, sf, "lineitem")
    days = li.groupBy(F.col("l_shipdate").alias("d")).agg(
        F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("x"),
        F.sum(SC.cents("l_extendedprice")).cast("bigint").alias("y"),
    )

    def midranks(col: str, out: str):
        hist = days.groupBy(F.col(col).alias("v")).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_v")
        )
        w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
        # day grain is metadata-sized: the plain cumulative window is
        # the sanctioned shape here (ts_* family precedent)
        return hist.select(
            F.col("v").alias(col),
            (
                2 * F.coalesce(F.sum("n_v").over(w), F.lit(0))
                + F.col("n_v")
                + 1
            )
            .cast("bigint")
            .alias(out),
        )

    ranked = days.join(midranks("x", "rx"), "x").join(midranks("y", "ry"), "y")
    m = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("rx").cast("bigint").alias("sx"),
        F.sum("ry").cast("bigint").alias("sy"),
        F.sum(F.col("rx") * F.col("rx")).cast("bigint").alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).cast("bigint").alias("syy"),
        F.sum(F.col("rx") * F.col("ry")).cast("bigint").alias("sxy"),
    )
    nn = F.col("n").cast("double")
    cov = F.col("sxy").cast("double") / nn - (F.col("sx").cast("double") / nn) * (
        F.col("sy").cast("double") / nn
    )
    vx = F.col("sxx").cast("double") / nn - (F.col("sx").cast("double") / nn) * (
        F.col("sx").cast("double") / nn
    )
    vy = F.col("syy").cast("double") / nn - (F.col("sy").cast("double") / nn) * (
        F.col("sy").cast("double") / nn
    )
    return m.select(
        "n",
        "sx",
        "sy",
        "sxy",
        (cov / (F.sqrt(vx) * F.sqrt(vy))).alias("spearman_rho"),
    )


_AG_SPEARMAN_SQL = """
WITH days AS (
  SELECT l_shipdate AS d,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS x,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS y
  FROM lineitem GROUP BY 1
),
xh AS (SELECT x AS v, COUNT(*)::BIGINT AS n_v FROM days GROUP BY 1),
xr AS (
  SELECT v AS x,
         CAST(2 * COALESCE(CAST(SUM(n_v) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
           + n_v + 1 AS BIGINT) AS rx
  FROM xh
),
yh AS (SELECT y AS v, COUNT(*)::BIGINT AS n_v FROM days GROUP BY 1),
yr AS (
  SELECT v AS y,
         CAST(2 * COALESCE(CAST(SUM(n_v) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
           + n_v + 1 AS BIGINT) AS ry
  FROM yh
),
ranked AS (
  SELECT rx, ry FROM days JOIN xr USING (x) JOIN yr USING (y)
),
m AS (
  SELECT COUNT(*)::BIGINT AS n,
         CAST(SUM(rx) AS BIGINT) AS sx,
         CAST(SUM(ry) AS BIGINT) AS sy,
         CAST(SUM(rx * rx) AS BIGINT) AS sxx,
         CAST(SUM(ry * ry) AS BIGINT) AS syy,
         CAST(SUM(rx * ry) AS BIGINT) AS sxy
  FROM ranked
)
SELECT n, sx, sy, sxy,
       (CAST(sxy AS DOUBLE) / nn - (CAST(sx AS DOUBLE) / nn) * (CAST(sy AS DOUBLE) / nn))
         / (sqrt(CAST(sxx AS DOUBLE) / nn - (CAST(sx AS DOUBLE) / nn) * (CAST(sx AS DOUBLE) / nn))
            * sqrt(CAST(syy AS DOUBLE) / nn - (CAST(sy AS DOUBLE) / nn) * (CAST(sy AS DOUBLE) / nn)))
         AS spearman_rho
FROM (SELECT *, CAST(n AS DOUBLE) AS nn FROM m)
"""


QUERIES = {
    "ts_rolling_median": ts_rolling_median,
    "ag_spearman": ag_spearman,
}

ORACLES = {
    "ts_rolling_median": _TS_ROLLMED_SQL,
    "ag_spearman": _AG_SPEARMAN_SQL,
}
