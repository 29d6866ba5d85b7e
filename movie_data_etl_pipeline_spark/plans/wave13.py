"""Round-3 wave 13: the BI time-axis closers — calendar-hierarchy
rollup, year-over-year growth, and gaps-and-islands streak detection.

Determinism contract unchanged: cents-integer revenue state, one
final IEEE expression per rendered value, ordered windows only at
calendar or per-user grain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.functions import scalar as SC
from movie_data_etl_pipeline_spark.sources import load_table


# ---------------------------------------------------------------------------
# g4_time_rollup — year → quarter → month hierarchy
# ---------------------------------------------------------------------------


def g4_time_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """ROLLUP over the calendar hierarchy (year → quarter → month):
    monthly revenue with quarterly subtotals, yearly subtotals, and
    the grand total in one pass — the drill-down cube a revenue
    dashboard serves, complementing `g1_rollup`'s categorical axes.
    NULL markers distinguish the levels; map-side partial aggregation
    applies to every grouping set."""
    o = load_table(spark, sf, "orders").select(
        F.year("o_orderdate").cast("bigint").alias("y"),
        F.quarter("o_orderdate").cast("bigint").alias("q"),
        F.month("o_orderdate").cast("bigint").alias("m"),
        SC.cents("o_totalprice").alias("vc"),
    )
    return (
        o.rollup("y", "q", "m")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("vc").alias("rev_c"),
        )
        .orderBy(
            F.asc_nulls_first("y"), F.asc_nulls_first("q"), F.asc_nulls_first("m")
        )
    )


_G4_SQL = """
SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS y,
       CAST(QUARTER(o_orderdate) AS BIGINT) AS q,
       CAST(MONTH(o_orderdate) AS BIGINT) AS m,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_c
FROM orders
GROUP BY ROLLUP (1, 2, 3)
"""


# ---------------------------------------------------------------------------
# w9_yoy_change — year-over-year monthly growth
# ---------------------------------------------------------------------------


def w9_yoy_change(spark: SparkSession, sf: str) -> DataFrame:
    """Monthly revenue with the year-over-year comparison: each month
    against the SAME month one year earlier (lag 12 over the dense
    month series), the seasonality-free growth number a
    month-over-month delta cannot give. The window runs at MONTH
    grain (calendar-bounded); months outside a full trailing year
    report NULL growth."""
    monthly = (
        load_table(spark, sf, "orders")
        .groupBy(F.date_trunc("month", "o_orderdate").alias("mo"))
        .agg(F.sum(SC.cents("o_totalprice")).alias("rev_c"))
    )
    w = Window.orderBy("mo")
    lagged = monthly.select(
        "mo",
        "rev_c",
        F.lag("rev_c", 12).over(w).alias("prev_rev_c"),
        F.lag("mo", 12).over(w).alias("prev_mo"),
    )
    # the ROWS lag is only the true YoY partner when the month series
    # is dense; guard by checking the lagged month is exactly -1 year
    aligned = F.col("prev_mo") == F.add_months(F.col("mo"), -12)
    return lagged.select(
        F.date_format("mo", "yyyy-MM").alias("month"),
        "rev_c",
        F.when(aligned, F.col("prev_rev_c")).alias("prev_rev_c"),
        F.when(
            aligned,
            F.round(
                (F.col("rev_c") - F.col("prev_rev_c"))
                / F.col("prev_rev_c").cast("double"),
                6,
            ),
        ).alias("yoy_growth"),
    ).orderBy("month")


_W9_SQL = """
WITH monthly AS (
  SELECT date_trunc('month', o_orderdate) AS mo,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_c
  FROM orders GROUP BY 1
),
lagged AS (
  SELECT mo, rev_c,
         LAG(rev_c, 12) OVER (ORDER BY mo) AS prev_rev_c,
         LAG(mo, 12) OVER (ORDER BY mo) AS prev_mo
  FROM monthly
)
SELECT strftime(mo, '%Y-%m') AS month,
       rev_c,
       CASE WHEN prev_mo = mo - INTERVAL 12 MONTH THEN prev_rev_c END
         AS prev_rev_c,
       CASE WHEN prev_mo = mo - INTERVAL 12 MONTH
            THEN ROUND(CAST(rev_c - prev_rev_c AS DOUBLE)
                       / CAST(prev_rev_c AS DOUBLE), 6)
       END AS yoy_growth
FROM lagged
"""


# ---------------------------------------------------------------------------
# ev_streaks — gaps-and-islands longest activity streak
# ---------------------------------------------------------------------------


def ev_streaks(spark: SparkSession, sf: str) -> DataFrame:
    """Longest consecutive-day activity streak per user by the
    gaps-and-islands identity: island id = epoch_day − row_number()
    (constant within a run of consecutive days), so streaks fall out
    of one per-user window plus one groupBy — no self-join, no
    recursion. The engagement metric behind 'N-day streak' features;
    `st_sessionize` is its time-gap sibling at event grain.

    Ties (two equal-length streaks) resolve to the EARLIEST start so
    the result is deterministic. All windows per-user
    (key-partitioned); day distinctness bounds per-user state by the
    calendar."""
    ud = (
        load_table(spark, sf, "events")
        .select("user_id", F.to_date("ts").alias("d"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("d")
    isl = ud.select(
        "user_id",
        "d",
        (
            F.datediff(F.col("d"), F.lit("1970-01-01").cast("date"))
            - F.row_number().over(w)
        ).alias("island"),
    )
    streaks = isl.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("len"), F.min("d").alias("start")
    )
    wbest = Window.partitionBy("user_id").orderBy(F.desc("len"), F.asc("start"))
    return (
        streaks.withColumn("rn", F.row_number().over(wbest))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("len").alias("best_streak_days"),
            F.date_format("start", "yyyy-MM-dd").alias("streak_start"),
        )
        .orderBy("user_id")
    )


_EV_STREAKS_SQL = """
WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
isl AS (
  SELECT user_id, d,
         CAST(d - DATE '1970-01-01' AS INTEGER)
           - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS island
  FROM ud
),
streaks AS (
  SELECT user_id, island, COUNT(*) AS len, MIN(d) AS start
  FROM isl GROUP BY 1, 2
),
best AS (
  SELECT user_id, len, start,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY len DESC, start ASC) AS rn
  FROM streaks
)
SELECT user_id, CAST(len AS BIGINT) AS best_streak_days,
       strftime(start, '%Y-%m-%d') AS streak_start
FROM best WHERE rn = 1
"""


QUERIES = {
    "g4_time_rollup": g4_time_rollup,
    "w9_yoy_change": w9_yoy_change,
    "ev_streaks": ev_streaks,
}

ORACLES = {
    "g4_time_rollup": _G4_SQL,
    "w9_yoy_change": _W9_SQL,
    "ev_streaks": _EV_STREAKS_SQL,
}
