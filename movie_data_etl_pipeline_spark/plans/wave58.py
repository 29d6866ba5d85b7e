"""Round-4 wave 58: DAU / WAU / MAU stickiness profile.

Determinism contract: all three actives are exact distinct-user
integer counts per day (the `w6_sliding_distinct` bounded window-day
explode, generalized to two horizons in one pass); ratios are fixed
doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.sources import load_table

_MAU_DAYS = 28
_WAU_DAYS = 7


def ev_stickiness(spark: SparkSession, sf: str) -> DataFrame:
    """The product-analytics stickiness board: per day, exact DAU,
    trailing-7-day WAU, trailing-28-day MAU, and the DAU/WAU and
    DAU/MAU ratios. One (user, day) dedup, one bounded 28-way
    window-day explode carrying the day offset, then conditional
    distinct counts per window day — COUNT(DISTINCT) OVER a range
    frame without the unsupported window, every step linear in
    user-days (`w6_sliding_distinct`'s idiom, two horizons in one
    pass). Only full 28-day windows report, so the ratios are
    comparable across the series."""
    ev = (
        load_table(spark, sf, "events")
        .select("user_id", F.to_date("ts").alias("d"))
        .distinct()
    )
    contrib = ev.select(
        "user_id",
        F.col("d"),
        F.explode(F.expr(f"sequence(0, {_MAU_DAYS - 1})")).alias("off"),
    ).select("user_id", F.expr("date_add(d, cast(off as int))").alias("wd"), "off")
    days = ev.select("d").distinct()
    full = (
        days.agg(F.min("d").alias("d0"))
        .crossJoin(days)
        .filter(F.expr(f"datediff(d, d0) >= {_MAU_DAYS - 1}"))
        .select(F.col("d").alias("wd"))
    )
    # PIN the build side: `full` is calendar-bounded (one row per day
    # past the warm-up window) at ANY corpus size, while `contrib` is
    # user-days × 28 — a fact relation. Without the hint, Spark's
    # static size propagation through the distinct-aggregate +
    # explode chain UNDER-estimated contrib and chose BuildLeft on it;
    # at 100x that build side materialized 10.7 GiB and died on the
    # 8 GiB broadcast hard cap (round-8 100x error sweep). Post-agg /
    # post-generate estimates are unreliable in both directions — a
    # bounded⋈fact join must state its bounded side explicitly.
    agg = (
        contrib.join(F.broadcast(full), "wd")
        .groupBy("wd")
        .agg(
            F.count_distinct(F.when(F.col("off") == 0, F.col("user_id")))
            .cast("bigint")
            .alias("dau"),
            F.count_distinct(
                F.when(F.col("off") < _WAU_DAYS, F.col("user_id"))
            )
            .cast("bigint")
            .alias("wau"),
            F.count_distinct("user_id").cast("bigint").alias("mau"),
        )
    )
    return agg.select(
        F.date_format("wd", "yyyy-MM-dd").alias("day"),
        "dau",
        "wau",
        "mau",
        (F.col("dau").cast("double") / F.col("wau").cast("double")).alias("dau_wau"),
        (F.col("dau").cast("double") / F.col("mau").cast("double")).alias("dau_mau"),
    ).orderBy("day")


_EV_STICKINESS_SQL = f"""
WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
contrib AS (
  SELECT user_id, d + CAST(off AS INTEGER) AS wd, off
  FROM ud CROSS JOIN (SELECT unnest(range({_MAU_DAYS})) AS off)
),
days AS (SELECT DISTINCT d FROM ud),
full_days AS (
  SELECT d AS wd FROM days CROSS JOIN (SELECT MIN(d) AS d0 FROM days)
  WHERE date_diff('day', d0, d) >= {_MAU_DAYS - 1}
)
SELECT strftime(wd, '%Y-%m-%d') AS day,
       CAST(COUNT(DISTINCT CASE WHEN off = 0 THEN user_id END) AS BIGINT) AS dau,
       CAST(COUNT(DISTINCT CASE WHEN off < {_WAU_DAYS} THEN user_id END)
            AS BIGINT) AS wau,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS mau,
       CAST(COUNT(DISTINCT CASE WHEN off = 0 THEN user_id END) AS DOUBLE)
         / CAST(COUNT(DISTINCT CASE WHEN off < {_WAU_DAYS} THEN user_id END)
                AS DOUBLE) AS dau_wau,
       CAST(COUNT(DISTINCT CASE WHEN off = 0 THEN user_id END) AS DOUBLE)
         / CAST(COUNT(DISTINCT user_id) AS DOUBLE) AS dau_mau
FROM contrib JOIN full_days USING (wd)
GROUP BY wd
ORDER BY day
"""


QUERIES = {
    "ev_stickiness": ev_stickiness,
}

ORACLES = {
    "ev_stickiness": _EV_STICKINESS_SQL,
}
