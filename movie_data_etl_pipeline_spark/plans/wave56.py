"""Round-4 wave 56: capture–recapture population estimation and the
inter-session gap median.

Determinism contract: capture counts are exact distinct-user integers
(Lincoln–Petersen as one fixed double, Chapman as pure integer
division); the gap median is the exact lower median from the gap
histogram's prefix sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.sources import load_table

_SESSION_GAP_S = 1800


def ag_capture_recapture(spark: SparkSession, sf: str) -> DataFrame:
    """Capture–recapture estimate of the active-user population from
    two independent 'sightings' (click events vs view events, the
    mark-recapture survey pattern): n̂_LP = n₁·n₂/m (Lincoln–Petersen,
    one fixed double) and the bias-corrected Chapman estimator
    ((n₁+1)(n₂+1) div (m+1)) − 1 — PURE INTEGER division, engine-exact.
    Reported against the true distinct-user count the fixture lets us
    observe, so the estimator's bias is itself part of the checked
    output. One scan, three distinct-count aggregates."""
    ev = load_table(spark, sf, "events").select("event_type", "user_id")
    counts = ev.agg(
        F.count_distinct(F.when(F.col("event_type") == "click", F.col("user_id")))
        .cast("bigint")
        .alias("n1"),
        F.count_distinct(F.when(F.col("event_type") == "view", F.col("user_id")))
        .cast("bigint")
        .alias("n2"),
        F.count_distinct(
            F.when(F.col("event_type").isin("click", "view"), F.col("user_id"))
        )
        .cast("bigint")
        .alias("n_union"),
        F.count_distinct("user_id").cast("bigint").alias("n_true"),
    ).withColumn("m", (F.col("n1") + F.col("n2") - F.col("n_union")).cast("bigint"))
    return counts.select(
        "n1",
        "n2",
        "m",
        "n_true",
        (
            (F.col("n1") * F.col("n2")).cast("double") / F.col("m").cast("double")
        ).alias("lincoln_petersen"),
        (
            F.expr("((n1 + 1) * (n2 + 1)) div (m + 1)") - 1
        ).cast("bigint").alias("chapman"),
    )


_AG_CAPTURE_SQL = """
WITH counts AS (
  SELECT CAST(COUNT(DISTINCT CASE WHEN event_type = 'click' THEN user_id END)
              AS BIGINT) AS n1,
         CAST(COUNT(DISTINCT CASE WHEN event_type = 'view' THEN user_id END)
              AS BIGINT) AS n2,
         CAST(COUNT(DISTINCT CASE WHEN event_type IN ('click', 'view')
                                  THEN user_id END) AS BIGINT) AS n_union,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_true
  FROM events
),
m AS (SELECT *, CAST(n1 + n2 - n_union AS BIGINT) AS m FROM counts)
SELECT n1, n2, m, n_true,
       CAST(n1 * n2 AS DOUBLE) / CAST(m AS DOUBLE) AS lincoln_petersen,
       CAST(((n1 + 1) * (n2 + 1)) // (m + 1) - 1 AS BIGINT) AS chapman
FROM m
"""


def ev_session_gap_median(spark: SparkSession, sf: str) -> DataFrame:
    """Exact lower median (plus quartile companions) of the
    BETWEEN-session silence per user — the statistic that justifies
    the 30-minute session gap everyone hardcodes: gaps are the
    second-to-start deltas that EXCEED the session threshold, their
    integer histogram's prefix sums yield exact order statistics (the
    `ag_levene_bf` median idiom, unpartitioned here because the gap
    histogram is value-grain, not fact-grain)."""
    ev = load_table(spark, sf, "events").select(
        "user_id", F.col("ts").cast("long").alias("sec")
    )
    w = Window.partitionBy("user_id").orderBy("sec")
    gaps = (
        ev.withColumn("gap", F.col("sec") - F.lag("sec", 1).over(w))
        .filter(F.col("gap") > _SESSION_GAP_S)
        .select(F.col("gap").cast("bigint").alias("g"))
    )
    hist = gaps.groupBy("g").agg(F.count(F.lit(1)).cast("bigint").alias("n_v"))
    wc = Window.orderBy("g").rowsBetween(Window.unboundedPreceding, -1)
    tot = hist.agg(F.sum("n_v").cast("bigint").alias("n"))
    cum = hist.withColumn("cum", F.coalesce(F.sum("n_v").over(wc), F.lit(0))).join(
        F.broadcast(tot)
    )

    def order_stat(mult: int, div: int, name: str):
        # value at rank ceil(n*mult/div): first g with div*(cum+n_v) >= mult*n
        return (
            cum.filter(
                (div * (F.col("cum") + F.col("n_v")) >= mult * F.col("n"))
                & (div * F.col("cum") < mult * F.col("n"))
            )
            .agg(F.min("g").cast("bigint").alias(name))
        )

    q1 = order_stat(1, 4, "q1_s")
    med = order_stat(1, 2, "median_s")
    q3 = order_stat(3, 4, "q3_s")
    return (
        tot.join(F.broadcast(q1))
        .join(F.broadcast(med))
        .join(F.broadcast(q3))
        .select("n", "q1_s", "median_s", "q3_s")
    )


_EV_GAPMED_SQL = f"""
WITH ev AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events
),
gaps AS (
  SELECT CAST(gap AS BIGINT) AS g FROM (
    SELECT sec - lag(sec) OVER (PARTITION BY user_id ORDER BY sec) AS gap
    FROM ev
  ) WHERE gap > {_SESSION_GAP_S}
),
hist AS (SELECT g, COUNT(*)::BIGINT AS n_v FROM gaps GROUP BY 1),
tot AS (SELECT CAST(SUM(n_v) AS BIGINT) AS n FROM hist),
cum AS (
  SELECT g, n_v,
         COALESCE(CAST(SUM(n_v) OVER (ORDER BY g
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
           AS cum, n
  FROM hist CROSS JOIN tot
),
q1 AS (SELECT CAST(MIN(g) AS BIGINT) AS q1_s FROM cum
       WHERE 4 * (cum + n_v) >= 1 * n AND 4 * cum < 1 * n),
med AS (SELECT CAST(MIN(g) AS BIGINT) AS median_s FROM cum
        WHERE 2 * (cum + n_v) >= 1 * n AND 2 * cum < 1 * n),
q3 AS (SELECT CAST(MIN(g) AS BIGINT) AS q3_s FROM cum
       WHERE 4 * (cum + n_v) >= 3 * n AND 4 * cum < 3 * n)
SELECT n, q1_s, median_s, q3_s
FROM tot CROSS JOIN q1 CROSS JOIN med CROSS JOIN q3
"""


QUERIES = {
    "ag_capture_recapture": ag_capture_recapture,
    "ev_session_gap_median": ev_session_gap_median,
}

ORACLES = {
    "ag_capture_recapture": _AG_CAPTURE_SQL,
    "ev_session_gap_median": _EV_GAPMED_SQL,
}
