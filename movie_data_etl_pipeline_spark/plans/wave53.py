"""Round-4 wave 53: binary-segmentation changepoint detection and a
sweep-line session-concurrency profile.

Determinism contract: the changepoint's per-candidate gain is a fixed
double over exact integer prefix sums (identical in both engines, so
the argmax row is identical; ties break on the day); the concurrency
sweep is pure integer ±1 deltas under a total (second) order with the
distributed prefix sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.operators import ml_eval
from movie_data_etl_pipeline_spark.sources import load_table

_SESSION_GAP_S = 1800


def ts_changepoint_binseg(spark: SparkSession, sf: str) -> DataFrame:
    """Single-changepoint detection by binary segmentation on the
    daily-revenue series (whole dollars): for every candidate split t,
    the variance-reduction gain nₗ·nᵣ/n·(ȳₗ−ȳᵣ)² comes from exact
    integer prefix sums (day grain — the sanctioned ts_* window
    domain); the argmax row wins with a day tiebreak. The level-shift
    locator CUSUM only hints at; segment means and the gain are fixed
    doubles, so both engines pick the same split."""
    li = load_table(spark, sf, "lineitem")
    days = li.groupBy(F.col("l_shipdate").alias("d")).agg(
        F.sum(F.floor(F.col("l_extendedprice")).cast("bigint"))
        .cast("bigint")
        .alias("y")
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    cum = days.select(
        "d",
        "y",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_l"),
        F.sum("y").over(w).cast("bigint").alias("sy_l"),
    )
    tot = days.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("sy"),
    )
    cand = cum.join(F.broadcast(tot)).filter(F.col("n_l") < F.col("n"))
    nl = F.col("n_l").cast("double")
    nr = (F.col("n") - F.col("n_l")).cast("double")
    ml = F.col("sy_l").cast("double") / nl
    mr = (F.col("sy") - F.col("sy_l")).cast("double") / nr
    gain = nl * nr / F.col("n").cast("double") * (ml - mr) * (ml - mr)
    return (
        cand.select(
            F.col("d").alias("split_day"),
            F.col("n_l"),
            (F.col("n") - F.col("n_l")).cast("bigint").alias("n_r"),
            ml.alias("mean_left"),
            mr.alias("mean_right"),
            gain.alias("gain"),
        )
        .orderBy(F.desc("gain"), F.asc("split_day"))
        .limit(1)
    )


_TS_BINSEG_SQL = """
WITH days AS (
  SELECT l_shipdate AS d,
         CAST(SUM(CAST(FLOOR(l_extendedprice) AS BIGINT)) AS BIGINT) AS y
  FROM lineitem GROUP BY 1
),
cum AS (
  SELECT d, y,
         CAST(COUNT(*) OVER (ORDER BY d
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_l,
         CAST(SUM(y) OVER (ORDER BY d
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sy_l
  FROM days
),
tot AS (SELECT COUNT(*)::BIGINT AS n, CAST(SUM(y) AS BIGINT) AS sy FROM days)
SELECT d AS split_day, n_l, CAST(n - n_l AS BIGINT) AS n_r,
       CAST(sy_l AS DOUBLE) / CAST(n_l AS DOUBLE) AS mean_left,
       CAST(sy - sy_l AS DOUBLE) / CAST(n - n_l AS DOUBLE) AS mean_right,
       CAST(n_l AS DOUBLE) * CAST(n - n_l AS DOUBLE) / CAST(n AS DOUBLE)
         * (CAST(sy_l AS DOUBLE) / CAST(n_l AS DOUBLE)
            - CAST(sy - sy_l AS DOUBLE) / CAST(n - n_l AS DOUBLE))
         * (CAST(sy_l AS DOUBLE) / CAST(n_l AS DOUBLE)
            - CAST(sy - sy_l AS DOUBLE) / CAST(n - n_l AS DOUBLE)) AS gain
FROM cum CROSS JOIN tot
WHERE n_l < n
ORDER BY gain DESC, split_day
LIMIT 1
"""


def ev_concurrency_sweep(spark: SparkSession, sf: str) -> DataFrame:
    """Concurrent-session profile by sweep line: 30-min-gap sessions
    (the `ev_batch_sessions` rule) become ±1 deltas at start and
    end+1 seconds; deltas aggregate per distinct second, the running
    concurrency is the DISTRIBUTED exclusive prefix sum over second
    order (never a single global window over raw events), and each
    day reports its peak and closing concurrency — capacity planning's
    core query. All exact integers."""
    ev = load_table(spark, sf, "events").select(
        "user_id", F.col("ts").cast("long").alias("sec")
    )
    w = Window.partitionBy("user_id").orderBy("sec")
    brk = F.when(
        F.col("sec") - F.lag("sec", 1).over(w) > _SESSION_GAP_S, 1
    ).otherwise(0)
    sess = (
        ev.withColumn(
            "session_no", F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0))
        )
        .groupBy("user_id", "session_no")
        .agg(F.min("sec").alias("start"), F.max("sec").alias("end"))
    )
    deltas = sess.select(
        F.col("start").alias("t"), F.lit(1).cast("bigint").alias("delta")
    ).unionByName(
        sess.select((F.col("end") + 1).alias("t"), F.lit(-1).cast("bigint").alias("delta"))
    )
    per_sec = deltas.groupBy("t").agg(F.sum("delta").cast("bigint").alias("delta"))
    cum = ml_eval.with_exclusive_prefix(per_sec, "t", ["delta"])
    running = cum.select(
        "t", (F.col("cum_delta") + F.col("delta")).cast("bigint").alias("active")
    )
    return (
        running.groupBy(F.expr("t div 86400").cast("bigint").alias("epoch_day"))
        .agg(
            F.max("active").cast("bigint").alias("peak_concurrency"),
            F.max_by("active", "t").cast("bigint").alias("closing_concurrency"),
            F.count(F.lit(1)).cast("bigint").alias("n_transitions"),
        )
        .orderBy("epoch_day")
    )


_EV_SWEEP_SQL = f"""
WITH ev AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events
),
lagged AS (
  SELECT user_id, sec,
         CASE WHEN sec - lag(sec) OVER (PARTITION BY user_id ORDER BY sec)
                   > {_SESSION_GAP_S}
              THEN 1 ELSE 0 END AS brk
  FROM ev
),
sess AS (
  SELECT user_id,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY sec
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no,
         sec
  FROM lagged
),
iv AS (
  SELECT user_id, session_no, MIN(sec) AS start, MAX(sec) AS "end"
  FROM sess GROUP BY 1, 2
),
deltas AS (
  SELECT start AS t, CAST(1 AS BIGINT) AS delta FROM iv
  UNION ALL
  SELECT "end" + 1, CAST(-1 AS BIGINT) FROM iv
),
per_sec AS (
  SELECT t, CAST(SUM(delta) AS BIGINT) AS delta FROM deltas GROUP BY 1
),
running AS (
  SELECT t,
         CAST(SUM(delta) OVER (ORDER BY t
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS active
  FROM per_sec
)
SELECT CAST(t // 86400 AS BIGINT) AS epoch_day,
       CAST(MAX(active) AS BIGINT) AS peak_concurrency,
       CAST(max_by(active, t) AS BIGINT) AS closing_concurrency,
       COUNT(*)::BIGINT AS n_transitions
FROM running
GROUP BY 1
ORDER BY 1
"""


QUERIES = {
    "ts_changepoint_binseg": ts_changepoint_binseg,
    "ev_concurrency_sweep": ev_concurrency_sweep,
}

ORACLES = {
    "ts_changepoint_binseg": _TS_BINSEG_SQL,
    "ev_concurrency_sweep": _EV_SWEEP_SQL,
}
