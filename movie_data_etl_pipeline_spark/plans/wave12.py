"""Round-3 wave 12: forecasting backtest, DAU growth accounting,
freshness monitoring, and content-addressed multimodal dedup — the
operations layer a pipeline runs every morning.

Determinism contract unchanged: exact integer state for every
cross-row reduction; single-IEEE-expression renders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.operators import multimodal
from movie_data_etl_pipeline_spark.sources import load_table


# ---------------------------------------------------------------------------
# ts_forecast_backtest — seasonal-naive forecast with exact errors
# ---------------------------------------------------------------------------

_FC_HORIZON = 7


def ts_forecast_backtest(spark: SparkSession, sf: str) -> DataFrame:
    """Backtest of the weekday-mean seasonal-naive forecast: hold out
    the last 7 days, forecast each as the mean of the SAME weekday's
    training counts, report per-day actual / forecast / absolute
    error / APE — the baseline every fancier forecaster must beat,
    and the daily sanity loop `qa_volume_anomaly` alerts feed on.

    Exactness: the forecast is the integer fraction s_wd/n_wd; the
    absolute error is |actual·n_wd − s_wd| / n_wd — integer numerator,
    one division. The train/test cutoff comes from a 1-row max-date
    broadcast; weekday key = epoch-day mod 7 (no locale DOW). All
    ordered state at DAY grain."""
    daily = (
        load_table(spark, sf, "events")
        .select(F.to_date("ts").alias("d"))
        .groupBy("d")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "wd", F.datediff(F.col("d"), F.lit("1970-01-01").cast("date")) % 7
        )
    )
    maxd = daily.agg(F.max("d").alias("maxd"))
    tagged = daily.crossJoin(F.broadcast(maxd)).withColumn(
        "is_test", F.datediff(F.col("maxd"), F.col("d")) < _FC_HORIZON
    )
    wdmean = (
        tagged.filter(~F.col("is_test"))
        .groupBy("wd")
        .agg(F.sum("cnt").alias("s"), F.count(F.lit(1)).alias("n"))
    )
    ae_num = F.abs(F.col("cnt") * F.col("n") - F.col("s"))
    return (
        tagged.filter(F.col("is_test"))
        .join(F.broadcast(wdmean), "wd")
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.col("cnt").alias("actual"),
            F.round(F.col("s") / F.col("n").cast("double"), 4).alias("forecast"),
            F.round(ae_num / F.col("n").cast("double"), 4).alias("abs_err"),
            F.round(
                ae_num / (F.col("n") * F.col("cnt")).cast("double"), 6
            ).alias("ape"),
        )
        .orderBy("day")
    )


_TS_FC_SQL = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, COUNT(*) AS cnt,
         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS INTEGER) % 7 AS wd
  FROM events GROUP BY 1, 3
),
mx AS (SELECT MAX(d) AS maxd FROM daily),
tagged AS (
  SELECT daily.*, (maxd - d < {_FC_HORIZON}) AS is_test FROM daily, mx
),
wdmean AS (
  SELECT wd, CAST(SUM(cnt) AS BIGINT) AS s, COUNT(*) AS n
  FROM tagged WHERE NOT is_test GROUP BY 1
)
SELECT strftime(t.d, '%Y-%m-%d') AS day,
       t.cnt AS actual,
       ROUND(CAST(w.s AS DOUBLE) / w.n, 4) AS forecast,
       ROUND(CAST(ABS(t.cnt * w.n - w.s) AS DOUBLE) / w.n, 4) AS abs_err,
       ROUND(CAST(ABS(t.cnt * w.n - w.s) AS DOUBLE) / (w.n * t.cnt), 6) AS ape
FROM tagged t JOIN wdmean w USING (wd)
WHERE t.is_test
"""


# ---------------------------------------------------------------------------
# ev_growth_accounting — new / retained / resurrected / churned
# ---------------------------------------------------------------------------


def ev_growth_accounting(spark: SparkSession, sf: str) -> DataFrame:
    """Weekly growth accounting of the active-user base: per week,
    how many actives are NEW (first week ever), RETAINED (active last
    week too), RESURRECTED (active before, but not last week), and
    how many of last week's actives CHURNED (absent this week) — the
    standard DAU/WAU decomposition (new + retained + resurrected −
    churned = net change) that `ev_cohort_retention` summarizes only
    diagonally.

    One distinct (user, week) relation; classification is a per-user
    lag window (key-partitioned); churn contributes to week+1 via a
    lead window on the same exchange. Week key = epoch-day DIV 7."""
    uw = (
        load_table(spark, sf, "events")
        .select(
            "user_id",
            F.expr(
                "datediff(to_date(ts), to_date('1970-01-01')) DIV 7"
            ).alias("wk"),
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("wk")
    tagged = uw.select(
        "user_id",
        "wk",
        F.lag("wk").over(w).alias("prev"),
        F.lead("wk").over(w).alias("nxt"),
    )
    status = tagged.select(
        "wk",
        F.when(F.col("prev").isNull(), F.lit("new"))
        .when(F.col("prev") == F.col("wk") - 1, F.lit("retained"))
        .otherwise(F.lit("resurrected"))
        .alias("st"),
    )
    active = status.groupBy("wk").agg(
        F.sum((F.col("st") == "new").cast("bigint")).alias("n_new"),
        F.sum((F.col("st") == "retained").cast("bigint")).alias("n_retained"),
        F.sum((F.col("st") == "resurrected").cast("bigint")).alias("n_resurrected"),
    )
    maxwk = uw.agg(F.max("wk").alias("maxwk"))
    churn = (
        tagged.filter(F.col("nxt").isNull() | (F.col("nxt") > F.col("wk") + 1))
        .select((F.col("wk") + 1).alias("wk"))
        .crossJoin(F.broadcast(maxwk))
        .filter(F.col("wk") <= F.col("maxwk"))
        .groupBy("wk")
        .agg(F.count(F.lit(1)).alias("n_churned"))
    )
    return (
        active.join(churn, "wk", "full_outer")
        .select(
            F.col("wk").cast("bigint").alias("week"),
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
            F.coalesce("n_retained", F.lit(0)).alias("n_retained"),
            F.coalesce("n_resurrected", F.lit(0)).alias("n_resurrected"),
            F.coalesce("n_churned", F.lit(0)).alias("n_churned"),
        )
        .orderBy("week")
    )


_EV_GROWTH_SQL = """
WITH uw AS (
  SELECT DISTINCT user_id,
         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS INTEGER) // 7 AS wk
  FROM events
),
tagged AS (
  SELECT user_id, wk,
         LAG(wk) OVER (PARTITION BY user_id ORDER BY wk) AS prev,
         LEAD(wk) OVER (PARTITION BY user_id ORDER BY wk) AS nxt
  FROM uw
),
active AS (
  SELECT wk,
         CAST(SUM(CASE WHEN prev IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
         CAST(SUM(CASE WHEN prev = wk - 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
         CAST(SUM(CASE WHEN prev IS NOT NULL AND prev < wk - 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_resurrected
  FROM tagged GROUP BY wk
),
mx AS (SELECT MAX(wk) AS maxwk FROM uw),
churn AS (
  SELECT t.wk + 1 AS wk, COUNT(*) AS n_churned
  FROM tagged t, mx
  WHERE (t.nxt IS NULL OR t.nxt > t.wk + 1) AND t.wk + 1 <= mx.maxwk
  GROUP BY t.wk + 1
)
SELECT CAST(COALESCE(a.wk, c.wk) AS BIGINT) AS week,
       COALESCE(a.n_new, 0) AS n_new,
       COALESCE(a.n_retained, 0) AS n_retained,
       COALESCE(a.n_resurrected, 0) AS n_resurrected,
       COALESCE(c.n_churned, 0) AS n_churned
FROM active a FULL OUTER JOIN churn c ON a.wk = c.wk
"""


# ---------------------------------------------------------------------------
# qa_freshness — per-source staleness monitor
# ---------------------------------------------------------------------------

_FRESH_SLA_S = 3600


def qa_freshness(spark: SparkSession, sf: str) -> DataFrame:
    """Per-event-type freshness against the pipeline's own high-water
    mark: lag = global max(ts) − type max(ts) in whole seconds,
    flagged when beyond a 1-hour SLA — the first page of every
    ingestion dashboard (a silent dead producer shows up here before
    any volume alert fires). One aggregation + a 1-row broadcast."""
    ev = load_table(spark, sf, "events").select("event_type", "ts")
    per = ev.groupBy("event_type").agg(F.max("ts").alias("tmax"))
    g = ev.agg(F.max("ts").alias("gmax"))
    lag_s = F.expr("(unix_micros(gmax) - unix_micros(tmax)) DIV 1000000")
    return (
        per.crossJoin(F.broadcast(g))
        .select(
            "event_type",
            F.date_format("tmax", "yyyy-MM-dd HH:mm:ss").alias("last_seen"),
            lag_s.alias("lag_s"),
            (lag_s > _FRESH_SLA_S).cast("int").alias("is_stale"),
        )
        .orderBy("event_type")
    )


_QA_FRESH_SQL = f"""
WITH per AS (SELECT event_type, MAX(ts) AS tmax FROM events GROUP BY 1),
g AS (SELECT MAX(ts) AS gmax FROM events)
SELECT event_type,
       strftime(tmax, '%Y-%m-%d %H:%M:%S') AS last_seen,
       (epoch_us(gmax) - epoch_us(tmax)) // 1000000 AS lag_s,
       CAST((epoch_us(gmax) - epoch_us(tmax)) // 1000000 > {_FRESH_SLA_S}
            AS INTEGER) AS is_stale
FROM per, g
"""


# ---------------------------------------------------------------------------
# mm_content_dedup — content-addressed asset dedup
# ---------------------------------------------------------------------------


def mm_content_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Content-addressed dedup of the multimodal asset store: group
    payloads by sha-256 digest and report copies vs unique content
    and the bytes a CAS layout saves — the first dedup every
    image/audio pipeline runs (byte-identical re-uploads dominate
    before any perceptual matching starts; the near-dup stage is
    `sim_embedding_near_dup` on the decoded features).

    One digest aggregation (map-side combinable) then a digest-grain
    summary; payload bytes never shuffle — only (digest, size)
    pairs."""
    assets = multimodal.synthesize_assets(load_table(spark, sf, "documents"))
    g = (
        assets.select(
            F.sha2(F.col("payload"), 256).alias("dig"),
            F.col("meta.size_bytes").alias("sz"),
        )
        .groupBy("dig")
        .agg(F.count(F.lit(1)).alias("n"), F.max("sz").alias("sz"))
    )
    return g.agg(
        F.sum("n").alias("n_assets"),
        F.count(F.lit(1)).alias("n_unique"),
        F.sum((F.col("n") > 1).cast("bigint")).alias("dup_groups"),
        F.sum(F.col("n") - 1).alias("extra_copies"),
        F.sum(F.col("n") * F.col("sz")).alias("bytes_total"),
        F.sum("sz").alias("bytes_stored"),
    ).select(
        "n_assets",
        "n_unique",
        "dup_groups",
        "extra_copies",
        "bytes_total",
        "bytes_stored",
        F.round(
            (F.col("bytes_total") - F.col("bytes_stored"))
            / F.col("bytes_total").cast("double"),
            6,
        ).alias("savings_ratio"),
    )


_MM_CAS_SQL = """
WITH g AS (
  SELECT sha256(text) AS dig, COUNT(*) AS n,
         MAX(octet_length(encode(text))) AS sz
  FROM documents GROUP BY 1
)
SELECT CAST(SUM(n) AS BIGINT) AS n_assets,
       CAST(COUNT(*) AS BIGINT) AS n_unique,
       CAST(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_groups,
       CAST(SUM(n - 1) AS BIGINT) AS extra_copies,
       CAST(SUM(n * sz) AS BIGINT) AS bytes_total,
       CAST(SUM(sz) AS BIGINT) AS bytes_stored,
       ROUND(CAST(SUM(n * sz) - SUM(sz) AS DOUBLE)
             / CAST(SUM(n * sz) AS DOUBLE), 6) AS savings_ratio
FROM g
"""


QUERIES = {
    "ts_forecast_backtest": ts_forecast_backtest,
    "ev_growth_accounting": ev_growth_accounting,
    "qa_freshness": qa_freshness,
    "mm_content_dedup": mm_content_dedup,
}

ORACLES = {
    "ts_forecast_backtest": _TS_FC_SQL,
    "ev_growth_accounting": _EV_GROWTH_SQL,
    "qa_freshness": _QA_FRESH_SQL,
    "mm_content_dedup": _MM_CAS_SQL,
}
