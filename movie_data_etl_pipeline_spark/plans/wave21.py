"""Round-3 wave 21: interrupted time-series analysis, a
round-number-bias forensic screen, and the Fano overdispersion
factor — the final causal/forensic closers.

Determinism contract unchanged: exact decimal moment sums, one final
IEEE expression per value (the `stats.ols_by_group` discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.functions import scalar as SC
from movie_data_etl_pipeline_spark.operators import stats
from movie_data_etl_pipeline_spark.sources import load_table


# ---------------------------------------------------------------------------
# ts_intervention_impact — interrupted time-series (segmented OLS)
# ---------------------------------------------------------------------------

_ITS_CUTOFF = "1998-01-01"


def ts_intervention_impact(spark: SparkSession, sf: str) -> DataFrame:
    """Interrupted time-series analysis of daily revenue around the
    1998-01-01 cutoff: independent OLS fits of the pre and post
    segments (exact integer moment sums via `stats.ols_by_group`),
    then the LEVEL change (post intercept at the cutoff minus the
    pre fit's projection onto it) and the SLOPE change — the
    no-control-group causal design next to `ag_did` (which needs a
    control arm this design does without, at the price of the
    no-coincident-shock assumption).

    Day grain throughout; x is centered AT THE CUTOFF so both
    intercepts mean 'fitted value at the intervention' and the level
    change is their plain difference."""
    cutoff = F.lit(_ITS_CUTOFF).cast("date")
    daily = (
        load_table(spark, sf, "orders")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.sum(SC.cents("o_totalprice")).alias("y"))
        .select(
            F.when(F.col("d") < cutoff, "pre").otherwise("post").alias("segment"),
            F.datediff(F.col("d"), cutoff).cast("bigint").alias("x"),
            "y",
        )
    )
    fits = stats.ols_by_group(daily, ["segment"], "x", "y")
    pre = fits.filter(F.col("segment") == "pre").select(
        F.col("n").alias("n_pre"),
        F.col("slope").alias("slope_pre"),
        F.col("intercept").alias("icpt_pre"),
    )
    post = fits.filter(F.col("segment") == "post").select(
        F.col("n").alias("n_post"),
        F.col("slope").alias("slope_post"),
        F.col("intercept").alias("icpt_post"),
    )
    return pre.crossJoin(post).select(
        "n_pre",
        "n_post",
        "slope_pre",
        "slope_post",
        F.round(F.col("slope_post") - F.col("slope_pre"), 6).alias("slope_change"),
        F.round(F.col("icpt_post") - F.col("icpt_pre"), 6).alias("level_change_c"),
    )


_TS_ITS_SQL = f"""
WITH daily AS (
  SELECT CASE WHEN CAST(o_orderdate AS DATE) < DATE '{_ITS_CUTOFF}'
              THEN 'pre' ELSE 'post' END AS segment,
         CAST(CAST(o_orderdate AS DATE) - DATE '{_ITS_CUTOFF}' AS BIGINT) AS x,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
  FROM orders
  GROUP BY 1, 2
),
m AS (
  SELECT segment, COUNT(*) AS n,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(x * y) AS sxy
  FROM daily GROUP BY 1
),
fits AS (
  SELECT segment, CAST(n AS BIGINT) AS n,
         ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
               / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope,
         ROUND(CAST(sy * sxx - sx * sxy AS DOUBLE)
               / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS icpt
  FROM m
)
SELECT pre.n AS n_pre, post.n AS n_post,
       pre.slope AS slope_pre, post.slope AS slope_post,
       ROUND(post.slope - pre.slope, 6) AS slope_change,
       ROUND(post.icpt - pre.icpt, 6) AS level_change_c
FROM (SELECT * FROM fits WHERE segment = 'pre') pre,
     (SELECT * FROM fits WHERE segment = 'post') post
"""


# ---------------------------------------------------------------------------
# qa_round_number_bias — forensic rounding screen
# ---------------------------------------------------------------------------


def qa_round_number_bias(spark: SparkSession, sf: str) -> DataFrame:
    """Round-number bias screen per priority: the share of order
    values landing on whole dollars (cents ≡ 0 mod 100) against the
    1% a continuous price distribution implies — excess mass at
    round numbers is the classic manual-entry / estimated-figure /
    fabrication tell (`qa_benford`'s sibling on the LOW digits).
    Integer cross-multiplied verdict: flag iff 100·hits > 3·n (3×
    the expected rate); one conditional aggregation."""
    o = load_table(spark, sf, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        (SC.cents("o_totalprice") % 100 == 0).alias("round_dollar"),
    )
    return (
        o.groupBy("priority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("round_dollar").cast("bigint")).alias("round_hits"),
        )
        .select(
            "priority",
            "n",
            "round_hits",
            F.round(F.col("round_hits") / F.col("n").cast("double"), 6).alias(
                "round_share"
            ),
            (100 * F.col("round_hits") > 3 * F.col("n")).cast("int").alias(
                "biased"
            ),
        )
        .orderBy("priority")
    )


_QA_ROUND_SQL = """
SELECT o_orderpriority AS priority,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN CAST(ROUND(o_totalprice * 100) AS BIGINT) % 100 = 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS round_hits,
       ROUND(CAST(SUM(CASE WHEN CAST(ROUND(o_totalprice * 100) AS BIGINT) % 100 = 0
                           THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS round_share,
       CAST(100 * SUM(CASE WHEN CAST(ROUND(o_totalprice * 100) AS BIGINT) % 100 = 0
                           THEN 1 ELSE 0 END) > 3 * COUNT(*) AS INTEGER) AS biased
FROM orders
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# ts_fano_factor — overdispersion of daily arrivals
# ---------------------------------------------------------------------------


def ts_fano_factor(spark: SparkSession, sf: str) -> DataFrame:
    """Fano factor (variance/mean of daily counts) per event type —
    the overdispersion index that says whether arrivals are
    Poisson-like (F ≈ 1, `sa_bootstrap_ci`'s resampling assumption),
    bursty (F > 1, expect `ev_debounce` to bite), or suspiciously
    regular (F < 1, a scheduler or synthetic load). Exact integer
    moments at day grain; population variance; one division at
    render."""
    daily = (
        load_table(spark, sf, "events")
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("c").alias("s"),
        F.sum(dec("c") * F.col("c")).alias("ss"),
    )
    n = F.col("n_days").cast("double")
    mean = F.col("s").cast("double") / n
    var = (n * F.col("ss").cast("double") - F.col("s").cast("double") * F.col("s").cast("double")) / (n * n)
    return m.select(
        "event_type",
        "n_days",
        F.round(mean, 6).alias("mean_per_day"),
        F.round(var / mean, 6).alias("fano"),
    ).orderBy("event_type")


_TS_FANO_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS c
  FROM events GROUP BY 1, 2
),
m AS (
  SELECT event_type, COUNT(*) AS n_days,
         CAST(SUM(c) AS BIGINT) AS s, SUM(c * c) AS ss
  FROM daily GROUP BY 1
)
SELECT event_type,
       CAST(n_days AS BIGINT) AS n_days,
       ROUND(CAST(s AS DOUBLE) / n_days, 6) AS mean_per_day,
       ROUND(((n_days * CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
              / (CAST(n_days AS DOUBLE) * n_days))
             / (CAST(s AS DOUBLE) / n_days), 6) AS fano
FROM m
"""


QUERIES = {
    "ts_intervention_impact": ts_intervention_impact,
    "qa_round_number_bias": qa_round_number_bias,
    "ts_fano_factor": ts_fano_factor,
}

ORACLES = {
    "ts_intervention_impact": _TS_ITS_SQL,
    "qa_round_number_bias": _QA_ROUND_SQL,
    "ts_fano_factor": _TS_FANO_SQL,
}
