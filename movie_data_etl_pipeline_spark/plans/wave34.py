"""Round-4 wave 34: classifier-evaluation metrics — Mann-Whitney AUC,
cumulative-gains deciles, and a Gini decision stump — over a scored
binary outcome built from orders (score = total price in exact cents,
label = order fulfilled). The operators live in ``operators/ml_eval``;
every order-dependent quantity runs through the distributed two-phase
prefix sum, and every metric is a fixed expression over exact int64
counts, so the DuckDB twins (plain window cumsums — fine at oracle
scale) hash-match value-for-value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.operators import ml_eval

# scored-example relation shared by all three metrics: score is the
# order's total price in exact integer cents, label marks fulfilled
# ('F') orders — a deterministic, data-derived binary outcome
_SCORED_SQL = """
scored AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS s,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
  FROM orders
),
hist AS (
  SELECT s, CAST(SUM(y) AS BIGINT) AS p,
         CAST(SUM(1 - y) AS BIGINT) AS m,
         COUNT(*)::BIGINT AS n_s
  FROM scored GROUP BY 1
)
"""


def ml_auc_mw(spark: SparkSession, sf: str) -> DataFrame:
    """Tie-aware AUC via the Mann-Whitney rank-sum identity
    (``ml_eval.auc_from_cum``): 2U accumulated as exact int64 over
    the ascending score histogram's distributed prefix sum; the only
    double is the final ``2U / (2·P·N)`` division. Reads the
    family-shared cached cum relation (``plans/ml_scored``)."""
    from movie_data_etl_pipeline_spark.plans.ml_scored import orders_score_cum

    return ml_eval.auc_from_cum(orders_score_cum(spark, sf))


_ML_AUC_SQL = f"""
WITH {_SCORED_SQL},
cum AS (
  SELECT s, p, m,
         COALESCE(CAST(SUM(m) OVER (ORDER BY s
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
           0) AS cum_m
  FROM hist
)
SELECT CAST(SUM(p) AS BIGINT) AS n_pos,
       CAST(SUM(m) AS BIGINT) AS n_neg,
       CAST(SUM(p * (2 * cum_m + m)) AS BIGINT) AS u2,
       CAST(SUM(p * (2 * cum_m + m)) AS DOUBLE)
         / CAST(2 * CAST(SUM(p) AS BIGINT) * CAST(SUM(m) AS BIGINT) AS DOUBLE)
         AS auc
FROM cum
"""


def ml_gains_deciles(spark: SparkSession, sf: str) -> DataFrame:
    """Cumulative-gains/lift table (``ml_eval.gains_deciles``):
    descending-score equal-population deciles cut by pure value
    arithmetic over the histogram prefix sum — deterministic under
    ties, no global row rank. Shared cached cum relation; the
    descending prefix is derived map-side (n − cum − own)."""
    from movie_data_etl_pipeline_spark.plans.ml_scored import orders_score_cum

    return ml_eval.gains_deciles_from_cum(orders_score_cum(spark, sf), n_bins=10)


_ML_GAINS_SQL = f"""
WITH {_SCORED_SQL},
tot AS (SELECT CAST(SUM(n_s) AS BIGINT) AS n, CAST(SUM(p) AS BIGINT) AS pos FROM hist),
cum AS (
  SELECT s, p, n_s,
         COALESCE(CAST(SUM(n_s) OVER (ORDER BY s DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
           0) AS cum_n_s
  FROM hist
),
binned AS (
  SELECT CAST((10 * cum_n_s) // n AS BIGINT) AS decile,
         CAST(SUM(n_s) AS BIGINT) AS bin_n,
         CAST(SUM(p) AS BIGINT) AS bin_pos,
         MAX(n) AS n, MAX(pos) AS pos
  FROM cum CROSS JOIN tot
  GROUP BY 1
),
walked AS (
  SELECT decile, bin_n, bin_pos, n, pos,
         CAST(SUM(bin_n) OVER (ORDER BY decile
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n,
         CAST(SUM(bin_pos) OVER (ORDER BY decile
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_pos
  FROM binned
)
SELECT decile, bin_n, bin_pos, cum_n, cum_pos,
       CAST(cum_pos AS DOUBLE) / CAST(pos AS DOUBLE) AS capture,
       CAST(cum_pos * n AS DOUBLE) / CAST(cum_n * pos AS DOUBLE) AS lift
FROM walked
ORDER BY decile
"""


def ml_gini_stump(spark: SparkSession, sf: str) -> DataFrame:
    """Decision-stump split search under Gini impurity
    (``ml_eval.gini_stump``): the 9 internal decile boundaries as
    candidate thresholds, each priced by one fixed double expression
    over exact int64 left/right counts; winner = rank 1. Shared cached
    cum relation (``plans/ml_scored``)."""
    from movie_data_etl_pipeline_spark.plans.ml_scored import orders_score_cum

    return ml_eval.gini_stump_from_cum(orders_score_cum(spark, sf), n_bins=10)


_ML_STUMP_SQL = f"""
WITH {_SCORED_SQL},
tot AS (SELECT CAST(SUM(n_s) AS BIGINT) AS n, CAST(SUM(p) AS BIGINT) AS pos FROM hist),
cum AS (
  SELECT s, p, n_s,
         COALESCE(CAST(SUM(n_s) OVER (ORDER BY s
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
           0) AS cum_n_s
  FROM hist
),
per_bin AS (
  SELECT CAST((10 * cum_n_s) // n AS BIGINT) AS bin,
         MAX(s) AS threshold,
         CAST(SUM(n_s) AS BIGINT) AS bin_n,
         CAST(SUM(p) AS BIGINT) AS bin_pos,
         MAX(n) AS n, MAX(pos) AS pos
  FROM cum CROSS JOIN tot
  GROUP BY 1
),
cand AS (
  SELECT threshold, n,
         CAST(SUM(bin_n) OVER (ORDER BY bin
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_l,
         CAST(SUM(bin_pos) OVER (ORDER BY bin
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS p_l,
         n - CAST(SUM(bin_n) OVER (ORDER BY bin
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_r,
         pos - CAST(SUM(bin_pos) OVER (ORDER BY bin
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS p_r
  FROM per_bin
  WHERE bin < 9
),
priced AS (
  SELECT threshold, n_l, p_l, n_r, p_r,
         (CAST(n_l AS DOUBLE)
            - CAST(p_l * p_l + (n_l - p_l) * (n_l - p_l) AS DOUBLE)
              / CAST(n_l AS DOUBLE)
          + CAST(n_r AS DOUBLE)
            - CAST(p_r * p_r + (n_r - p_r) * (n_r - p_r) AS DOUBLE)
              / CAST(n_r AS DOUBLE)
         ) / CAST(n AS DOUBLE) AS imp
  FROM cand
  WHERE n_r > 0
)
SELECT threshold, n_l, p_l, n_r, p_r, imp,
       CAST(row_number() OVER (ORDER BY imp ASC, threshold ASC) AS BIGINT)
         AS pick_rank
FROM priced
ORDER BY pick_rank
"""


QUERIES = {
    "ml_auc_mw": ml_auc_mw,
    "ml_gains_deciles": ml_gains_deciles,
    "ml_gini_stump": ml_gini_stump,
}

ORACLES = {
    "ml_auc_mw": _ML_AUC_SQL,
    "ml_gains_deciles": _ML_GAINS_SQL,
    "ml_gini_stump": _ML_STUMP_SQL,
}
