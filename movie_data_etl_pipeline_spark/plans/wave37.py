"""Round-4 wave 37: market-basket association rules, probability
calibration (reliability bins + Brier decomposition), and the
bitwise / bit-aggregate function surfaces.

Determinism contract: rule metrics and calibration statistics are
fixed double expressions over exact int64 counts (the midrank
percentile p-hat is a pure integer division in both engines); the
bitwise probes compare engine built-ins value-for-value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.functions import scalar as SC
from movie_data_etl_pipeline_spark.operators import ml_eval
from movie_data_etl_pipeline_spark.plans.wave36 import (
    _CF_MAX_BASKET,
    _CF_MIN_SUPPORT,
    _cf_pair_counts,
)
from movie_data_etl_pipeline_spark.sources import load_table

_AR_TOP = 100


def rc_assoc_rules(spark: SparkSession, sf: str) -> DataFrame:
    """Association rules over co-purchase baskets (the Apriori 2-itemset
    stage): the same capped basket relation as ``rc_item_item_cf``,
    aggregated to pair counts, then each surviving pair emits BOTH
    directed rules a→b and b→a with support = n_ab/N, confidence =
    n_ab/n_ante, lift = N·n_ab/(n_a·n_b) — all fixed double expressions
    over exact int64 counts (lift is symmetric, so ties are broken by
    confidence then keys). Top-100 via distributed
    TakeOrderedAndProject, never a global window. At 100 TB: one
    shuffle on customer, one on the pruned pair key, one top-k merge.
    The frequent-1-itemset prune (``_cf_baskets``) drops items below
    ``_CF_MIN_SUPPORT`` before the per-customer self-join; support /
    confidence / lift denominators still run over the UNpruned
    relation, so every reported number is unchanged."""
    kept, item_n, pairs = _cf_pair_counts(spark, sf)
    n_baskets = kept.agg(
        F.count_distinct(F.col("c")).cast("bigint").alias("n_baskets")
    )
    sized = (
        pairs.join(item_n.select(F.col("p").alias("pa"), F.col("n_item").alias("n_a")), "pa")
        .join(item_n.select(F.col("p").alias("pb"), F.col("n_item").alias("n_b")), "pb")
        .join(F.broadcast(n_baskets))
    )
    fwd = sized.select(
        F.col("pa").alias("antecedent"),
        F.col("pb").alias("consequent"),
        "n_ab",
        F.col("n_a").alias("n_ante"),
        F.col("n_b").alias("n_cons"),
        "n_baskets",
    )
    rev = sized.select(
        F.col("pb").alias("antecedent"),
        F.col("pa").alias("consequent"),
        "n_ab",
        F.col("n_b").alias("n_ante"),
        F.col("n_a").alias("n_cons"),
        "n_baskets",
    )
    rules = fwd.unionByName(rev).select(
        "antecedent",
        "consequent",
        "n_ab",
        "n_ante",
        "n_cons",
        (F.col("n_ab").cast("double") / F.col("n_baskets").cast("double")).alias(
            "support"
        ),
        (F.col("n_ab").cast("double") / F.col("n_ante").cast("double")).alias(
            "confidence"
        ),
        (
            (F.col("n_baskets") * F.col("n_ab")).cast("double")
            / (F.col("n_ante") * F.col("n_cons")).cast("double")
        ).alias("lift"),
    )
    return rules.orderBy(
        F.desc("lift"), F.desc("confidence"), F.asc("antecedent"), F.asc("consequent")
    ).limit(_AR_TOP)


_RC_AR_SQL = f"""
WITH baskets AS (
  SELECT DISTINCT o_custkey AS c, l_partkey AS p
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
kept AS (
  SELECT c, p FROM baskets
  WHERE c IN (SELECT c FROM baskets GROUP BY c HAVING COUNT(*) <= {_CF_MAX_BASKET})
),
tot AS (SELECT CAST(COUNT(DISTINCT c) AS BIGINT) AS n_baskets FROM kept),
item_n AS (SELECT p, COUNT(*)::BIGINT AS n_item FROM kept GROUP BY 1),
pruned AS (
  SELECT c, p FROM kept
  WHERE p IN (SELECT p FROM item_n WHERE n_item >= {_CF_MIN_SUPPORT})
),
pairs AS (
  SELECT a.p AS pa, b.p AS pb, COUNT(*)::BIGINT AS n_ab
  FROM pruned a JOIN pruned b ON a.c = b.c AND a.p < b.p
  GROUP BY 1, 2 HAVING COUNT(*) >= {_CF_MIN_SUPPORT}
),
sized AS (
  SELECT pa, pb, n_ab, na.n_item AS n_a, nb.n_item AS n_b, n_baskets
  FROM pairs
  JOIN item_n na ON na.p = pa
  JOIN item_n nb ON nb.p = pb
  CROSS JOIN tot
),
rules AS (
  SELECT pa AS antecedent, pb AS consequent, n_ab,
         n_a AS n_ante, n_b AS n_cons, n_baskets FROM sized
  UNION ALL
  SELECT pb, pa, n_ab, n_b, n_a, n_baskets FROM sized
)
SELECT antecedent, consequent, n_ab, n_ante, n_cons,
       CAST(n_ab AS DOUBLE) / CAST(n_baskets AS DOUBLE) AS support,
       CAST(n_ab AS DOUBLE) / CAST(n_ante AS DOUBLE) AS confidence,
       CAST(n_baskets * n_ab AS DOUBLE) / CAST(n_ante * n_cons AS DOUBLE) AS lift
FROM rules
ORDER BY lift DESC, confidence DESC, antecedent, consequent
LIMIT {_AR_TOP}
"""


def ml_calibration(spark: SparkSession, sf: str) -> DataFrame:
    """Reliability table for the wave-34 scored relation (score =
    order total in exact cents, label = fulfilled): predicted
    probability is the score's own midrank percentile (an exact
    integer p̂ ∈ [0,10000] from the distributed prefix sum), cut into
    10 equal-width bins with per-bin mean p̂, empirical positive rate,
    and exact-int64 Brier sums (``ml_eval.calibration_bins_from_cum``
    over the family-shared cached cum relation)."""
    from movie_data_etl_pipeline_spark.plans.ml_scored import orders_score_cum

    return ml_eval.calibration_bins_from_cum(
        orders_score_cum(spark, sf), n_bins=10, scale=10_000
    )


_ML_CAL_SQL = """
WITH scored AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS s,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
  FROM orders
),
hist AS (
  SELECT s, CAST(SUM(y) AS BIGINT) AS p,
         CAST(SUM(1 - y) AS BIGINT) AS m,
         COUNT(*)::BIGINT AS n_s
  FROM scored GROUP BY 1
),
cum AS (
  SELECT s, p, m, n_s,
         COALESCE(CAST(SUM(n_s) OVER (ORDER BY s
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
           0) AS cum_n_s
  FROM hist
),
tot AS (SELECT CAST(SUM(n_s) AS BIGINT) AS n FROM hist),
ph AS (
  SELECT p, m, n_s,
         (10000 * (2 * cum_n_s + n_s)) // (2 * n) AS phat
  FROM cum CROSS JOIN tot
),
binned AS (
  SELECT LEAST(phat // 1000, 9) AS bin,
         CAST(SUM(n_s) AS BIGINT) AS bin_n,
         CAST(SUM(p) AS BIGINT) AS bin_pos,
         CAST(SUM(n_s * phat) AS BIGINT) AS sum_phat,
         CAST(SUM(p * (phat - 10000) * (phat - 10000) + m * phat * phat)
              AS BIGINT) AS brier_num
  FROM ph GROUP BY 1
)
SELECT bin, bin_n, bin_pos, sum_phat, brier_num,
       CAST(sum_phat AS DOUBLE) / CAST(bin_n * 10000 AS DOUBLE) AS mean_phat,
       CAST(bin_pos AS DOUBLE) / CAST(bin_n AS DOUBLE) AS frac_pos,
       CAST(brier_num AS DOUBLE) / CAST(bin_n * 10000 * 10000 AS DOUBLE) AS brier
FROM binned
ORDER BY bin
"""


def fn_bitwise_surface(spark: SparkSession, sf: str) -> DataFrame:
    """Bitwise-function surface probe: AND/OR/XOR/NOT, shifts,
    bit_count, single-bit extraction, and hex rendering evaluated
    value-for-value against DuckDB on the key-pruned part scan.
    Map-only."""
    p = load_table(spark, sf, "part").filter(F.col("p_partkey") < 200)
    k = F.col("p_partkey").cast("bigint")
    return p.select(
        k.alias("k"),
        k.bitwiseAND(F.lit(181)).alias("band"),
        k.bitwiseOR(F.lit(74)).alias("bor"),
        k.bitwiseXOR(F.lit(99)).alias("bxor"),
        F.shiftleft(k, 3).alias("shl3"),
        F.shiftright(k, 2).alias("shr2"),
        F.expr("~ CAST(p_partkey AS BIGINT)").alias("bnot"),
        F.bit_count(k).cast("bigint").alias("bcount"),
        (F.bit_count(k) % 2).cast("bigint").alias("parity"),
        F.shiftright(k, 4).bitwiseAND(F.lit(15)).alias("nib"),
        F.shiftright(k, 5).bitwiseAND(F.lit(1)).alias("bit5"),
        F.hex(k).alias("hexs"),
        F.when(k.bitwiseAND(F.lit(64)) != 0, F.lit(1))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("flag64"),
    ).orderBy("k")


_FN_BITWISE_SQL = """
SELECT CAST(p_partkey AS BIGINT) AS k,
       CAST(p_partkey AS BIGINT) & 181 AS band,
       CAST(p_partkey AS BIGINT) | 74 AS bor,
       xor(CAST(p_partkey AS BIGINT), 99) AS bxor,
       CAST(p_partkey AS BIGINT) << 3 AS shl3,
       CAST(p_partkey AS BIGINT) >> 2 AS shr2,
       ~ CAST(p_partkey AS BIGINT) AS bnot,
       CAST(bit_count(CAST(p_partkey AS BIGINT)) AS BIGINT) AS bcount,
       CAST(bit_count(CAST(p_partkey AS BIGINT)) % 2 AS BIGINT) AS parity,
       (CAST(p_partkey AS BIGINT) >> 4) & 15 AS nib,
       (CAST(p_partkey AS BIGINT) >> 5) & 1 AS bit5,
       to_hex(CAST(p_partkey AS BIGINT)) AS hexs,
       CAST(CASE WHEN (CAST(p_partkey AS BIGINT) & 64) <> 0
                 THEN 1 ELSE 0 END AS BIGINT) AS flag64
FROM part
WHERE p_partkey < 200
ORDER BY k
"""


def fn_bitagg_surface(spark: SparkSession, sf: str) -> DataFrame:
    """Bit/boolean aggregate surface: BIT_AND / BIT_OR / BIT_XOR of
    the part keys and BOOL_AND / BOOL_OR of a size predicate, grouped
    by brand — map-side-combinable aggregates in both engines."""
    p = load_table(spark, sf, "part").filter(F.col("p_partkey") < 2000)
    k = F.col("p_partkey").cast("bigint")
    return (
        p.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.bit_and(k).alias("k_and"),
            F.bit_or(k).alias("k_or"),
            F.bit_xor(k).alias("k_xor"),
            F.bool_and(F.col("p_size") > 25).alias("all_big"),
            F.bool_or(F.col("p_size") > 25).alias("any_big"),
        )
        .orderBy("p_brand")
    )


_FN_BITAGG_SQL = """
SELECT p_brand,
       COUNT(*)::BIGINT AS n,
       CAST(bit_and(CAST(p_partkey AS BIGINT)) AS BIGINT) AS k_and,
       CAST(bit_or(CAST(p_partkey AS BIGINT)) AS BIGINT) AS k_or,
       CAST(bit_xor(CAST(p_partkey AS BIGINT)) AS BIGINT) AS k_xor,
       bool_and(p_size > 25) AS all_big,
       bool_or(p_size > 25) AS any_big
FROM part
WHERE p_partkey < 2000
GROUP BY p_brand
ORDER BY p_brand
"""


QUERIES = {
    "rc_assoc_rules": rc_assoc_rules,
    "ml_calibration": ml_calibration,
    "fn_bitwise_surface": fn_bitwise_surface,
    "fn_bitagg_surface": fn_bitagg_surface,
}

ORACLES = {
    "rc_assoc_rules": _RC_AR_SQL,
    "ml_calibration": _ML_CAL_SQL,
    "fn_bitwise_surface": _FN_BITWISE_SQL,
    "fn_bitagg_surface": _FN_BITAGG_SQL,
}
