"""Round-4 wave 57: Cohen's kappa between two curation rules and the
odds ratio of a 2×2 exposure table.

Determinism contract: both statistics are single fixed double
expressions over exact int64 contingency cells (one scan, one tiny
aggregate each).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.sources import load_table


def ag_cohens_kappa(spark: SparkSession, sf: str) -> DataFrame:
    """Cohen's kappa between two independent document-quality rules
    (rule A: length ≥ 80 chars; rule B: ≥ 15 whitespace tokens) — the
    inter-rater agreement a curation team reports before replacing an
    expensive filter with a cheap proxy: κ = (p_o − p_e)/(1 − p_e)
    with observed/expected agreement from the exact 2×2 int64 cells.
    One doc scan, map-only flags, one global aggregate."""
    docs = load_table(spark, sf, "documents").select(
        (F.length("text") >= 80).alias("a"),
        (F.size(F.split("text", " ")) >= 15).alias("b"),
    )
    cells = docs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum((F.col("a") & F.col("b")).cast("bigint")).cast("bigint").alias("yy"),
        F.sum((F.col("a") & ~F.col("b")).cast("bigint")).cast("bigint").alias("yn"),
        F.sum((~F.col("a") & F.col("b")).cast("bigint")).cast("bigint").alias("ny"),
        F.sum((~F.col("a") & ~F.col("b")).cast("bigint")).cast("bigint").alias("nn"),
    )
    n = F.col("n").cast("double")
    po = (F.col("yy") + F.col("nn")).cast("double") / n
    pe = (
        ((F.col("yy") + F.col("yn")) * (F.col("yy") + F.col("ny"))).cast("double")
        + ((F.col("ny") + F.col("nn")) * (F.col("yn") + F.col("nn"))).cast("double")
    ) / (n * n)
    return cells.select(
        "n",
        "yy",
        "yn",
        "ny",
        "nn",
        po.alias("p_observed"),
        pe.alias("p_expected"),
        ((po - pe) / (F.lit(1.0) - pe)).alias("kappa"),
    )


_AG_KAPPA_SQL = """
WITH flags AS (
  SELECT length(text) >= 80 AS a,
         len(string_split(text, ' ')) >= 15 AS b
  FROM documents
),
cells AS (
  SELECT COUNT(*)::BIGINT AS n,
         CAST(SUM(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT) AS yy,
         CAST(SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS yn,
         CAST(SUM(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT) AS ny,
         CAST(SUM(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS nn
  FROM flags
)
SELECT n, yy, yn, ny, nn,
       CAST(yy + nn AS DOUBLE) / CAST(n AS DOUBLE) AS p_observed,
       (CAST((yy + yn) * (yy + ny) AS DOUBLE)
          + CAST((ny + nn) * (yn + nn) AS DOUBLE))
         / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS p_expected,
       ((CAST(yy + nn AS DOUBLE) / CAST(n AS DOUBLE))
          - (CAST((yy + yn) * (yy + ny) AS DOUBLE)
               + CAST((ny + nn) * (yn + nn) AS DOUBLE))
            / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
       / (1.0 - (CAST((yy + yn) * (yy + ny) AS DOUBLE)
                   + CAST((ny + nn) * (yn + nn) AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS kappa
FROM cells
"""


def ag_odds_ratio(spark: SparkSession, sf: str) -> DataFrame:
    """Odds ratio of the 2×2 exposure table (deep discount ≥ 5% ×
    returned flag) over lineitem — the effect-size screen an ops team
    runs before an intervention: OR = (a·d)/(b·c) as one fixed double
    over exact int64 cells, with the Haldane–Anscombe +1 smoothed twin
    (pure integers until the division) for zero-cell robustness."""
    li = load_table(spark, sf, "lineitem").select(
        (F.col("l_discount") >= 0.05).alias("exposed"),
        (F.col("l_returnflag") == "R").alias("outcome"),
    )
    cells = li.agg(
        F.sum((F.col("exposed") & F.col("outcome")).cast("bigint"))
        .cast("bigint")
        .alias("a"),
        F.sum((F.col("exposed") & ~F.col("outcome")).cast("bigint"))
        .cast("bigint")
        .alias("b"),
        F.sum((~F.col("exposed") & F.col("outcome")).cast("bigint"))
        .cast("bigint")
        .alias("c"),
        F.sum((~F.col("exposed") & ~F.col("outcome")).cast("bigint"))
        .cast("bigint")
        .alias("d"),
    )
    return cells.select(
        "a",
        "b",
        "c",
        "d",
        (
            (F.col("a") * F.col("d")).cast("double")
            / (F.col("b") * F.col("c")).cast("double")
        ).alias("odds_ratio"),
        (
            ((F.col("a") + 1) * (F.col("d") + 1)).cast("double")
            / ((F.col("b") + 1) * (F.col("c") + 1)).cast("double")
        ).alias("odds_ratio_smoothed"),
    )


_AG_ODDS_SQL = """
WITH flags AS (
  SELECT l_discount >= 0.05 AS exposed, l_returnflag = 'R' AS outcome
  FROM lineitem
),
cells AS (
  SELECT CAST(SUM(CASE WHEN exposed AND outcome THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(SUM(CASE WHEN exposed AND NOT outcome THEN 1 ELSE 0 END) AS BIGINT) AS b,
         CAST(SUM(CASE WHEN NOT exposed AND outcome THEN 1 ELSE 0 END) AS BIGINT) AS c,
         CAST(SUM(CASE WHEN NOT exposed AND NOT outcome THEN 1 ELSE 0 END) AS BIGINT) AS d
  FROM flags
)
SELECT a, b, c, d,
       CAST(a * d AS DOUBLE) / CAST(b * c AS DOUBLE) AS odds_ratio,
       CAST((a + 1) * (d + 1) AS DOUBLE) / CAST((b + 1) * (c + 1) AS DOUBLE)
         AS odds_ratio_smoothed
FROM cells
"""


QUERIES = {
    "ag_cohens_kappa": ag_cohens_kappa,
    "ag_odds_ratio": ag_odds_ratio,
}

ORACLES = {
    "ag_cohens_kappa": _AG_KAPPA_SQL,
    "ag_odds_ratio": _AG_ODDS_SQL,
}
