"""Round-4 wave 45: two-regressor OLS (normal equations via Cramer's
rule) over anchored integer moments.

Determinism contract: day-grain sums are exact int64; moments are
accumulated as deviations from integer floor-mean anchors, with the
deviation PRODUCTS in exact DECIMAL(38,0) (the qa_chi2 /
ag_cramers_v discipline — the round-8 100x error sweep proved the
int64 squares overflow there; anchoring bounds the deviations, not
their squares); coefficients, intercept, and R² are fixed double
expressions over those exact accumulations.

Hard bound of the DECIMAL(38,0) guarantee (ADVICE-r8 #4): each
deviation product is exact while |deviation| < ~1e19 and each running
SUM of products while |Σ| < 1e38 — past that, ANSI mode raises
ARITHMETIC_OVERFLOW rather than silently corrupting. The 100x-sf0.1
sweep verifies headroom to that level only; the NEXT scale jump
(day-grain deviations approaching 1e19, i.e. ~1e6× today's) must
re-check this bound deliberately — widen the anchor precision or
rescale units before raising the sweep factor past it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.sources import load_table


def ag_ols2_cramer(spark: SparkSession, sf: str) -> DataFrame:
    """Two-regressor OLS at day grain — daily revenue (whole dollars)
    on daily quantity and daily discount points: one fact scan → the
    day relation; one 1-row anchor pass (integer floor means, the
    sanctioned broadcast shape); one moment aggregate of exact int64
    deviation products; then Cramer's rule ``b = S⁻¹ s`` and R² as
    fixed double expressions. The multivariate extension of
    `ag_ols_brand`; at 100 TB the day relation is metadata-sized and
    the DECIMAL(38,0) products are exact to deviations of ~1e19."""
    li = load_table(spark, sf, "lineitem")
    days = li.groupBy(F.col("l_shipdate").alias("d")).agg(
        F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("x1"),
        F.sum(F.round(F.col("l_discount") * 100).cast("bigint"))
        .cast("bigint")
        .alias("x2"),
        F.sum(F.floor(F.col("l_extendedprice")).cast("bigint"))
        .cast("bigint")
        .alias("y"),
    )
    anchors = days.agg(
        F.expr("sum(x1) div count(*)").alias("a1"),
        F.expr("sum(x2) div count(*)").alias("a2"),
        F.expr("sum(y) div count(*)").alias("ay"),
    )
    dv = days.join(F.broadcast(anchors)).select(
        (F.col("x1") - F.col("a1")).alias("d1"),
        (F.col("x2") - F.col("a2")).alias("d2"),
        (F.col("y") - F.col("ay")).alias("dy"),
        "a1",
        "a2",
        "ay",
    )
    # deviation PRODUCTS are the n²·value²-class terms: at 100x sf0.1
    # the daily-revenue deviations square past int64 (the round-8 100x
    # error sweep faulted exactly here) — compute them in exact
    # DECIMAL(38,0), the qa_chi2 / ag_cramers_v discipline; the linear
    # sums stay int64 (day-count × deviation, orders of magnitude of
    # headroom)
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = dv.groupBy("a1", "a2", "ay").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("d1").cast("bigint").alias("s1"),
        F.sum("d2").cast("bigint").alias("s2"),
        F.sum("dy").cast("bigint").alias("sy"),
        F.sum(dec("d1") * dec("d1")).alias("s11"),
        F.sum(dec("d2") * dec("d2")).alias("s22"),
        F.sum(dec("d1") * dec("d2")).alias("s12"),
        F.sum(dec("d1") * dec("dy")).alias("s1y"),
        F.sum(dec("d2") * dec("dy")).alias("s2y"),
        F.sum(dec("dy") * dec("dy")).alias("syy"),
    )
    # centered second moments from anchored sums: C11 = s11 - s1²/n etc.
    n = F.col("n").cast("double")

    def c(sab, sa, sb):
        return F.col(sab).cast("double") - F.col(sa).cast("double") * F.col(
            sb
        ).cast("double") / n

    c11, c22, c12 = c("s11", "s1", "s1"), c("s22", "s2", "s2"), c("s12", "s1", "s2")
    c1y, c2y, cyy = c("s1y", "s1", "sy"), c("s2y", "s2", "sy"), c("syy", "sy", "sy")
    det = c11 * c22 - c12 * c12
    b1 = (c22 * c1y - c12 * c2y) / det
    b2 = (c11 * c2y - c12 * c1y) / det
    mean1 = F.col("a1").cast("double") + F.col("s1").cast("double") / n
    mean2 = F.col("a2").cast("double") + F.col("s2").cast("double") / n
    meany = F.col("ay").cast("double") + F.col("sy").cast("double") / n
    # moments surface as doubles: exact integers below 2^53 (all of
    # sf0.01, where the oracle checks values bit-for-bit), one
    # deterministic rounding above — the decimal ACCUMULATION is what
    # must stay exact, and it does
    return m.select(
        "n",
        F.col("s11").cast("double").alias("s11"),
        F.col("s22").cast("double").alias("s22"),
        F.col("s12").cast("double").alias("s12"),
        F.col("s1y").cast("double").alias("s1y"),
        F.col("s2y").cast("double").alias("s2y"),
        F.col("syy").cast("double").alias("syy"),
        b1.alias("b_qty"),
        b2.alias("b_disc"),
        (meany - b1 * mean1 - b2 * mean2).alias("intercept"),
        ((b1 * c1y + b2 * c2y) / cyy).alias("r2"),
    )


_AG_OLS2_SQL = """
WITH days AS (
  SELECT l_shipdate AS d,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS x1,
         CAST(SUM(CAST(ROUND(l_discount * 100) AS BIGINT)) AS BIGINT) AS x2,
         CAST(SUM(CAST(FLOOR(l_extendedprice) AS BIGINT)) AS BIGINT) AS y
  FROM lineitem GROUP BY 1
),
anchors AS (
  SELECT CAST(SUM(x1) AS BIGINT) // COUNT(*) AS a1,
         CAST(SUM(x2) AS BIGINT) // COUNT(*) AS a2,
         CAST(SUM(y) AS BIGINT) // COUNT(*) AS ay
  FROM days
),
dv AS (
  SELECT x1 - a1 AS d1, x2 - a2 AS d2, y - ay AS dy, a1, a2, ay
  FROM days CROSS JOIN anchors
),
m AS (
  SELECT a1, a2, ay,
         COUNT(*)::BIGINT AS n,
         CAST(SUM(d1) AS BIGINT) AS s1,
         CAST(SUM(d2) AS BIGINT) AS s2,
         CAST(SUM(dy) AS BIGINT) AS sy,
         SUM(CAST(d1 AS HUGEINT) * d1) AS s11,
         SUM(CAST(d2 AS HUGEINT) * d2) AS s22,
         SUM(CAST(d1 AS HUGEINT) * d2) AS s12,
         SUM(CAST(d1 AS HUGEINT) * dy) AS s1y,
         SUM(CAST(d2 AS HUGEINT) * dy) AS s2y,
         SUM(CAST(dy AS HUGEINT) * dy) AS syy
  FROM dv GROUP BY 1, 2, 3
),
e AS (
  SELECT *,
         CAST(n AS DOUBLE) AS nn,
         CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS c11,
         CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS c22,
         CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS c12,
         CAST(s1y AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS c1y,
         CAST(s2y AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS c2y,
         CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS cyy
  FROM m
),
b AS (
  SELECT *,
         (c22 * c1y - c12 * c2y) / (c11 * c22 - c12 * c12) AS b1,
         (c11 * c2y - c12 * c1y) / (c11 * c22 - c12 * c12) AS b2
  FROM e
)
SELECT n,
       CAST(s11 AS DOUBLE) AS s11, CAST(s22 AS DOUBLE) AS s22,
       CAST(s12 AS DOUBLE) AS s12, CAST(s1y AS DOUBLE) AS s1y,
       CAST(s2y AS DOUBLE) AS s2y, CAST(syy AS DOUBLE) AS syy,
       b1 AS b_qty,
       b2 AS b_disc,
       (CAST(ay AS DOUBLE) + CAST(sy AS DOUBLE) / nn)
         - b1 * (CAST(a1 AS DOUBLE) + CAST(s1 AS DOUBLE) / nn)
         - b2 * (CAST(a2 AS DOUBLE) + CAST(s2 AS DOUBLE) / nn) AS intercept,
       (b1 * c1y + b2 * c2y) / cyy AS r2
FROM b
"""


QUERIES = {
    "ag_ols2_cramer": ag_ols2_cramer,
}

ORACLES = {
    "ag_ols2_cramer": _AG_OLS2_SQL,
}
