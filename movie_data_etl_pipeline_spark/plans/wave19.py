"""Round-3 wave 19: experimentation-platform and behavioural-outlier
closers — sample-ratio-mismatch gating, per-user multivariate outlier
screening, and degree assortativity of the interaction graph.

Determinism contract unchanged: exact integer moments, nano-snapped
per-row float terms before any cross-row sum, one final IEEE
expression per rendered value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.functions import portable_hash as ph
from movie_data_etl_pipeline_spark.sources import load_table


# ---------------------------------------------------------------------------
# qa_srm_check — sample-ratio mismatch gate
# ---------------------------------------------------------------------------

_SRM_CRIT_N = 3_841_459  # chi²₁ 0.95 critical value × 1e6 (3.841459)


def qa_srm_check(spark: SparkSession, sf: str) -> DataFrame:
    """Sample-ratio-mismatch gate for a 50/50 experiment assignment:
    users are bucketed by the portable hash (the deterministic
    assignment `sa_hash_split` ships), and the observed arm counts
    are tested against the intended ratio with the one-degree
    chi-square — the FIRST validity gate every experimentation
    platform runs, because a biased assignment invalidates every
    downstream metric no matter how pretty.

    χ² = Σ (obs − exp)²/exp over the two arms reduces to
    (a − b)²/(a + b) for a 50/50 split — one exact-integer-fed
    expression; the verdict compares micro-scaled integers against
    the 0.95 critical value, so the gate itself is integer
    arithmetic."""
    arm = (ph.mix(F.col("user_id") % F.lit(ph.P)) % 2).alias("arm")
    counts = (
        load_table(spark, sf, "events")
        .select("user_id")
        .distinct()
        .select(arm)
        .groupBy("arm")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wide = counts.agg(
        F.sum(F.when(F.col("arm") == 0, F.col("n")).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("arm") == 1, F.col("n")).otherwise(0)).alias("n_b"),
    )
    d = F.col("n_a") - F.col("n_b")
    chi2_n = F.round(F.lit(1e6) * d * d / (F.col("n_a") + F.col("n_b")).cast("double")).cast(
        "bigint"
    )
    return wide.select(
        "n_a",
        "n_b",
        F.round(chi2_n / 1e6, 6).alias("chi2"),
        (chi2_n > _SRM_CRIT_N).cast("int").alias("srm_detected"),
    )


_QA_SRM_SQL = f"""
WITH u AS (SELECT DISTINCT user_id FROM events),
arms AS (
  SELECT {ph.sql_mix(f"user_id % {ph.P}")} % 2 AS arm FROM u
),
wide AS (
  SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
  FROM arms
)
SELECT n_a, n_b,
       ROUND(CAST(ROUND(1e6 * (n_a - n_b) * (n_a - n_b)
                        / CAST(n_a + n_b AS DOUBLE)) AS BIGINT) / 1e6, 6) AS chi2,
       CAST(CAST(ROUND(1e6 * (n_a - n_b) * (n_a - n_b)
                       / CAST(n_a + n_b AS DOUBLE)) AS BIGINT) > {_SRM_CRIT_N}
            AS INTEGER) AS srm_detected
FROM wide
"""


# ---------------------------------------------------------------------------
# ev_user_outliers — multivariate behavioural outlier screen
# ---------------------------------------------------------------------------

_OUT_Z2_CRIT_N = 15_086_000_000  # χ²₅ 0.99 × 1e9 (15.086)


def ev_user_outliers(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user multivariate outlier score over the event-type count
    vector: the diagonal-covariance Mahalanobis distance
    Σ_t (c_ut − μ_t)²/σ_t² against the χ²₍T₎ 0.99 cutoff — the
    bot/abuse screen that a single-metric z-score misses when a user
    is mildly unusual on EVERY axis at once (`ev_session_entropy`'s
    multivariate sibling).

    Per-(user,type) z² terms are nano-snapped integers, so the
    per-user sum is exact; μ and σ² come from exact integer moments
    over the (type, user-count) relation. Shuffles only on user_id /
    event_type."""
    ev = load_table(spark, sf, "events").select("user_id", "event_type")
    cu = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    nu = cu.agg(F.countDistinct("user_id").alias("n"))
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    mom = cu.groupBy("event_type").agg(
        F.sum("c").alias("s"), F.sum(dec("c") * F.col("c")).alias("ss")
    )
    # absent (user,type) cells count 0, so moments use the FULL user
    # population: μ = s/N, σ² = (N·ss − s²)/N²  (population variance)
    nn = F.col("n").cast("double")
    stats = mom.crossJoin(F.broadcast(nu)).select(
        "event_type",
        (F.col("s") / nn).alias("mu"),
        (
            (nn * F.col("ss").cast("double") - F.col("s").cast("double") * F.col("s").cast("double"))
            / (nn * nn)
        ).alias("var"),
    )
    z2 = (F.col("c") - F.col("mu")) * (F.col("c") - F.col("mu")) / F.col("var")
    z2_absent = F.col("mu") * F.col("mu") / F.col("var")
    terms = cu.join(F.broadcast(stats), "event_type").select(
        "user_id",
        F.round(F.lit(1e9) * z2).cast("bigint").alias("z2n"),
        F.round(F.lit(1e9) * z2_absent).cast("bigint").alias("z2n_absent"),
    )
    # per-user total = Σ present z² + Σ_{absent types} μ²/σ²; the
    # absent part is (all-types base) − (present-types base)
    absent_total = stats.agg(
        F.sum(F.round(F.lit(1e9) * z2_absent).cast("bigint")).alias("base_n")
    )
    per_user = terms.groupBy("user_id").agg(
        F.sum("z2n").alias("present_n"), F.sum("z2n_absent").alias("present_base_n")
    )
    return (
        per_user.crossJoin(F.broadcast(absent_total))
        .select(
            "user_id",
            F.round(
                (F.col("present_n") + F.col("base_n") - F.col("present_base_n")) / 1e9,
                6,
            ).alias("m2"),
            (
                (F.col("present_n") + F.col("base_n") - F.col("present_base_n"))
                > _OUT_Z2_CRIT_N
            )
            .cast("int")
            .alias("is_outlier"),
        )
        .orderBy("user_id")
    )


_EV_OUT_SQL = f"""
WITH cu AS (
  SELECT user_id, event_type, COUNT(*) AS c FROM events GROUP BY 1, 2
),
nu AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n FROM cu),
mom AS (
  SELECT event_type, CAST(SUM(c) AS BIGINT) AS s, SUM(c * c) AS ss
  FROM cu GROUP BY 1
),
stats AS (
  SELECT event_type,
         CAST(s AS DOUBLE) / n AS mu,
         (n * CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
           / (CAST(n AS DOUBLE) * n) AS var
  FROM mom, nu
),
base AS (
  SELECT CAST(SUM(CAST(ROUND(1e9 * mu * mu / var) AS BIGINT)) AS BIGINT) AS base_n
  FROM stats
),
terms AS (
  SELECT cu.user_id,
         CAST(ROUND(1e9 * (cu.c - st.mu) * (cu.c - st.mu) / st.var) AS BIGINT)
           AS z2n,
         CAST(ROUND(1e9 * st.mu * st.mu / st.var) AS BIGINT) AS z2n_absent
  FROM cu JOIN stats st USING (event_type)
),
per_user AS (
  SELECT user_id,
         CAST(SUM(z2n) AS BIGINT) AS present_n,
         CAST(SUM(z2n_absent) AS BIGINT) AS present_base_n
  FROM terms GROUP BY 1
)
SELECT user_id,
       ROUND((present_n + base_n - present_base_n) / 1e9, 6) AS m2,
       CAST((present_n + base_n - present_base_n) > {_OUT_Z2_CRIT_N}
            AS INTEGER) AS is_outlier
FROM per_user, base
"""


# ---------------------------------------------------------------------------
# gr_assortativity — degree correlation of the interaction graph
# ---------------------------------------------------------------------------


def gr_assortativity(spark: SparkSession, sf: str) -> DataFrame:
    """Degree assortativity of the supplier–part graph: the Pearson
    correlation of endpoint degrees over (directed) edges — negative
    for hub-and-spoke catalogs (big suppliers touch niche parts),
    positive for core–periphery ones; the one-number structure
    summary next to `gr_kcore`'s density filter.

    r = (E·Σxy − Σx·Σy) / √(E·Σx²−(Σx)²) / √(E·Σy²−(Σy)²) with
    every Σ an exact integer over the degree-annotated edge relation
    (decimal sums; degrees from two groupBys); one final double
    expression."""
    li = (
        load_table(spark, sf, "lineitem")
        .select(F.col("l_suppkey").alias("u"), F.col("l_partkey").alias("v"))
        .distinct()
    )
    du = li.groupBy("u").agg(F.count(F.lit(1)).alias("du"))
    dv = li.groupBy("v").agg(F.count(F.lit(1)).alias("dv"))
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    e = (
        li.join(du, "u")
        .join(dv, "v")
        .select("du", "dv")
    )
    m = e.agg(
        F.count(F.lit(1)).alias("ne"),
        F.sum("du").alias("sx"),
        F.sum("dv").alias("sy"),
        F.sum(dec("du") * F.col("du")).alias("sxx"),
        F.sum(dec("dv") * F.col("dv")).alias("syy"),
        F.sum(dec("du") * F.col("dv")).alias("sxy"),
    )
    ne = F.col("ne").cast("double")
    num = ne * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy").cast("double")
    denx = F.sqrt(ne * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double"))
    deny = F.sqrt(ne * F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy").cast("double"))
    return m.select(
        "ne",
        F.round(num / denx / deny, 6).alias("assortativity"),
    )


_GR_ASSORT_SQL = """
WITH li AS (SELECT DISTINCT l_suppkey AS u, l_partkey AS v FROM lineitem),
du AS (SELECT u, COUNT(*) AS du FROM li GROUP BY 1),
dv AS (SELECT v, COUNT(*) AS dv FROM li GROUP BY 1),
e AS (
  SELECT du.du, dv.dv
  FROM li JOIN du USING (u) JOIN dv USING (v)
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS ne,
         CAST(SUM(du) AS BIGINT) AS sx, CAST(SUM(dv) AS BIGINT) AS sy,
         SUM(du * du) AS sxx, SUM(dv * dv) AS syy, SUM(du * dv) AS sxy
  FROM e
)
SELECT ne,
       ROUND((CAST(ne AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / SQRT(CAST(ne AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             / SQRT(CAST(ne AS DOUBLE) * CAST(syy AS DOUBLE)
                    - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)), 6)
         AS assortativity
FROM m
"""


QUERIES = {
    "qa_srm_check": qa_srm_check,
    "ev_user_outliers": ev_user_outliers,
    "gr_assortativity": gr_assortativity,
}

ORACLES = {
    "qa_srm_check": _QA_SRM_SQL,
    "ev_user_outliers": _EV_OUT_SQL,
    "gr_assortativity": _GR_ASSORT_SQL,
}
