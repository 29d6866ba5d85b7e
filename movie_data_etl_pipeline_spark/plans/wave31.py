"""Round-4 wave 31: centroid silhouette scoring, quantile-regression
IRLS, and a bounded-depth hierarchy rollup with a recursive-CTE
oracle.

Determinism contract unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.plans import wave27
from movie_data_etl_pipeline_spark.plans.wave27 import (
    _EMB_KMEANS_SQL,  # noqa: F401 (CTE chain reused textually below)
    _KM_DIM,
    _km_round_sql,
)
from movie_data_etl_pipeline_spark.sources import load_table

# ---------------------------------------------------------------------------
# emb_silhouette — centroid-based cluster-quality score
# ---------------------------------------------------------------------------


def emb_silhouette(spark: SparkSession, sf: str) -> DataFrame:
    """Centroid silhouette of the Lloyd fixed point
    (`wave27.kmeans_state`): per point, a = distance to own centroid,
    b = min distance to any other centroid, s = (b − a)/max(a, b) —
    the standard clustering-quality readout in its scalable
    centroid-based form (the O(n²) point-pair silhouette is exactly
    what doesn't survive 100 TB; against-centroid is how MLlib's
    evaluator does it too). Distances are exact int64 on the quantized
    vectors; s is snapped to integer micro-units per point before the
    per-cluster mean, so the aggregate is an exact bigint sum and one
    division renders it."""
    assign, cents = wave27.kmeans_state(spark, sf)
    dist = F.aggregate(
        F.zip_with("q", "c", lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    scored = (
        assign.select("id", "q", F.col("cluster").alias("own"))
        .crossJoin(F.broadcast(cents))
        .select("id", "own", "cluster", dist.alias("d"))
    )
    ab = scored.groupBy("id", "own").agg(
        F.min(F.when(F.col("cluster") == F.col("own"), F.col("d"))).alias("a"),
        F.min(F.when(F.col("cluster") != F.col("own"), F.col("d"))).alias("b"),
    )
    s_micro = F.round(
        (F.sqrt(F.col("b").cast("double")) - F.sqrt(F.col("a").cast("double")))
        / F.greatest(
            F.sqrt(F.col("a").cast("double")), F.sqrt(F.col("b").cast("double"))
        )
        * F.lit(1000000.0)
    ).cast("bigint")
    return (
        ab.select(F.col("own").alias("cluster"), s_micro.alias("sm"))
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("sm").cast("bigint").alias("s_micro_sum"),
        )
        .select(
            "cluster",
            "n",
            "s_micro_sum",
            F.round(
                F.col("s_micro_sum").cast("double")
                / (F.lit(1000000.0) * F.col("n").cast("double")),
                6,
            ).alias("mean_silhouette"),
        )
        .orderBy("cluster")
    )


_EMB_SIL_SQL = f"""
WITH qv AS (
  SELECT vec_id AS id,
         [CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT) for x in embedding] AS q
  FROM embeddings
),
c0 AS (
  SELECT (row_number() OVER (ORDER BY id)) - 1 AS cluster, q AS c
  FROM (SELECT id, q FROM qv ORDER BY id LIMIT {wave27._KM_K})
),
{_km_round_sql('c0', 'c1')},
{_km_round_sql('c1', 'c2')},
{_km_round_sql('c2', 'c3')},
sc AS (
  SELECT a.id, a.cluster AS own, c3.cluster,
         CAST(list_sum([(a.q[i] - c3.c[i]) * (a.q[i] - c3.c[i])
                        for i in range(1, {_KM_DIM + 1})]) AS BIGINT) AS d
  FROM a_c3 a CROSS JOIN c3
),
ab AS (
  SELECT id, own,
         MIN(CASE WHEN cluster = own THEN d END) AS a,
         MIN(CASE WHEN cluster <> own THEN d END) AS b
  FROM sc GROUP BY id, own
),
sm AS (
  SELECT own AS cluster,
         CAST(ROUND((sqrt(CAST(b AS DOUBLE)) - sqrt(CAST(a AS DOUBLE)))
                    / GREATEST(sqrt(CAST(a AS DOUBLE)), sqrt(CAST(b AS DOUBLE)))
                    * 1000000.0) AS BIGINT) AS s
  FROM ab
)
SELECT cluster, COUNT(*)::BIGINT AS n, CAST(SUM(s) AS BIGINT) AS s_micro_sum,
       ROUND(CAST(CAST(SUM(s) AS BIGINT) AS DOUBLE)
             / (1000000.0 * CAST(COUNT(*) AS DOUBLE)), 6) AS mean_silhouette
FROM sm GROUP BY cluster ORDER BY cluster
"""


# ---------------------------------------------------------------------------
# ag_quantile_irls — quantile regression via iterated reweighting
# ---------------------------------------------------------------------------

_QR_TAU = 0.9
_QR_ROUNDS = 3


def ag_quantile_irls(spark: SparkSession, sf: str) -> DataFrame:
    """τ = 0.9 quantile regression of daily revenue on time via IRLS
    (the asymmetric-pinball cousin of `ag_huber_irls`): each round
    reweights days by |τ − 1(r<0)| / max(|r|, ε) — observations above
    the line carry weight τ/|r|, below carry (1−τ)/|r| — pulling the
    fit toward the conditional 0.9-quantile instead of the mean.
    Same unrolled-round integer-resnap discipline: weights are snapped
    to integer 1e7-scale units per day (the scale is chosen so the
    worst-case Σw·x·y stays ~20× inside int64 at sf0.1 and ~100× the
    fixture revenue beyond — same budget audit as `ts_esd_outliers`'s
    anchored moments), every cross-row sum is exact bigint, and the
    per-round (slope, intercept) pair is one identically-associated
    double expression. Output additionally reports the fraction of
    days under the fitted line — ≈ τ when the fit converged."""
    orders = load_table(spark, sf, "orders")
    daily = (
        orders.groupBy(F.col("o_orderdate").cast("date").alias("dte"))
        .agg(F.sum(F.round("o_totalprice").cast("bigint")).cast("bigint").alias("y"))
        .select(
            F.datediff(F.col("dte"), F.lit("1992-01-01").cast("date"))
            .cast("bigint")
            .alias("x"),
            "y",
        )
        .localCheckpoint(eager=True)
    )

    def fit(weighted: DataFrame) -> DataFrame:
        s = weighted.agg(
            F.sum("w").cast("bigint").alias("sw"),
            F.sum(F.col("w") * F.col("x")).cast("bigint").alias("swx"),
            F.sum(F.col("w") * F.col("y")).cast("bigint").alias("swy"),
            F.sum(F.col("w") * F.col("x") * F.col("x")).cast("bigint").alias("swx2"),
            F.sum(F.col("w") * F.col("x") * F.col("y")).cast("bigint").alias("swxy"),
        )
        return s.select(
            (
                (F.col("sw").cast("double") * F.col("swxy").cast("double")
                 - F.col("swx").cast("double") * F.col("swy").cast("double"))
                / (F.col("sw").cast("double") * F.col("swx2").cast("double")
                   - F.col("swx").cast("double") * F.col("swx").cast("double"))
            ).alias("beta"),
            "sw", "swx", "swy",
        ).select(
            "beta",
            (
                (F.col("swy").cast("double") - F.col("beta") * F.col("swx").cast("double"))
                / F.col("sw").cast("double")
            ).alias("alpha"),
        )

    fitted = fit(daily.withColumn("w", F.lit(1000).cast("bigint")))
    for _ in range(_QR_ROUNDS):
        j = daily.crossJoin(F.broadcast(fitted))
        r = F.col("y").cast("double") - (
            F.col("alpha") + F.col("beta") * F.col("x").cast("double")
        )
        tau_w = F.when(r < 0, F.lit(1.0 - _QR_TAU)).otherwise(F.lit(_QR_TAU))
        w = F.round(
            tau_w / F.greatest(F.abs(r), F.lit(1000.0)) * F.lit(10000000.0)
        ).cast("bigint")
        fitted = fit(j.select("x", "y", w.alias("w"))).localCheckpoint(eager=True)
    final = daily.crossJoin(F.broadcast(fitted))
    r = F.col("y").cast("double") - (
        F.col("alpha") + F.col("beta") * F.col("x").cast("double")
    )
    return final.agg(
        F.round(F.first("beta"), 6).alias("slope_per_day"),
        F.round(F.first("alpha"), 2).alias("intercept"),
        F.round(
            F.sum((r < 0).cast("bigint")).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("frac_below"),
    )


def _qr_fit_sql(src: str, out: str) -> str:
    return f"""
s_{out} AS (
  SELECT CAST(SUM(w) AS BIGINT) AS sw,
         CAST(SUM(w * x) AS BIGINT) AS swx,
         CAST(SUM(w * y) AS BIGINT) AS swy,
         CAST(SUM(w * x * x) AS BIGINT) AS swx2,
         CAST(SUM(w * x * y) AS BIGINT) AS swxy
  FROM {src}
),
b_{out} AS (
  SELECT (CAST(sw AS DOUBLE) * CAST(swxy AS DOUBLE)
          - CAST(swx AS DOUBLE) * CAST(swy AS DOUBLE))
         / (CAST(sw AS DOUBLE) * CAST(swx2 AS DOUBLE)
            - CAST(swx AS DOUBLE) * CAST(swx AS DOUBLE)) AS beta,
         sw, swx, swy
  FROM s_{out}
),
{out} AS (
  SELECT beta,
         (CAST(swy AS DOUBLE) - beta * CAST(swx AS DOUBLE))
         / CAST(sw AS DOUBLE) AS alpha
  FROM b_{out}
)"""


def _qr_weight_sql(prev_fit: str, out: str) -> str:
    return f"""
{out} AS (
  SELECT d.x, d.y,
         CAST(ROUND(
           (CASE WHEN CAST(d.y AS DOUBLE) - (f.alpha + f.beta * CAST(d.x AS DOUBLE)) < 0
                 THEN {1.0 - _QR_TAU} ELSE {_QR_TAU} END)
           / GREATEST(ABS(CAST(d.y AS DOUBLE) - (f.alpha + f.beta * CAST(d.x AS DOUBLE))), 1000.0)
           * 10000000.0) AS BIGINT) AS w
  FROM daily d CROSS JOIN {prev_fit} f
)"""


_AG_QR_SQL = f"""
WITH daily AS (
  SELECT CAST(datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
         CAST(SUM(CAST(ROUND(o_totalprice) AS BIGINT)) AS BIGINT) AS y
  FROM orders GROUP BY 1
),
w0 AS (SELECT x, y, CAST(1000 AS BIGINT) AS w FROM daily),
{_qr_fit_sql('w0', 'f0')},
{_qr_weight_sql('f0', 'w1')},
{_qr_fit_sql('w1', 'f1')},
{_qr_weight_sql('f1', 'w2')},
{_qr_fit_sql('w2', 'f2')},
{_qr_weight_sql('f2', 'w3')},
{_qr_fit_sql('w3', 'f3')}
SELECT ROUND(beta, 6) AS slope_per_day,
       ROUND(alpha, 2) AS intercept,
       ROUND(CAST(SUM(CASE WHEN CAST(y AS DOUBLE) - (alpha + beta * CAST(x AS DOUBLE)) < 0
                           THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS frac_below
FROM daily CROSS JOIN f3
GROUP BY beta, alpha
"""


# ---------------------------------------------------------------------------
# pt_hierarchy_rollup — bounded-depth transitive rollup
# ---------------------------------------------------------------------------

_H_DEPTH = 3


def pt_hierarchy_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """Hierarchy (BOM-style) rollup over the derived part tree
    ``parent(p) = p div 10`` (a synthetic but fixed 10-ary hierarchy —
    the part-family/category/department levels a catalog would carry):
    for every ancestor node ≤ 3 levels above a part, the descendant
    count and total retail value (integer cents). Spark side: 3
    unrolled parent-hop joins (bounded-depth transitive closure — the
    Spark rendering of a recursive query); oracle side: a genuine
    ``WITH RECURSIVE`` with a depth counter, proving the two
    formulations agree exactly. Top-100 ancestors by value for a
    bounded output."""
    part = load_table(spark, sf, "part").select(
        F.col("p_partkey").alias("p"),
        F.round(F.col("p_retailprice") * 100).cast("bigint").alias("cents"),
    )
    # (ancestor, part) pairs for 1..3 hops; div is exact on positives
    a1 = part.select(F.expr("p div 10").alias("anc"), "p", "cents")
    a2 = part.select(F.expr("p div 100").alias("anc"), "p", "cents")
    a3 = part.select(F.expr("p div 1000").alias("anc"), "p", "cents")
    allp = a1.unionAll(a2).unionAll(a3).filter(F.col("anc") > 0)
    return (
        allp.groupBy("anc")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_desc"),
            F.sum("cents").cast("bigint").alias("total_cents"),
        )
        .orderBy(F.desc("total_cents"), F.asc("anc"))
        .limit(100)
    )


_PT_HIER_SQL = f"""
WITH RECURSIVE parts AS (
  SELECT p_partkey AS p, CAST(ROUND(p_retailprice * 100) AS BIGINT) AS cents
  FROM part
),
walk(anc, p, cents, depth) AS (
  SELECT p // 10, p, cents, 1 FROM parts WHERE p // 10 > 0
  UNION ALL
  SELECT anc // 10, p, cents, depth + 1
  FROM walk WHERE depth < {_H_DEPTH} AND anc // 10 > 0
)
SELECT anc, COUNT(*)::BIGINT AS n_desc, CAST(SUM(cents) AS BIGINT) AS total_cents
FROM walk GROUP BY anc
ORDER BY total_cents DESC, anc ASC
LIMIT 100
"""


QUERIES = {
    "emb_silhouette": emb_silhouette,
    "ag_quantile_irls": ag_quantile_irls,
    "pt_hierarchy_rollup": pt_hierarchy_rollup,
}

ORACLES = {
    "emb_silhouette": _EMB_SIL_SQL,
    "ag_quantile_irls": _AG_QR_SQL,
    "pt_hierarchy_rollup": _PT_HIER_SQL,
}
