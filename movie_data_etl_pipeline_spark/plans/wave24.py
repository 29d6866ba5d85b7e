"""Round-4 wave 24: Hilbert-curve data layout, Huber-IRLS robust
regression, and a matryoshka embedding-truncation recall audit.

Determinism contract unchanged: integer arithmetic end-to-end wherever
state crosses rows (Hilbert indices, quantized dot products, IRLS
milli-weights), identically-associated double expressions otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.sources import load_table


# ---------------------------------------------------------------------------
# ly_hilbert — Hilbert space-filling-curve layout index + block stats
# ---------------------------------------------------------------------------

_H_ORDER = 8  # 256 x 256 grid


def hilbert_round_exprs(s: int, idiv: str) -> tuple[str, str, str]:
    """One unrolled round of the masked xy2d algorithm at scale ``s``,
    as (d, x, y) SQL expressions over columns named ``hd``/``hx``/``hy``
    (chained per-round projections keep expression size LINEAR in the
    order — a single substituted expression grows exponentially).

    The quadrant bits are rx = (hx // s) % 2, ry = (hy // s) % 2; the
    classic Gray-code quadrant number (3·rx) XOR ry is the branch-free
    polynomial rx*3 + ry*(1 − 2·rx); d accrues s²·quadrant; then x,y
    are reduced into the s×s subsquare (mod s) and rotated/reflected
    when ry = 0. Everything is non-negative integer arithmetic, so
    Spark's ``div`` and DuckDB's ``//`` agree exactly (``idiv``
    parameterizes the spelling); both renderings come from this one
    template and cannot drift apart."""
    rx = f"((hx {idiv} {s}) % 2)"
    ry = f"((hy {idiv} {s}) % 2)"
    quad = f"({rx} * 3 + {ry} * (1 - 2 * {rx}))"
    d_new = f"(hd + {s * s} * {quad})"
    xm = f"(hx % {s})"
    ym = f"(hy % {s})"
    # ry=1: keep; ry=0 & rx=1: reflect then swap; ry=0 & rx=0: swap
    x_new = (
        f"(CASE WHEN {ry} = 1 THEN {xm} "
        f"WHEN {rx} = 1 THEN {s - 1} - {ym} ELSE {ym} END)"
    )
    y_new = (
        f"(CASE WHEN {ry} = 1 THEN {ym} "
        f"WHEN {rx} = 1 THEN {s - 1} - {xm} ELSE {xm} END)"
    )
    return d_new, x_new, y_new


def _hilbert_scales() -> list[int]:
    return [1 << p for p in range(_H_ORDER - 1, -1, -1)]


def ly_hilbert(spark: SparkSession, sf: str) -> DataFrame:
    """Hilbert-curve layout index — the locality-preserving successor
    to ``ly_zorder``: map each customer to a 256×256 grid cell
    (balance-bin × key-bin), compute the Hilbert d-index with 8
    unrolled rounds of pure integer arithmetic, and report per
    256-cell curve block the row count and the x/y extents it spans.
    Hilbert blocks bound BOTH coordinate ranges (unlike Z-order, whose
    blocks jump), which is exactly the zone-map-pruning win: a range
    predicate on either column eliminates whole blocks. A real table
    rewrite would ``repartitionByRange(hilbert_d)`` and write; the
    index expression here is that sort key.

    Integer-only end-to-end ⇒ hash-green oracle; the Spark and DuckDB
    renderings are generated from the same template
    (``_hilbert_steps``), differing only in the integer-division
    spelling."""
    cur = load_table(spark, sf, "customer").select(
        "c_custkey",
        F.pmod(F.round(F.col("c_acctbal") * 100).cast("bigint"), F.lit(256)).alias("gx"),
        F.pmod(F.col("c_custkey"), F.lit(256)).alias("gy"),
        F.lit(0).cast("bigint").alias("hd"),
        F.pmod(F.round(F.col("c_acctbal") * 100).cast("bigint"), F.lit(256)).alias("hx"),
        F.pmod(F.col("c_custkey"), F.lit(256)).alias("hy"),
    )
    for s in _hilbert_scales():
        d_e, x_e, y_e = hilbert_round_exprs(s, "div")
        cur = cur.select(
            "c_custkey",
            "gx",
            "gy",
            F.expr(d_e).alias("hd"),
            F.expr(x_e).alias("hx"),
            F.expr(y_e).alias("hy"),
        )
    return (
        cur.groupBy(F.floor(F.col("hd") / F.lit(256)).cast("bigint").alias("block"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("gx").cast("bigint").alias("x_min"),
            F.max("gx").cast("bigint").alias("x_max"),
            F.min("gy").cast("bigint").alias("y_min"),
            F.max("gy").cast("bigint").alias("y_max"),
        )
        .orderBy("block")
    )


def _hilbert_cte_chain() -> str:
    ctes = []
    prev = "h0"
    for i, s in enumerate(_hilbert_scales(), start=1):
        d_e, x_e, y_e = hilbert_round_exprs(s, "//")
        ctes.append(
            f"h{i} AS (SELECT c_custkey, gx, gy, {d_e} AS hd, "
            f"{x_e} AS hx, {y_e} AS hy FROM {prev})"
        )
        prev = f"h{i}"
    return ",\n".join(ctes), prev


_H_CTES, _H_LAST = _hilbert_cte_chain()

_LY_HILBERT_SQL = f"""
WITH g AS (
  SELECT c_custkey,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) % 256 AS gx0,
         c_custkey % 256 AS gy
  FROM customer
),
h0 AS (
  SELECT c_custkey,
         CASE WHEN gx0 < 0 THEN gx0 + 256 ELSE gx0 END AS gx, gy,
         CAST(0 AS BIGINT) AS hd,
         CASE WHEN gx0 < 0 THEN gx0 + 256 ELSE gx0 END AS hx, gy AS hy
  FROM g
),
{_H_CTES}
SELECT hd // 256 AS block,
       COUNT(*)::BIGINT AS n,
       MIN(gx)::BIGINT AS x_min, MAX(gx)::BIGINT AS x_max,
       MIN(gy)::BIGINT AS y_min, MAX(gy)::BIGINT AS y_max
FROM {_H_LAST} GROUP BY 1 ORDER BY block
"""


# ---------------------------------------------------------------------------
# ag_huber_irls — robust regression via unrolled IRLS
# ---------------------------------------------------------------------------

_HUBER_C = 100_000.0  # dollars: residuals beyond this get down-weighted
_IRLS_ROUNDS = 3


def ag_huber_irls(spark: SparkSession, sf: str) -> DataFrame:
    """Huber robust regression of daily revenue on time via IRLS —
    the outlier-resistant line `ag_theil_sen` gets from medians, here
    from iteratively-reweighted least squares (the estimator a real
    stats library fits), made oracle-checkable with the unrolled-round
    integer-resnap recipe: per round, per-day Huber weights
    w = min(1, c/|r|) are SNAPPED TO INTEGER MILLI-WEIGHTS, so every
    cross-row aggregate is an exact bigint sum (order-independent in
    both engines) and the only doubles are the per-round (slope,
    intercept) pair computed from those integers in one
    identically-associated expression. 3 rounds from the OLS start;
    driver state is one scalar row per round.

    Scale: each round is one map over the day-grain relation plus one
    1-row aggregate broadcast back — day-grain cardinality (~2.4k at
    sf0.1, bounded by calendar days at any SF) makes this metadata
    work next to the fact scan that builds it."""
    orders = load_table(spark, sf, "orders")
    daily = (
        orders.groupBy(F.col("o_orderdate").cast("date").alias("dte"))
        .agg(
            F.sum(F.round(F.col("o_totalprice")).cast("bigint"))
            .cast("bigint")
            .alias("y")
        )
        .select(
            F.datediff(F.col("dte"), F.lit("1992-01-01").cast("date"))
            .cast("bigint")
            .alias("x"),
            "y",
        )
    )
    daily = daily.localCheckpoint(eager=True)

    def fit(weighted: DataFrame) -> DataFrame:
        # weighted: x, y, w (integer milli-weights). All sums exact ints.
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
            "sw",
        )

    # round 0: OLS (w = 1000 for every day)
    fitted = fit(daily.withColumn("w", F.lit(1000).cast("bigint")))
    for _ in range(_IRLS_ROUNDS):
        j = daily.crossJoin(F.broadcast(fitted.select("alpha", "beta")))
        r = F.col("y").cast("double") - (
            F.col("alpha") + F.col("beta") * F.col("x").cast("double")
        )
        w = F.when(F.abs(r) < F.lit(1e-9), F.lit(1000).cast("bigint")).otherwise(
            F.round(
                F.least(F.lit(1.0), F.lit(_HUBER_C) / F.abs(r)) * F.lit(1000.0)
            ).cast("bigint")
        )
        fitted = fit(j.select("x", "y", w.alias("w"))).localCheckpoint(eager=True)
    return fitted.select(
        F.round("beta", 6).alias("slope_per_day"),
        F.round("alpha", 2).alias("intercept"),
        F.col("sw").alias("milliweight_sum"),
    )


def _huber_fit_sql(src: str, out: str) -> str:
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
         / CAST(sw AS DOUBLE) AS alpha,
         sw
  FROM b_{out}
)"""


def _huber_weight_sql(prev_fit: str, out: str) -> str:
    return f"""
{out} AS (
  SELECT d.x, d.y,
         CASE WHEN ABS(CAST(d.y AS DOUBLE) - (f.alpha + f.beta * CAST(d.x AS DOUBLE))) < 1e-9
              THEN CAST(1000 AS BIGINT)
              ELSE CAST(ROUND(LEAST(1.0, {_HUBER_C} / ABS(CAST(d.y AS DOUBLE)
                   - (f.alpha + f.beta * CAST(d.x AS DOUBLE)))) * 1000.0) AS BIGINT)
         END AS w
  FROM daily d CROSS JOIN {prev_fit} f
)"""


_AG_HUBER_SQL = f"""
WITH daily AS (
  SELECT CAST(datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
         CAST(SUM(CAST(ROUND(o_totalprice) AS BIGINT)) AS BIGINT) AS y
  FROM orders GROUP BY 1
),
w0 AS (SELECT x, y, CAST(1000 AS BIGINT) AS w FROM daily),
{_huber_fit_sql('w0', 'f0')},
{_huber_weight_sql('f0', 'w1')},
{_huber_fit_sql('w1', 'f1')},
{_huber_weight_sql('f1', 'w2')},
{_huber_fit_sql('w2', 'f2')},
{_huber_weight_sql('f2', 'w3')},
{_huber_fit_sql('w3', 'f3')}
SELECT ROUND(beta, 6) AS slope_per_day,
       ROUND(alpha, 2) AS intercept,
       sw AS milliweight_sum
FROM f3
"""


# ---------------------------------------------------------------------------
# sim_matryoshka_recall — embedding-truncation quality audit
# ---------------------------------------------------------------------------

_MRL_PREFIX = 16
_MRL_K = 10
_MRL_SAMPLE_MOD = 20
# Fixed ABSOLUTE query budget: the smallest _MRL_QCAP ids of the %20
# stratum. A fraction-of-corpus sample makes the audit O(n²/20) —
# measured 14× growth at a 10× corpus (VERDICT-r6) — while a fixed
# cap keeps pair volume O(n·K): the corpus side scales, the broadcast
# query side never does. 64 queries is a statistically adequate audit
# panel at any corpus size (the same fixed-panel discipline as
# dd_lsh_recall / sim_knn_lsh's recall floors).
_MRL_QCAP = 64


def sim_matryoshka_recall(spark: SparkSession, sf: str) -> DataFrame:
    """Matryoshka-truncation audit: for a deterministic fixed-size
    query panel (the smallest 64 ids with ``vec_id % 20 = 0``), how
    much of the exact top-10 under the FULL 64-dim dot product
    survives when ranking by only the first 16 dims — the measurement
    that decides whether a cheap prefix index (matryoshka
    representation learning) can serve first-stage retrieval with
    full-dim re-rank. Dot products are int64-exact on the
    2^20-quantized embeddings (the ``sim_knn_portable`` idiom), so
    ranks — and therefore the overlap count — are engine-portable
    integers. One scan computes both scores; two windows rank them.

    Scale: the query panel is a fixed ABSOLUTE count (not a corpus
    fraction), so the scored relation is O(n·64) — one corpus scan
    against a broadcast 64-row panel — and audit cost grows linearly
    with the corpus, like ``sim_knn_bruteforce``'s K-bounded variants."""
    emb = load_table(spark, sf, "embeddings")
    q = emb.select(
        F.col("vec_id").alias("id"),
        F.transform(
            "embedding", lambda x: F.floor(x.cast("double") * F.lit(1048576.0)).cast("bigint")
        ).alias("q"),
    )
    queries = (
        q.filter(F.col("id") % _MRL_SAMPLE_MOD == 0)
        .orderBy("id")
        .limit(_MRL_QCAP)
        .select(F.col("id").alias("query_id"), F.col("q").alias("qv"))
    )
    pairs = q.crossJoin(F.broadcast(queries)).filter(F.col("id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        F.col("id").alias("neighbor_id"),
        F.aggregate(
            F.zip_with("qv", "q", lambda a, b: a * b),
            F.lit(0).cast("bigint"),
            lambda acc, v: acc + v,
        ).alias("dot_full"),
        F.aggregate(
            F.zip_with(
                F.slice("qv", 1, _MRL_PREFIX), F.slice("q", 1, _MRL_PREFIX),
                lambda a, b: a * b,
            ),
            F.lit(0).cast("bigint"),
            lambda acc, v: acc + v,
        ).alias("dot_prefix"),
    )
    wf = Window.partitionBy("query_id").orderBy(
        F.desc("dot_full"), F.asc("neighbor_id")
    )
    wp = Window.partitionBy("query_id").orderBy(
        F.desc("dot_prefix"), F.asc("neighbor_id")
    )
    ranked = scored.select(
        "query_id",
        "neighbor_id",
        F.row_number().over(wf).alias("rk_full"),
        F.row_number().over(wp).alias("rk_prefix"),
    )
    return (
        ranked.filter((F.col("rk_full") <= _MRL_K) | (F.col("rk_prefix") <= _MRL_K))
        .groupBy("query_id")
        .agg(
            F.sum(
                ((F.col("rk_full") <= _MRL_K) & (F.col("rk_prefix") <= _MRL_K)).cast("bigint")
            )
            .cast("bigint")
            .alias("n_overlap")
        )
        .orderBy("query_id")
    )


_SIM_MRL_SQL = f"""
WITH q AS (
  SELECT vec_id AS id,
         [CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT) for x in embedding] AS q
  FROM embeddings
),
queries AS (
  SELECT id AS query_id, q AS qv FROM q
  WHERE id % {_MRL_SAMPLE_MOD} = 0 ORDER BY id LIMIT {_MRL_QCAP}
),
scored AS (
  SELECT query_id, q.id AS neighbor_id,
         CAST(list_sum([qv[i] * q.q[i] for i in range(1, 65)]) AS BIGINT) AS dot_full,
         CAST(list_sum([qv[i] * q.q[i] for i in range(1, {_MRL_PREFIX + 1})]) AS BIGINT) AS dot_prefix
  FROM q CROSS JOIN queries WHERE q.id <> query_id
),
ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY dot_full DESC, neighbor_id) AS rk_full,
         row_number() OVER (PARTITION BY query_id ORDER BY dot_prefix DESC, neighbor_id) AS rk_prefix
  FROM scored
)
SELECT query_id,
       CAST(SUM(CASE WHEN rk_full <= {_MRL_K} AND rk_prefix <= {_MRL_K} THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap
FROM ranked
WHERE rk_full <= {_MRL_K} OR rk_prefix <= {_MRL_K}
GROUP BY query_id ORDER BY query_id
"""


QUERIES = {
    "ly_hilbert": ly_hilbert,
    "ag_huber_irls": ag_huber_irls,
    "sim_matryoshka_recall": sim_matryoshka_recall,
}

ORACLES = {
    "ly_hilbert": _LY_HILBERT_SQL,
    "ag_huber_irls": _AG_HUBER_SQL,
    "sim_matryoshka_recall": _SIM_MRL_SQL,
}
