"""Round-3 wave 7: behavioural entropy, nonparametric trend testing,
market concentration, ML split auditing, embedding covariance, and
record tracking — continuing the statistical-depth build-out of
waves 4–6.

Determinism contract unchanged: integer-exact cross-row state
(quantized-ln pricing where logs are needed — the `ag_mutual_info` /
`ev_survival_km` discipline), one final IEEE expression per output
value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.functions import portable_hash as ph
from movie_data_etl_pipeline_spark.functions import scalar as SC
from movie_data_etl_pipeline_spark.plans import _hints
from movie_data_etl_pipeline_spark.sources import load_table


# ---------------------------------------------------------------------------
# ev_session_entropy — behavioural diversity histogram
# ---------------------------------------------------------------------------


def ev_session_entropy(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user event-type Shannon entropy, histogrammed in 0.02-nat
    bins (sized to resolve the fixture's organic-user band) — the behavioural-diversity profile that separates bots (one
    event type, H≈0) from organic users; the corpus-level analog is
    `qa_entropy_profile`.

    H = ln(n) − (Σ c·ln c)/n per user, with each c·ln c snapped to
    integer nano units per (user, type) row so the per-user sum is
    exact; ln(n) and the final difference are single double
    expressions. Two groupBys, user-grain intermediate."""
    ev = load_table(spark, sf, "events").select("user_id", "event_type")
    ct = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    lc = F.round(
        F.lit(1e9) * F.col("c").cast("double") * F.log(F.col("c").cast("double"))
    ).cast("bigint")
    per_user = ct.groupBy("user_id").agg(
        F.sum("c").alias("n"), F.sum(lc).alias("s_nano")
    )
    h = F.log(F.col("n").cast("double")) - F.col("s_nano").cast("double") / (
        F.lit(1e9) * F.col("n").cast("double")
    )
    binned = per_user.select(F.floor(h / F.lit(0.02)).cast("bigint").alias("h_bin"))
    return (
        binned.groupBy("h_bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .orderBy("h_bin")
    )


EV_ENTROPY_SQL = """
WITH ct AS (
  SELECT user_id, event_type, COUNT(*) AS c FROM events GROUP BY 1, 2
),
per_user AS (
  SELECT user_id, SUM(c) AS n,
         SUM(CAST(ROUND(1e9 * CAST(c AS DOUBLE) * LN(CAST(c AS DOUBLE))) AS BIGINT)) AS s_nano
  FROM ct GROUP BY 1
),
h AS (
  SELECT CAST(FLOOR((LN(CAST(n AS DOUBLE))
                     - CAST(s_nano AS DOUBLE) / (1e9 * CAST(n AS DOUBLE))) / 0.02) AS BIGINT) AS h_bin
  FROM per_user
)
SELECT h_bin, CAST(COUNT(*) AS BIGINT) AS n_users FROM h GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# ts_mk_trend — Mann–Kendall nonparametric trend test
# ---------------------------------------------------------------------------


def ts_mk_trend(spark: SparkSession, sf: str) -> DataFrame:
    """Mann–Kendall trend test on daily revenue — the nonparametric
    twin of `ag_theil_sen` (that one estimates the slope; this one
    answers 'is there a monotone trend at all', robust to any
    monotone transform of the series).

    S = Σ_{i<j} sign(x_j − x_i) is an exact integer over day-grain
    pairs; Var(S) gets the exact tie correction from the value-count
    histogram; z is one final double expression. Pair enumeration is
    day-grain (~n² metadata rows), the same bounded trade as
    `ag_theil_sen`."""
    o = load_table(spark, sf, "orders").select(
        F.col("o_orderdate").cast("date").alias("d"),
        SC.cents("o_totalprice").alias("price_c"),
    )
    days = o.groupBy("d").agg(F.sum("price_c").alias("x"))
    a = days.select(F.col("d").alias("d1"), F.col("x").alias("x1"))
    b = days.select(F.col("d").alias("d2"), F.col("x").alias("x2"))
    # calendar-grain bound: `days` has one row per o_orderdate (~2.4k
    # for the TPC-H 7-year range) at ANY fact-table scale — pin the
    # broadcast the r8 AQE flip-off stopped providing (VERDICT-r8 #5).
    s = (
        a.join(_hints.bounded_broadcast(b), F.col("d1") < F.col("d2"))
        .agg(
            F.sum(F.signum(F.col("x2") - F.col("x1")).cast("bigint")).alias("s"),
        )
    )
    ties = (
        days.groupBy("x")
        .agg(F.count(F.lit(1)).alias("t"))
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).alias("tie_term"),
            F.lit(1).alias("__one"),
        )
    )
    n = days.agg(F.count(F.lit(1)).alias("n"), F.lit(1).alias("__one"))
    j = s.crossJoin(F.broadcast(n)).crossJoin(
        F.broadcast(ties.select("tie_term"))
    )
    var18 = (
        F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5) - F.col("tie_term")
    ).cast("double") / F.lit(18.0)
    z = (
        F.when(F.col("s") > 0, (F.col("s") - 1).cast("double") / F.sqrt(var18))
        .when(F.col("s") < 0, (F.col("s") + 1).cast("double") / F.sqrt(var18))
        .otherwise(F.lit(0.0))
    )
    return j.select(
        F.col("n").cast("bigint").alias("n_days"),
        F.col("s").cast("bigint").alias("mk_s"),
        F.round(z, 6).alias("z_stat"),
        F.when(F.round(z, 6) > 1.959964, F.lit("increasing"))
        .when(F.round(z, 6) < -1.959964, F.lit("decreasing"))
        .otherwise(F.lit("no_trend"))
        .alias("trend"),
    )


TS_MK_SQL = """
WITH o AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_c
  FROM orders
),
days AS (SELECT d, SUM(price_c) AS x FROM o GROUP BY 1),
s AS (
  SELECT CAST(SUM(CAST(SIGN(b.x - a.x) AS BIGINT)) AS BIGINT) AS s
  FROM days a JOIN days b ON a.d < b.d
),
ties AS (
  SELECT SUM(t * (t - 1) * (2 * t + 5)) AS tie_term
  FROM (SELECT x, COUNT(*) AS t FROM days GROUP BY 1)
),
n AS (SELECT COUNT(*) AS n FROM days),
j AS (SELECT s.s, n.n, ties.tie_term FROM s CROSS JOIN n CROSS JOIN ties),
z AS (
  SELECT n, s,
         CASE WHEN s > 0 THEN CAST(s - 1 AS DOUBLE)
                / SQRT(CAST(n * (n - 1) * (2 * n + 5) - tie_term AS DOUBLE) / 18.0)
              WHEN s < 0 THEN CAST(s + 1 AS DOUBLE)
                / SQRT(CAST(n * (n - 1) * (2 * n + 5) - tie_term AS DOUBLE) / 18.0)
              ELSE 0.0 END AS zval
  FROM j
)
SELECT CAST(n AS BIGINT) AS n_days, CAST(s AS BIGINT) AS mk_s,
       ROUND(zval, 6) AS z_stat,
       CASE WHEN ROUND(zval, 6) > 1.959964 THEN 'increasing'
            WHEN ROUND(zval, 6) < -1.959964 THEN 'decreasing'
            ELSE 'no_trend' END AS trend
FROM z
"""


# ---------------------------------------------------------------------------
# ag_hhi — Herfindahl–Hirschman concentration per nation
# ---------------------------------------------------------------------------


def ag_hhi(spark: SparkSession, sf: str) -> DataFrame:
    """Herfindahl–Hirschman index of supplier revenue concentration
    within each nation — the regulator's market-concentration number
    (HHI = Σ shareᵢ², 1/k for k equal players, 1.0 for monopoly);
    complements the global `ag_gini`.

    HHI = Σ xᵢ² / (Σ xᵢ)² with both sums exact (DECIMAL(38,0) /
    HUGEINT over cents), one division at the end. Supplier-grain
    aggregate, nation-grain output."""
    li = load_table(spark, sf, "lineitem").select(
        "l_suppkey", SC.cents("l_extendedprice").alias("price_c")
    )
    sup = load_table(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    per = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .groupBy("s_nationkey", "l_suppkey")
        .agg(F.sum("price_c").alias("rev_c"))
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = per.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
        F.sum(dec("rev_c")).alias("sx"),
        F.sum(dec("rev_c") * dec("rev_c")).alias("sxx"),
    )
    return m.select(
        F.col("s_nationkey").cast("bigint").alias("nation"),
        "n_suppliers",
        F.round(
            F.col("sxx").cast("double")
            / (F.col("sx").cast("double") * F.col("sx").cast("double")),
            6,
        ).alias("hhi"),
    ).orderBy("nation")


AG_HHI_SQL = """
WITH per AS (
  SELECT s_nationkey, l_suppkey,
         SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS rev_c
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  GROUP BY 1, 2
),
m AS (
  SELECT s_nationkey, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
         SUM(rev_c) AS sx, SUM(rev_c * rev_c) AS sxx
  FROM per GROUP BY 1
)
SELECT CAST(s_nationkey AS BIGINT) AS nation, n_suppliers,
       ROUND(CAST(sxx AS DOUBLE) / (CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS hhi
FROM m ORDER BY nation
"""


# ---------------------------------------------------------------------------
# sa_kfold_assign — deterministic k-fold split with balance audit
# ---------------------------------------------------------------------------

_KFOLD = 5


def sa_kfold_assign(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic k-fold assignment (fold = mix(key) mod 5 from the
    portable hash family) with the per-fold balance audit — size
    share and mean target — that a CV harness checks before training.
    Completes the split family (`sa_hash_split` two-way,
    `sa_temporal_split` leakage-safe, this one k-way-with-audit);
    the assignment is a pure row-local function, reproducible across
    engines, runs, and appends."""
    o = load_table(spark, sf, "orders").select(
        "o_orderkey", SC.cents("o_totalprice").alias("x_c")
    )
    fold = ph.mix(F.col("o_orderkey") % F.lit(ph.P)) % F.lit(_KFOLD)
    per = (
        o.select(fold.alias("fold"), "x_c")
        .groupBy("fold")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("x_c").alias("sx"),
        )
    )
    tot = per.agg(F.sum("n_rows").alias("n"))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            F.col("fold").cast("bigint").alias("fold"),
            "n_rows",
            F.round(F.col("n_rows").cast("double") / F.col("n").cast("double"), 6).alias(
                "share"
            ),
            F.round(F.col("sx").cast("double") / F.col("n_rows").cast("double"), 2).alias(
                "mean_price_c"
            ),
        )
        .orderBy("fold")
    )


SA_KFOLD_SQL = f"""
WITH o AS (
  SELECT {ph.sql_mix(f"o_orderkey % {ph.P}")} % {_KFOLD} AS fold,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS x_c
  FROM orders
),
per AS (
  SELECT fold, CAST(COUNT(*) AS BIGINT) AS n_rows, SUM(x_c) AS sx FROM o GROUP BY 1
),
tot AS (SELECT SUM(n_rows) AS n FROM per)
SELECT CAST(fold AS BIGINT) AS fold, n_rows,
       ROUND(CAST(n_rows AS DOUBLE) / CAST(n AS DOUBLE), 6) AS share,
       ROUND(CAST(sx AS DOUBLE) / CAST(n_rows AS DOUBLE), 2) AS mean_price_c
FROM per CROSS JOIN tot ORDER BY fold
"""


# ---------------------------------------------------------------------------
# emb_cov_audit — embedding covariance audit (whitening diagnostics)
# ---------------------------------------------------------------------------

_COV_DIMS = 8


def emb_cov_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Covariance matrix of the first 8 embedding dimensions — the
    whitening / anisotropy diagnostic an embedding pipeline runs
    before PCA or similarity calibration (collapsed dimensions and
    correlated axes show up here).

    Components snapped to 1e-6 integer units; cross-moment sums are
    exact (DECIMAL(38,0)/HUGEINT); cov = (n·Σxy − Σx·Σy)/n² as one
    final double per cell. The (i,j) fan-out is a 36-element literal
    array explode — row-local, no join."""
    emb = load_table(spark, sf, "embeddings").select(
        F.transform(
            F.col("embedding"),
            lambda x: F.round(x.cast("double") * 1e6).cast("bigint"),
        ).alias("e")
    )
    # r11 (guide §7.3 driver-side cost, the emb_pca_power finding): the
    # 36-struct literal array was built with chained Column calls —
    # every one a py4j round-trip — making driver-side DataFrame
    # construction a measurable slice of this sub-second query. One SQL
    # string parses JVM-side with an identical plan (SQL e[i] is
    # 0-based ≡ element_at(e, i+1)); values A/B-asserted equal.
    cells = F.expr(
        "array("
        + ",".join(
            f"struct({i} as i, {j} as j, (e[{i}] * e[{j}]) as xy,"
            f" e[{i}] as x, e[{j}] as y)"
            for i in range(_COV_DIMS)
            for j in range(i, _COV_DIMS)
        )
        + ")"
    )
    ex = emb.select(F.explode(cells).alias("c")).select(
        F.col("c.i").alias("i"),
        F.col("c.j").alias("j"),
        F.col("c.xy").alias("xy"),
        F.col("c.x").alias("x"),
        F.col("c.y").alias("y"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = ex.groupBy("i", "j").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(dec("xy")).alias("sxy"),
        F.sum(dec("x")).alias("sx"),
        F.sum(dec("y")).alias("sy"),
    )
    nn = F.col("n").cast("double")
    cov = (
        (nn * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy").cast("double"))
        / (nn * nn)
        / F.lit(1e12)
    )
    return m.select(
        F.col("i").cast("bigint").alias("i"),
        F.col("j").cast("bigint").alias("j"),
        F.round(cov, 9).alias("cov"),
    ).orderBy("i", "j")


EMB_COV_SQL = f"""
WITH e AS (
  SELECT list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS s
  FROM embeddings
),
dims AS (
  SELECT i.i, j.j FROM (SELECT UNNEST(range({_COV_DIMS})) AS i) i,
                       (SELECT UNNEST(range({_COV_DIMS})) AS j) j
  WHERE i.i <= j.j
),
ex AS (
  SELECT d.i, d.j, s[d.i + 1] AS x, s[d.j + 1] AS y, s[d.i + 1] * s[d.j + 1] AS xy
  FROM e CROSS JOIN dims d
),
m AS (
  SELECT i, j, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(xy) AS sxy, SUM(x) AS sx, SUM(y) AS sy
  FROM ex GROUP BY 1, 2
)
SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
       ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) / 1e12, 9) AS cov
FROM m ORDER BY i, j
"""


# ---------------------------------------------------------------------------
# w7_record_days — running-record detection on the daily series
# ---------------------------------------------------------------------------


def w7_record_days(spark: SparkSession, sf: str) -> DataFrame:
    """Record-breaking days: days whose revenue exceeds every prior
    day — the 'new all-time high' detector (alerting, press-release
    metrics, and a classic sanity probe: a stationary series has
    ~ln(n) records; many more ⇒ trend, confirming `ts_mk_trend`).

    One day-grain running max (strictly-prior frame) + equality
    filter; integer cents throughout."""
    o = load_table(spark, sf, "orders").select(
        F.col("o_orderdate").cast("date").alias("d"),
        SC.cents("o_totalprice").alias("price_c"),
    )
    days = o.groupBy("d").agg(F.sum("price_c").alias("x_c"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, -1)
    rec = days.withColumn("prev_max", F.max("x_c").over(w)).filter(
        F.col("prev_max").isNull() | (F.col("x_c") > F.col("prev_max"))
    )
    wn = Window.orderBy("d")
    return rec.select(
        F.row_number().over(wn).cast("bigint").alias("record_no"),
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("x_c").cast("bigint").alias("revenue_c"),
        F.coalesce(F.col("prev_max"), F.lit(0)).cast("bigint").alias("prev_record_c"),
    ).orderBy("record_no")


W7_RECORD_SQL = """
WITH days AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS x_c
  FROM orders GROUP BY 1
),
r AS (
  SELECT d, x_c,
         MAX(x_c) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
  FROM days
),
rec AS (SELECT * FROM r WHERE prev_max IS NULL OR x_c > prev_max)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS record_no,
       strftime(d, '%Y-%m-%d') AS day,
       CAST(x_c AS BIGINT) AS revenue_c,
       CAST(COALESCE(prev_max, 0) AS BIGINT) AS prev_record_c
FROM rec ORDER BY record_no
"""


QUERIES = {
    "ev_session_entropy": ev_session_entropy,
    "ts_mk_trend": ts_mk_trend,
    "ag_hhi": ag_hhi,
    "sa_kfold_assign": sa_kfold_assign,
    "emb_cov_audit": emb_cov_audit,
    "w7_record_days": w7_record_days,
}

ORACLES = {
    "ev_session_entropy": EV_ENTROPY_SQL,
    "ts_mk_trend": TS_MK_SQL,
    "ag_hhi": AG_HHI_SQL,
    "sa_kfold_assign": SA_KFOLD_SQL,
    "emb_cov_audit": EMB_COV_SQL,
    "w7_record_days": W7_RECORD_SQL,
}
