"""Round-3 wave 4: distribution-drift, time-series diagnostics,
behavioural segmentation, and graph-decomposition operators — the
monitoring/analysis layer a production 100 TB corpus pipeline runs
*around* its ETL (drift gates before training-data refreshes,
changepoint alarms on ingest volume, RFM-style entity segmentation,
k-core pruning of interaction graphs).

Every query here follows the repo determinism contract
(fixture_queries module docstring): computed columns identically
aliased on both engines; doubles only as single expressions over
exactly-agreed integers (cents, micro-units) or after ROUND of
deterministically-identical inputs; cross-row double summation is
eliminated by snapping per-row contributions to integer micro units
and summing those exactly (BIGINT / DECIMAL(38,0) / HUGEINT).

Reference anchor: the reference's analytics layer is four SQL views
over a star schema (`/root/reference/sql/03_views.sql`); these
operators extend that surface in the same declarative style, per the
north-star scope (BASELINE.json).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.functions import scalar as SC
from movie_data_etl_pipeline_spark.functions import text as TX
from movie_data_etl_pipeline_spark.operators import indexing
from movie_data_etl_pipeline_spark.sources import load_table

_EPS = 1e-9  # PSI zero-bin clamp, identical literal on both engines


# ---------------------------------------------------------------------------
# qa_psi_drift — Population Stability Index per source vs corpus baseline
# ---------------------------------------------------------------------------


def qa_psi_drift(spark: SparkSession, sf: str) -> DataFrame:
    """PSI of each source's document-length distribution against the
    pooled corpus — the standard drift gate run before a training-data
    refresh (PSI > 0.25 ⇒ investigate the source).

    Determinism: per-(source, bin) PSI contributions are snapped to
    integer micro units (one ROUND of a single double expression over
    exact counts), then summed as BIGINTs — no cross-row double
    summation exists to disagree on. Zero bins are clamped at 1e-9 on
    both engines.

    Scale: two count aggregates over one scan + a broadcast of the
    (sources × bins) grid (tiny); the per-source reduce is a 6-row
    integer sum per key. No driver collect, no skew surface.
    """
    docs = load_table(spark, sf, "documents").select(
        "source", F.floor(F.col("n_chars") / F.lit(100.0)).cast("int").alias("bin")
    )
    per = docs.groupBy("source", "bin").agg(F.count(F.lit(1)).alias("n_sb"))
    src_tot = per.groupBy("source").agg(F.sum("n_sb").alias("n_s"))
    bin_tot = per.groupBy("bin").agg(F.sum("n_sb").alias("n_b"))
    n_all = per.agg(F.sum("n_sb").alias("n"))
    grid = (
        src_tot.select("source", "n_s")
        .crossJoin(F.broadcast(bin_tot.crossJoin(F.broadcast(n_all))))
        .join(per, ["source", "bin"], "left")
        .select(
            "source",
            "bin",
            "n_s",
            F.coalesce(F.col("n_sb"), F.lit(0)).alias("n_sb"),
            "n_b",
            "n",
        )
    )
    p = F.greatest(
        F.col("n_sb").cast("double") / F.col("n_s").cast("double"), F.lit(_EPS)
    )
    q = F.greatest(
        F.col("n_b").cast("double") / F.col("n").cast("double"), F.lit(_EPS)
    )
    contrib = (
        F.round(F.lit(1e6) * (p - q) * F.log(p / q)).cast("bigint").alias("c_micro")
    )
    return (
        grid.select("source", "n_s", contrib)
        .groupBy("source")
        .agg(
            F.max("n_s").cast("bigint").alias("n_docs"),
            F.round(F.sum("c_micro").cast("double") / F.lit(1e6), 6).alias("psi"),
        )
        .orderBy("source")
    )


QA_PSI_SQL = f"""
WITH d AS (
  SELECT source, CAST(FLOOR(n_chars / 100.0) AS INT) AS bin FROM documents
),
per AS (SELECT source, bin, COUNT(*) AS n_sb FROM d GROUP BY 1, 2),
src_tot AS (SELECT source, SUM(n_sb) AS n_s FROM per GROUP BY 1),
bin_tot AS (SELECT bin, SUM(n_sb) AS n_b FROM per GROUP BY 1),
n_all AS (SELECT SUM(n_sb) AS n FROM per),
grid AS (
  SELECT s.source, b.bin, s.n_s, COALESCE(p.n_sb, 0) AS n_sb, b.n_b, a.n
  FROM src_tot s CROSS JOIN bin_tot b CROSS JOIN n_all a
  LEFT JOIN per p ON p.source = s.source AND p.bin = b.bin
),
c AS (
  SELECT source, n_s,
         CAST(ROUND(1e6 * (GREATEST(CAST(n_sb AS DOUBLE) / CAST(n_s AS DOUBLE), {_EPS!r})
                           - GREATEST(CAST(n_b AS DOUBLE) / CAST(n AS DOUBLE), {_EPS!r}))
                        * LN(GREATEST(CAST(n_sb AS DOUBLE) / CAST(n_s AS DOUBLE), {_EPS!r})
                             / GREATEST(CAST(n_b AS DOUBLE) / CAST(n AS DOUBLE), {_EPS!r}))) AS BIGINT) AS c_micro
  FROM grid
)
SELECT source, CAST(MAX(n_s) AS BIGINT) AS n_docs,
       ROUND(CAST(SUM(c_micro) AS DOUBLE) / 1e6, 6) AS psi
FROM c GROUP BY source ORDER BY source
"""


# ---------------------------------------------------------------------------
# ev_rfm — recency/frequency/monetary segmentation of customers
# ---------------------------------------------------------------------------


def ev_rfm(spark: SparkSession, sf: str) -> DataFrame:
    """RFM segmentation of customers from their order history — the
    classic behavioural cut (recency of last order, order count,
    lifetime spend) quartile-coded into a 3-digit segment.

    Quartiles use the explicit rank formula ``(rn-1)*4 // n + 1``
    over a TOTAL order (metric, custkey) instead of NTILE so both
    engines agree bit-for-bit, and the rank itself comes from
    ``indexing.global_row_number`` (two-phase range numbering — the
    naive single-partition window would funnel every customer through
    one task at scale). Monetary is exact integer cents.
    """
    o = load_table(spark, sf, "orders").select(
        "o_custkey", "o_orderdate", SC.cents("o_totalprice").alias("price_c")
    )
    ref = o.agg(F.max(F.col("o_orderdate").cast("date")).alias("ref_d"))
    agg = (
        o.groupBy("o_custkey")
        .agg(
            F.max(F.col("o_orderdate").cast("date")).alias("last_d"),
            F.count(F.lit(1)).cast("bigint").alias("frequency"),
            F.sum("price_c").cast("bigint").alias("monetary_c"),
        )
        .crossJoin(F.broadcast(ref))
        .select(
            "o_custkey",
            F.datediff("ref_d", "last_d").cast("bigint").alias("recency_days"),
            "frequency",
            "monetary_c",
        )
        # r10 (guide §1.2): the count action below AND the first rank
        # pipeline both consumed the lazy lineage — the orders scan +
        # custkey aggregation ran twice. Materialize once; the three
        # chained rank passes each re-checkpoint anyway.
        .localCheckpoint(eager=True)
    )
    n = agg.count()  # driver-side scalar of a count aggregate (bounded)

    # r11 (guide §2.4 — remove shuffles): the three per-metric quartile
    # passes each ran the full two-phase numbering machinery (range
    # exchange + checkpoint + partition-totals prefix + broadcast
    # attach), three of everything over the same customer relation.
    # Melt the metrics into (m, s) rows — m 0/1/2, s the metric value
    # under its ranking sign (frequency/monetary negated, exactly the
    # old neg_f/neg_m sort keys) — and rank ONCE under the total order
    # (m, s, o_custkey). Every metric block holds exactly n rows (one
    # per customer), so the within-metric rank is rn − m·n and the
    # quartile formula is unchanged; a hash pivot back to customer
    # grain replaces two of the three range pipelines. Values are
    # bit-identical: same per-metric total order, same (rn−1)·4/n
    # integer cut, and the metric values ride the melt (s / −s), so no
    # join back to `agg` is needed.
    melted = agg.select(
        "o_custkey",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("m"), F.col("recency_days").alias("s")),
                F.struct(F.lit(1).alias("m"), (-F.col("frequency")).alias("s")),
                F.struct(F.lit(2).alias("m"), (-F.col("monetary_c")).alias("s")),
            )
        ).alias("x"),
    ).select("o_custkey", "x.m", "x.s")
    ranked = indexing.global_row_number(melted, ["m", "s", "o_custkey"], out_col="__rn")
    q = ranked.withColumn(
        "q",
        ((F.col("__rn") - 1 - F.col("m") * F.lit(n)) * 4 / F.lit(n)).cast("bigint")
        + 1,
    )
    pivoted = q.groupBy("o_custkey").agg(
        F.max(F.when(F.col("m") == 0, F.col("s"))).alias("recency_days"),
        F.max(F.when(F.col("m") == 1, -F.col("s"))).alias("frequency"),
        F.max(F.when(F.col("m") == 2, -F.col("s"))).alias("monetary_c"),
        F.max(F.when(F.col("m") == 0, F.col("q"))).alias("r_q"),
        F.max(F.when(F.col("m") == 1, F.col("q"))).alias("f_q"),
        F.max(F.when(F.col("m") == 2, F.col("q"))).alias("m_q"),
    )
    return pivoted.select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary_c",
        "r_q",
        "f_q",
        "m_q",
        F.concat(
            F.col("r_q").cast("string"),
            F.col("f_q").cast("string"),
            F.col("m_q").cast("string"),
        ).alias("segment"),
    ).orderBy("o_custkey")


EV_RFM_SQL = """
WITH o AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_c
  FROM orders
),
ref AS (SELECT MAX(d) AS ref_d FROM o),
agg AS (
  SELECT o_custkey,
         date_diff('day', MAX(d), (SELECT ref_d FROM ref)) AS recency_days,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         CAST(SUM(price_c) AS BIGINT) AS monetary_c
  FROM o GROUP BY o_custkey
),
n AS (SELECT COUNT(*) AS n FROM agg),
r AS (
  SELECT a.*,
         ROW_NUMBER() OVER (ORDER BY recency_days, o_custkey) AS rn_r,
         ROW_NUMBER() OVER (ORDER BY frequency DESC, o_custkey) AS rn_f,
         ROW_NUMBER() OVER (ORDER BY monetary_c DESC, o_custkey) AS rn_m
  FROM agg a
)
SELECT o_custkey, CAST(recency_days AS BIGINT) AS recency_days, frequency, monetary_c,
       (rn_r - 1) * 4 // n + 1 AS r_q,
       (rn_f - 1) * 4 // n + 1 AS f_q,
       (rn_m - 1) * 4 // n + 1 AS m_q,
       CAST((rn_r - 1) * 4 // n + 1 AS VARCHAR) ||
       CAST((rn_f - 1) * 4 // n + 1 AS VARCHAR) ||
       CAST((rn_m - 1) * 4 // n + 1 AS VARCHAR) AS segment
FROM r CROSS JOIN n
ORDER BY o_custkey
"""


# ---------------------------------------------------------------------------
# ts_acf — autocorrelation of the daily-revenue series at lags 1..7
# ---------------------------------------------------------------------------


def _daily_revenue(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders").select(
        F.col("o_orderdate").cast("date").alias("d"),
        SC.cents("o_totalprice").alias("price_c"),
    )
    return o.groupBy("d").agg(F.sum("price_c").alias("x_c")).select(
        F.datediff("d", F.lit("1970-01-01").cast("date")).alias("idx"),
        "d",
        "x_c",
    )


def ts_acf(spark: SparkSession, sf: str) -> DataFrame:
    """Autocorrelation function of daily order revenue at lags 1–7 —
    the seasonality probe behind ingest-volume monitors (a weekly
    cycle shows as a lag-7 spike).

    Pearson r per lag over (x_t, x_{t+lag}) pairs, moments summed as
    DECIMAL(38,0) / HUGEINT over exact integer cents (order-free),
    with the double arithmetic confined to one final expression per
    lag row. The lag shift is an equi-join on the integer day index —
    at scale a range-partitioned co-located join, never a window.
    """
    days = _daily_revenue(spark, sf)
    lags = spark.range(1, 8).select(F.col("id").cast("int").alias("lag"))
    a = days.select("idx", F.col("x_c").alias("x"))
    b = days.select(F.col("idx").alias("idx2"), F.col("x_c").alias("y"))
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("idx2") == F.col("idx") + F.col("lag"))
        .select("lag", "x", "y")
    )
    m = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(dec("x")).alias("sx"),
        F.sum(dec("y")).alias("sy"),
        F.sum(dec("x") * dec("y")).alias("sxy"),
        F.sum(dec("x") * dec("x")).alias("sxx"),
        F.sum(dec("y") * dec("y")).alias("syy"),
    )
    dd = lambda c: F.col(c).cast("double")  # noqa: E731
    nn = dd("n_pairs")
    num = nn * dd("sxy") - dd("sx") * dd("sy")
    den = F.sqrt(
        (nn * dd("sxx") - dd("sx") * dd("sx"))
        * (nn * dd("syy") - dd("sy") * dd("sy"))
    )
    return m.select(
        F.col("lag").cast("bigint").alias("lag"),
        "n_pairs",
        F.round(num / den, 6).alias("acf"),
    ).orderBy("lag")


TS_ACF_SQL = """
WITH days AS (
  SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS idx,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS x_c
  FROM orders GROUP BY 1
),
lags AS (SELECT UNNEST(range(1, 8)) AS lag),
pairs AS (
  SELECT l.lag, a.x_c AS x, b.x_c AS y
  FROM days a CROSS JOIN lags l JOIN days b ON b.idx = a.idx + l.lag
),
m AS (
  SELECT lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
         SUM(x * x) AS sxx, SUM(y * y) AS syy
  FROM pairs GROUP BY lag
)
SELECT CAST(lag AS BIGINT) AS lag, n_pairs,
       ROUND((CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / SQRT((CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS acf
FROM m ORDER BY lag
"""


# ---------------------------------------------------------------------------
# ts_cusum — changepoint candidates on the daily-revenue series
# ---------------------------------------------------------------------------


def ts_cusum(spark: SparkSession, sf: str) -> DataFrame:
    """CUSUM changepoint scan over daily revenue: the statistic
    ``T_t = n·prefix_t − t·total`` (an integer-exact rescaling of the
    classic cumulative deviation from the mean) peaks at the most
    likely mean shift. Emits the top-5 |T| days with the before/after
    means — what an ingest-volume alarm pages on.

    All ranking state is exact BIGINT; doubles appear only in the
    final scaled/rounded display columns. The prefix sum is a
    day-grain window (the series is one row per day — tiny even at
    100 TB of raw events; the heavy reduction happened in the
    upstream groupBy)."""
    days = _daily_revenue(spark, sf).select("d", "x_c")
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    tot = days.agg(
        F.count(F.lit(1)).alias("n"), F.sum("x_c").alias("total_c")
    )
    pre = (
        days.withColumn("prefix_c", F.sum("x_c").over(w))
        .withColumn("t", F.row_number().over(Window.orderBy("d")))
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "t_stat", F.col("n") * F.col("prefix_c") - F.col("t") * F.col("total_c")
        )
    )
    ranked = pre.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.abs(F.col("t_stat")).desc(), F.col("d"))),
    ).filter(F.col("rank") <= 5)
    return ranked.select(
        F.col("rank").cast("bigint").alias("rank"),
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.round(F.col("t_stat").cast("double") / F.col("n").cast("double"), 2).alias(
            "cusum_c"
        ),
        F.round(
            F.col("prefix_c").cast("double") / F.col("t").cast("double"), 2
        ).alias("mean_before_c"),
        F.when(
            F.col("t") < F.col("n"),
            F.round(
                (F.col("total_c") - F.col("prefix_c")).cast("double")
                / (F.col("n") - F.col("t")).cast("double"),
                2,
            ),
        ).alias("mean_after_c"),
    ).orderBy("rank")


TS_CUSUM_SQL = """
WITH days AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS x_c
  FROM orders GROUP BY 1
),
tot AS (SELECT COUNT(*) AS n, SUM(x_c) AS total_c FROM days),
pre AS (
  SELECT d, x_c,
         SUM(x_c) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prefix_c,
         ROW_NUMBER() OVER (ORDER BY d) AS t
  FROM days
),
st AS (
  SELECT p.*, t2.n, t2.total_c, t2.n * p.prefix_c - p.t * t2.total_c AS t_stat
  FROM pre p CROSS JOIN tot t2
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY ABS(t_stat) DESC, d) AS rank FROM st
)
SELECT CAST(rank AS BIGINT) AS rank, strftime(d, '%Y-%m-%d') AS day,
       ROUND(CAST(t_stat AS DOUBLE) / CAST(n AS DOUBLE), 2) AS cusum_c,
       ROUND(CAST(prefix_c AS DOUBLE) / CAST(t AS DOUBLE), 2) AS mean_before_c,
       CASE WHEN t < n THEN ROUND(CAST(total_c - prefix_c AS DOUBLE)
                                  / CAST(n - t AS DOUBLE), 2) END AS mean_after_c
FROM ranked WHERE rank <= 5 ORDER BY rank
"""


# ---------------------------------------------------------------------------
# qa_chi2 — chi-square independence screen on two categorical columns
# ---------------------------------------------------------------------------


def qa_chi2(spark: SparkSession, sf: str) -> DataFrame:
    """Chi-square independence screen between order priority and
    status — the categorical-drift / broken-join detector (a feed
    that suddenly couples two independent dimensions shows up here).

    Cell contributions ``(n·obs − rt·ct)² / (n·rt·ct)`` are computed
    from exact counts, snapped to micro units, and the statistic is
    their exact integer sum — reported identically on every cell row.
    One scan, one tiny contingency aggregate.

    Overflow discipline (round-7 30x error sweep caught the int64
    form faulting under ANSI): ``num = n·obs − rt·ct`` and the
    denominator ``n·rt·ct`` are computed in DECIMAL(38,0) — exact to
    ~1e38, covering n up to ~1.5e10 rows (n·rt·ct ≤ n³ ≈ 3e30) — and
    ``num²`` is an IEEE double product of the exactly-converted num.
    Value parity with the int64 form everywhere num < 2⁵³: num is then
    exactly representable, so the IEEE product equals the correctly
    rounded exact square — bit-identical to squaring in integers and
    casting, which is what the DuckDB twin does."""
    o = load_table(spark, sf, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderstatus").alias("status"),
    )
    cells = o.groupBy("priority", "status").agg(F.count(F.lit(1)).alias("n_obs"))
    rt = cells.groupBy("priority").agg(F.sum("n_obs").alias("row_tot"))
    ct = cells.groupBy("status").agg(F.sum("n_obs").alias("col_tot"))
    n = cells.agg(F.sum("n_obs").alias("n"))
    j = (
        cells.join(F.broadcast(rt), "priority")
        .join(F.broadcast(ct), "status")
        .crossJoin(F.broadcast(n))
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    num = (dec("n") * dec("n_obs") - dec("row_tot") * dec("col_tot")).cast("double")
    contrib_micro = F.round(
        F.lit(1e6)
        * (num * num)
        / (dec("n") * dec("row_tot") * dec("col_tot")).cast("double")
    ).cast("bigint")
    per = j.select(
        "priority",
        "status",
        F.col("n_obs").cast("bigint").alias("n_obs"),
        F.round(
            (dec("row_tot") * dec("col_tot")).cast("double")
            / F.col("n").cast("double"),
            3,
        ).alias("expected"),
        contrib_micro.alias("c_micro"),
    )
    total = per.agg(F.sum("c_micro").alias("chi2_micro"))
    return (
        per.crossJoin(F.broadcast(total))
        .select(
            "priority",
            "status",
            "n_obs",
            "expected",
            F.round(F.col("c_micro").cast("double") / F.lit(1e6), 6).alias("contrib"),
            F.round(F.col("chi2_micro").cast("double") / F.lit(1e6), 6).alias("chi2"),
        )
        .orderBy("priority", "status")
    )


QA_CHI2_SQL = """
WITH cells AS (
  SELECT o_orderpriority AS priority, o_orderstatus AS status, COUNT(*) AS n_obs
  FROM orders GROUP BY 1, 2
),
rt AS (SELECT priority, SUM(n_obs) AS row_tot FROM cells GROUP BY 1),
ct AS (SELECT status, SUM(n_obs) AS col_tot FROM cells GROUP BY 1),
nt AS (SELECT SUM(n_obs) AS n FROM cells),
per AS (
  SELECT c.priority, c.status, CAST(c.n_obs AS BIGINT) AS n_obs,
         ROUND(CAST(r.row_tot * t.col_tot AS DOUBLE) / CAST(nt.n AS DOUBLE), 3) AS expected,
         CAST(ROUND(1e6 * CAST((nt.n * c.n_obs - r.row_tot * t.col_tot)
                                * (nt.n * c.n_obs - r.row_tot * t.col_tot) AS DOUBLE)
                        / CAST(nt.n * r.row_tot * t.col_tot AS DOUBLE)) AS BIGINT) AS c_micro
  FROM cells c JOIN rt r ON c.priority = r.priority
  JOIN ct t ON c.status = t.status CROSS JOIN nt
),
tot AS (SELECT SUM(c_micro) AS chi2_micro FROM per)
SELECT priority, status, n_obs, expected,
       ROUND(CAST(c_micro AS DOUBLE) / 1e6, 6) AS contrib,
       ROUND(CAST(chi2_micro AS DOUBLE) / 1e6, 6) AS chi2
FROM per CROSS JOIN tot
ORDER BY priority, status
"""


# ---------------------------------------------------------------------------
# tx_zipf_fit — log-log OLS fit of the token rank-frequency curve
# ---------------------------------------------------------------------------

_ZIPF_K = 500


def tx_zipf_fit(spark: SparkSession, sf: str) -> DataFrame:
    """Zipf's-law fit over the corpus: OLS of ln(freq) on ln(rank)
    for the top-500 tokens. A natural-language corpus sits near slope
    −1; templated/generated text drifts toward 0 — a one-number
    corpus-health signal.

    ln(rank) and ln(freq) are snapped to integer micro units per row;
    the five OLS moments are then exact integer sums (DECIMAL(38,0) /
    HUGEINT), and slope/intercept/R² are single double expressions of
    those exact sums. Top-K + rank over 500 rows is driver-light; the
    vocabulary count itself is the only big reduce."""
    docs = load_table(spark, sf, "documents")
    toks = docs.select(F.explode(TX.tokens("text")).alias("token"))
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    top = counts.orderBy(F.desc("n"), F.asc("token")).limit(_ZIPF_K)
    ranked = top.withColumn(
        "rn", F.row_number().over(Window.orderBy(F.desc("n"), F.asc("token")))
    )
    xm = F.round(F.lit(1e6) * F.log(F.col("rn").cast("double"))).cast("bigint")
    ym = F.round(F.lit(1e6) * F.log(F.col("n").cast("double"))).cast("bigint")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = ranked.select(xm.alias("xm"), ym.alias("ym")).agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum(dec(F.col("xm"))).alias("sx"),
        F.sum(dec(F.col("ym"))).alias("sy"),
        F.sum(dec(F.col("xm")) * dec(F.col("ym"))).alias("sxy"),
        F.sum(dec(F.col("xm")) * dec(F.col("xm"))).alias("sxx"),
        F.sum(dec(F.col("ym")) * dec(F.col("ym"))).alias("syy"),
    )
    dd = lambda c: F.col(c).cast("double")  # noqa: E731
    kk = dd("k")
    cov = kk * dd("sxy") - dd("sx") * dd("sy")
    varx = kk * dd("sxx") - dd("sx") * dd("sx")
    vary = kk * dd("syy") - dd("sy") * dd("sy")
    slope = cov / varx
    return m.select(
        F.col("k"),
        F.round(slope, 6).alias("slope"),
        F.round((dd("sy") - slope * dd("sx")) / kk / F.lit(1e6), 6).alias("intercept"),
        F.round(cov * cov / (varx * vary), 6).alias("r2"),
    )


TX_ZIPF_SQL = f"""
WITH toks AS (
  SELECT UNNEST(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS token
  FROM documents
),
counts AS (SELECT token, COUNT(*) AS n FROM toks GROUP BY 1),
top AS (SELECT token, n FROM counts ORDER BY n DESC, token LIMIT {_ZIPF_K}),
ranked AS (
  SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, token) AS rn FROM top
),
mic AS (
  SELECT CAST(ROUND(1e6 * LN(CAST(rn AS DOUBLE))) AS BIGINT) AS xm,
         CAST(ROUND(1e6 * LN(CAST(n AS DOUBLE))) AS BIGINT) AS ym
  FROM ranked
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k, SUM(xm) AS sx, SUM(ym) AS sy,
         SUM(xm * ym) AS sxy, SUM(xm * xm) AS sxx, SUM(ym * ym) AS syy
  FROM mic
)
SELECT k,
       ROUND((CAST(k AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(k AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS slope,
       ROUND((CAST(sy AS DOUBLE)
              - (CAST(k AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                / (CAST(k AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * CAST(sx AS DOUBLE)) / CAST(k AS DOUBLE) / 1e6, 6) AS intercept,
       ROUND((CAST(k AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             * (CAST(k AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / ((CAST(k AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * (CAST(k AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS r2
FROM m
"""


# ---------------------------------------------------------------------------
# gr_kcore — k-core peeling of the supplier–part interaction graph
# ---------------------------------------------------------------------------

_KCORE_ROUNDS = 3


def gr_kcore(spark: SparkSession, sf: str) -> DataFrame:
    """k-core peeling (3 unrolled rounds) of the bipartite
    supplier–part graph — the standard dense-subgraph filter before
    community detection or fraud-ring mining (nodes that survive
    interact with ≥k surviving partners).

    k is DATA-ADAPTIVE: the lower-quartile degree of the initial
    graph, read off the degree HISTOGRAM (cumulative window at
    distinct-degree grain — bounded, never per-node), so the peel
    bites at every scale factor instead of emptying small graphs or
    no-op'ing large ones; the 1-row k relation is broadcast into
    each round's HAVING.

    Each round is degree-count → HAVING → two semi-joins: pure
    equi-join/aggregate territory, shuffling only on node ids. The
    round count is a fixed unroll (matching the SQL oracle); a
    production full peel iterates the same step with a convergence
    aggregate, exactly like ``dedup.duplicate_clusters``."""
    # internal node ids are LONGS (suppliers even 2s, parts odd 2p+1 —
    # the graph_edges encoding): every peel round shuffles/aggregates
    # the adjacency 4+ times, and fixed-width int64 keys beat ~6-char
    # strings on every one of those exchanges. The public "s123"/"p456"
    # labels are rendered once at the end — output values unchanged.
    li = load_table(spark, sf, "lineitem").select(
        (F.col("l_suppkey").cast("bigint") * 2).alias("u"),
        (F.col("l_partkey").cast("bigint") * 2 + 1).alias("v"),
    ).distinct()
    adj = (
        li.select(F.col("u").alias("node"), F.col("v").alias("nbr"))
        .unionAll(li.select(F.col("v").alias("node"), F.col("u").alias("nbr")))
        # lineage truncation per round (the graph.pagerank discipline):
        # without it each round re-derives every prior round twice (the
        # degree branch AND the semi-join branch), ~3^rounds blowup —
        # measured 8.6 s -> checkpointed cost at sf0.1.
        .localCheckpoint(eager=True)
    )
    hist = (
        adj.groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
        .groupBy("deg")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    nn = hist.agg(F.sum("c").alias("nn"))
    wcum = Window.orderBy("deg").rowsBetween(Window.unboundedPreceding, 0)
    krel = (
        hist.select("deg", F.sum("c").over(wcum).alias("cc"))
        .crossJoin(F.broadcast(nn))
        .filter(F.col("cc") * 4 >= F.col("nn"))
        .agg(F.min("deg").alias("k"))
        # 1 row; truncate so the three rounds don't replay the
        # histogram derivation
        .localCheckpoint(eager=True)
    )
    for _ in range(_KCORE_ROUNDS):
        alive = (
            adj.groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
            .crossJoin(F.broadcast(krel))
            .filter(F.col("deg") >= F.col("k"))
            .select("node")
        )
        adj = (
            adj.join(alive, "node", "left_semi")
            .join(alive.select(F.col("node").alias("nbr")), "nbr", "left_semi")
            .localCheckpoint(eager=True)
        )
    return (
        adj.groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
        .select(
            # shiftright is exact integer division by 2 for both
            # parities (even: n/2; odd: (n-1)/2) — a float `/ 2` is
            # exact only below 2^53 and would render a wrong label
            # silently for larger encoded keys (ADVICE-r6)
            F.when(
                F.col("node") % 2 == 0,
                F.concat(F.lit("s"), F.shiftright("node", 1).cast("string")),
            )
            .otherwise(
                F.concat(F.lit("p"), F.shiftright("node", 1).cast("string"))
            )
            .alias("node"),
            "degree",
        )
        .orderBy(F.desc("degree"), F.asc("node"))
    )


def _kcore_round(i: int) -> str:
    return f"""
alive{i} AS (
  SELECT node FROM adj{i} GROUP BY node
  HAVING COUNT(*) >= (SELECT k FROM kk)
),
adj{i + 1} AS (
  SELECT a.node, a.nbr FROM adj{i} a
  JOIN alive{i} x ON a.node = x.node
  JOIN alive{i} y ON a.nbr = y.node
)"""


GR_KCORE_SQL = (
    """
WITH e0 AS (
  SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS u,
                  'p' || CAST(l_partkey AS VARCHAR) AS v
  FROM lineitem
),
adj0 AS (
  SELECT u AS node, v AS nbr FROM e0
  UNION ALL
  SELECT v AS node, u AS nbr FROM e0
),
d0 AS (SELECT node, COUNT(*) AS deg FROM adj0 GROUP BY node),
h AS (SELECT deg, COUNT(*) AS c FROM d0 GROUP BY deg),
nq AS (SELECT CAST(SUM(c) AS BIGINT) AS nn FROM h),
cum AS (SELECT deg, CAST(SUM(c) OVER (ORDER BY deg) AS BIGINT) AS cc FROM h),
kk AS (SELECT MIN(deg) AS k FROM cum, nq WHERE cc * 4 >= nn),"""
    + ",".join(_kcore_round(i) for i in range(_KCORE_ROUNDS))
    + f"""
SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
FROM adj{_KCORE_ROUNDS} GROUP BY node ORDER BY degree DESC, node
"""
)


# ---------------------------------------------------------------------------
# ev_markov_reach — k-step conversion reachability from the transition chain
# ---------------------------------------------------------------------------

_REACH_TARGET = "purchase"


def ev_markov_reach(spark: SparkSession, sf: str) -> DataFrame:
    """First-order Markov reachability: P(hit 'purchase' within 1, 2,
    3 steps | current event type), from per-user consecutive-event
    transitions — the model-free upper bound a funnel-optimization
    team asks for before building anything fancier.

    The recurrence q_{t+1}(a) = q_1(a) + Σ_{b≠T} p(a,b)·q_t(b) is
    evaluated with probabilities snapped to integer nano units at
    every step (ROUND of a single double over exact counts), so both
    engines iterate in integer lockstep. Transitions come from one
    per-user lead() window — key-partitioned, no global sort."""
    ev = load_table(spark, sf, "events").select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("nxt", F.lead("event_type").over(w))
        .filter(F.col("nxt").isNotNull())
        .groupBy(F.col("event_type").alias("a"), F.col("nxt").alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    r = pairs.groupBy("a").agg(F.sum("c").alias("r_tot"))
    tgt = pairs.filter(F.col("b") == _REACH_TARGET).select("a", F.col("c").alias("c_t"))
    q1 = (
        r.join(tgt, "a", "left")
        .select(
            "a",
            "r_tot",
            F.round(
                F.lit(1e9)
                * F.coalesce(F.col("c_t"), F.lit(0)).cast("double")
                / F.col("r_tot").cast("double")
            )
            .cast("bigint")
            .alias("q1n"),
        )
    )

    def step(qprev: DataFrame, out: str) -> DataFrame:
        inner = (
            pairs.filter(F.col("b") != _REACH_TARGET)
            .join(qprev.select(F.col("a").alias("b"), F.col(qprev.columns[-1]).alias("qb")), "b")
            .groupBy("a")
            .agg(F.sum(F.col("c") * F.col("qb")).alias("acc"))
        )
        return (
            q1.join(inner, "a", "left")
            .select(
                "a",
                "r_tot",
                "q1n",
                (
                    F.col("q1n")
                    + F.round(
                        F.coalesce(F.col("acc"), F.lit(0)).cast("double")
                        / F.col("r_tot").cast("double")
                    ).cast("bigint")
                ).alias(out),
            )
        )

    q2 = step(q1, "q2n")
    q3 = step(q2.select("a", "q2n"), "q3n").join(q2.select("a", "q2n"), "a")
    return (
        q3.select(
            F.col("a").alias("event_type"),
            F.col("r_tot").cast("bigint").alias("n_transitions"),
            F.round(F.col("q1n").cast("double") / F.lit(1e9), 6).alias("p1"),
            F.round(F.col("q2n").cast("double") / F.lit(1e9), 6).alias("p2"),
            F.round(F.col("q3n").cast("double") / F.lit(1e9), 6).alias("p3"),
        )
        .orderBy("event_type")
    )


EV_MARKOV_SQL = f"""
WITH seq AS (
  SELECT event_type AS a,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS b
  FROM events
),
pairs AS (SELECT a, b, COUNT(*) AS c FROM seq WHERE b IS NOT NULL GROUP BY 1, 2),
r AS (SELECT a, SUM(c) AS r_tot FROM pairs GROUP BY 1),
q1 AS (
  SELECT r.a, r.r_tot,
         CAST(ROUND(1e9 * CAST(COALESCE(t.c, 0) AS DOUBLE) / CAST(r.r_tot AS DOUBLE)) AS BIGINT) AS q1n
  FROM r LEFT JOIN (SELECT a, c FROM pairs WHERE b = '{_REACH_TARGET}') t ON r.a = t.a
),
s2 AS (
  SELECT p.a, SUM(p.c * q.q1n) AS acc
  FROM pairs p JOIN q1 q ON p.b = q.a
  WHERE p.b <> '{_REACH_TARGET}' GROUP BY p.a
),
q2 AS (
  SELECT q1.a, q1.r_tot, q1.q1n,
         q1.q1n + CAST(ROUND(CAST(COALESCE(s2.acc, 0) AS DOUBLE) / CAST(q1.r_tot AS DOUBLE)) AS BIGINT) AS q2n
  FROM q1 LEFT JOIN s2 ON q1.a = s2.a
),
s3 AS (
  SELECT p.a, SUM(p.c * q.q2n) AS acc
  FROM pairs p JOIN q2 q ON p.b = q.a
  WHERE p.b <> '{_REACH_TARGET}' GROUP BY p.a
),
q3 AS (
  SELECT q1.a, q1.r_tot, q1.q1n,
         (SELECT q2n FROM q2 WHERE q2.a = q1.a) AS q2n,
         q1.q1n + CAST(ROUND(CAST(COALESCE(s3.acc, 0) AS DOUBLE) / CAST(q1.r_tot AS DOUBLE)) AS BIGINT) AS q3n
  FROM q1 LEFT JOIN s3 ON q1.a = s3.a
)
SELECT a AS event_type, CAST(r_tot AS BIGINT) AS n_transitions,
       ROUND(CAST(q1n AS DOUBLE) / 1e9, 6) AS p1,
       ROUND(CAST(q2n AS DOUBLE) / 1e9, 6) AS p2,
       ROUND(CAST(q3n AS DOUBLE) / 1e9, 6) AS p3
FROM q3 ORDER BY event_type
"""


QUERIES = {
    "qa_psi_drift": qa_psi_drift,
    "ev_rfm": ev_rfm,
    "ts_acf": ts_acf,
    "ts_cusum": ts_cusum,
    "qa_chi2": qa_chi2,
    "tx_zipf_fit": tx_zipf_fit,
    "gr_kcore": gr_kcore,
    "ev_markov_reach": ev_markov_reach,
}

ORACLES = {
    "qa_psi_drift": QA_PSI_SQL,
    "ev_rfm": EV_RFM_SQL,
    "ts_acf": TS_ACF_SQL,
    "ts_cusum": TS_CUSUM_SQL,
    "qa_chi2": QA_CHI2_SQL,
    "tx_zipf_fit": TX_ZIPF_SQL,
    "gr_kcore": GR_KCORE_SQL,
    "ev_markov_reach": EV_MARKOV_SQL,
}

# math import is used only to keep parity with sibling modules that
# price constants in Python; silence linters if unused.
_ = math
