"""Round-3 wave 8: classical time-series decomposition, M4
visual-fidelity downsampling, audience-overlap measurement, cohort
LTV curves, zone-map data-skipping estimation, and schema-evolving
upsert — the serving/curation layer on top of the monitoring stack
built in waves 4–7.

Determinism contract unchanged from the earlier waves: every
cross-row reduction carries exact integer state (counts, cents,
7×-scaled trend numerators); each output value is produced by ONE
final IEEE double expression evaluated identically by Spark and the
DuckDB oracle, then ROUND(·, 6) for rendering.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.functions import scalar as SC
from movie_data_etl_pipeline_spark.operators import merge
from movie_data_etl_pipeline_spark.sources import load_table


# ---------------------------------------------------------------------------
# ts_decompose — additive trend/seasonal/residual decomposition
# ---------------------------------------------------------------------------


def ts_decompose(spark: SparkSession, sf: str) -> DataFrame:
    """Classical additive decomposition of the daily event-count
    series: trend = 7-day centered moving average (full windows
    only), seasonal = per-weekday mean of the detrended series,
    residual = observed − trend − seasonal.

    Exactness: the trend numerator is kept as the INTEGER 7-day sum
    ``s7`` (trend = s7/7), the detrended value as the integer
    ``7·cnt − s7``, and the weekday means as integer-sum / count —
    so residual = (7·nw·cnt − nw·s7 − sd) / (7·nw) is a single
    double division of exact integers. Weekday key = epoch-day mod 7
    (engine-portable; no locale-dependent DOW numbering).

    Scale: one event→day aggregation is the only fact-grain shuffle;
    the centered window and the weekday join both run at DAY grain
    (bounded relation — the sanctioned global-window exemption), and
    the 7-row weekday index is a broadcast join back. On a sparse
    calendar run `ts_gapfill` first; the ROWS window assumes a dense
    day series."""
    ev = load_table(spark, sf, "events").select(F.to_date("ts").alias("d"))
    daily = ev.groupBy("d").agg(F.count(F.lit(1)).alias("cnt"))
    w7 = Window.orderBy("d").rowsBetween(-3, 3)
    base = daily.select(
        "d",
        "cnt",
        F.sum("cnt").over(w7).alias("s7"),
        F.count(F.lit(1)).over(w7).alias("n7"),
        (F.datediff(F.col("d"), F.lit("1970-01-01").cast("date")) % 7).alias("wd"),
    )
    detr7 = 7 * F.col("cnt") - F.col("s7")
    seas = (
        base.filter(F.col("n7") == 7)
        .groupBy("wd")
        .agg(F.sum(detr7).alias("sd"), F.count(F.lit(1)).alias("nw"))
    )
    full = F.col("n7") == 7
    num = 7 * F.col("nw") * F.col("cnt") - F.col("nw") * F.col("s7") - F.col("sd")
    return (
        base.join(F.broadcast(seas), "wd")
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "cnt",
            F.when(full, F.round(F.col("s7") / F.lit(7.0), 6)).alias("trend"),
            F.round(F.col("sd") / (7.0 * F.col("nw")), 6).alias("seasonal"),
            F.when(full, F.round(num / (7.0 * F.col("nw")), 6)).alias("resid"),
        )
        .orderBy("day")
    )


_TS_DECOMPOSE_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, COUNT(*) AS cnt FROM events GROUP BY 1
),
b AS (
  SELECT d, cnt,
         SUM(cnt) OVER w AS s7,
         COUNT(*) OVER w AS n7,
         CAST(d - DATE '1970-01-01' AS INTEGER) % 7 AS wd
  FROM daily
  WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
seas AS (
  SELECT wd, SUM(7 * cnt - s7) AS sd, COUNT(*) AS nw
  FROM b WHERE n7 = 7 GROUP BY wd
)
SELECT strftime(b.d, '%Y-%m-%d') AS day,
       b.cnt,
       CASE WHEN n7 = 7 THEN ROUND(CAST(s7 AS DOUBLE) / 7.0, 6) END AS trend,
       ROUND(CAST(sd AS DOUBLE) / (7.0 * nw), 6) AS seasonal,
       CASE WHEN n7 = 7
            THEN ROUND(CAST(7 * nw * cnt - nw * s7 - sd AS DOUBLE) / (7.0 * nw), 6)
       END AS resid
FROM b JOIN seas USING (wd)
"""


# ---------------------------------------------------------------------------
# ts_m4_downsample — min/max/first/last per time bucket
# ---------------------------------------------------------------------------


def ts_m4_downsample(spark: SparkSession, sf: str) -> DataFrame:
    """M4 downsampling (Jugel et al., VLDB 2014): per hourly bucket
    keep exactly the four value extremes a pixel-perfect line
    rendering needs — min, max, first, last — in snapped cents.
    This is how a time-series store serves a 100 TB series to a
    dashboard without shipping the raw points.

    first/last are made deterministic by the total order
    ``(ts, event_id)`` (timestamps can collide; the key cannot); the
    full-frame window is PARTITIONED by bucket, so per-task state is
    one bucket's rows, never the series. One shuffle on the bucket
    key, then a map-side-combinable groupBy on the same key."""
    ev = load_table(spark, sf, "events").select(
        F.date_trunc("hour", "ts").alias("h"),
        "ts",
        "event_id",
        SC.cents("value").alias("vc"),
    )
    wf = (
        Window.partitionBy("h")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        ev.select(
            "h",
            "vc",
            F.first("vc").over(wf).alias("v_first_c"),
            F.last("vc").over(wf).alias("v_last_c"),
        )
        .groupBy("h", "v_first_c", "v_last_c")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("vc").alias("v_min_c"),
            F.max("vc").alias("v_max_c"),
        )
        .select(
            F.date_format("h", "yyyy-MM-dd HH:00").alias("hour"),
            "n",
            "v_min_c",
            "v_max_c",
            "v_first_c",
            "v_last_c",
        )
        .orderBy("hour")
    )


_TS_M4_SQL = """
WITH ev AS (
  SELECT date_trunc('hour', ts) AS h, ts, event_id,
         CAST(ROUND(value * 100) AS BIGINT) AS vc
  FROM events
),
w AS (
  SELECT h, vc,
         FIRST_VALUE(vc) OVER win AS v_first_c,
         LAST_VALUE(vc)  OVER win AS v_last_c
  FROM ev
  WINDOW win AS (PARTITION BY h ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
)
SELECT strftime(h, '%Y-%m-%d %H:00') AS hour,
       COUNT(*) AS n,
       MIN(vc) AS v_min_c,
       MAX(vc) AS v_max_c,
       v_first_c,
       v_last_c
FROM w
GROUP BY h, v_first_c, v_last_c
"""


# ---------------------------------------------------------------------------
# ev_audience_overlap — pairwise event-type audience Jaccard
# ---------------------------------------------------------------------------


def ev_audience_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """Exact audience overlap for every event-type pair: |users doing
    both| and the Jaccard |A∩B| / |A∪B| — the audience-segmentation
    twin of `ap_kmv_jaccard` (which estimates the same quantity from
    mergeable sketches when the exact distinct join is too dear).

    Scale: the intersection join shuffles the DISTINCT (type, user)
    relation on user_id; per-user join fan-out is bounded by the
    type-domain size squared (a catalog constant, not data-driven).
    The pair skeleton is sizes × sizes — type-domain² metadata grain,
    the sanctioned bounded-relation cross — so zero-overlap pairs
    still appear with inter = 0."""
    aud = load_table(spark, sf, "events").select("event_type", "user_id").distinct()
    sz = aud.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        aud.alias("a")
        .join(
            aud.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    pairs = (
        sz.alias("x")
        .select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
        .join(
            F.broadcast(
                sz.alias("y").select(
                    F.col("event_type").alias("type_b"), F.col("n").alias("n_b")
                )
            ),
            F.col("type_a") < F.col("type_b"),
        )
    )
    uni = F.col("n_a") + F.col("n_b") - F.col("inter")
    return (
        pairs.join(inter, ["type_a", "type_b"], "left")
        .withColumn("inter", F.coalesce("inter", F.lit(0)))
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            "inter",
            F.round(F.col("inter") / uni.cast("double"), 6).alias("jaccard"),
        )
        .orderBy("type_a", "type_b")
    )


_EV_AUDIENCE_SQL = """
WITH aud AS (SELECT DISTINCT event_type, user_id FROM events),
sz AS (SELECT event_type, COUNT(*) AS n FROM aud GROUP BY 1),
inter AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS inter
  FROM aud a JOIN aud b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT x.event_type AS type_a, y.event_type AS type_b,
       x.n AS n_a, y.n AS n_b,
       COALESCE(i.inter, 0) AS inter,
       ROUND(CAST(COALESCE(i.inter, 0) AS DOUBLE)
             / CAST(x.n + y.n - COALESCE(i.inter, 0) AS DOUBLE), 6) AS jaccard
FROM sz x JOIN sz y ON x.event_type < y.event_type
LEFT JOIN inter i ON i.type_a = x.event_type AND i.type_b = y.event_type
"""


# ---------------------------------------------------------------------------
# ag_cohort_ltv — cumulative revenue per signup cohort
# ---------------------------------------------------------------------------


def ag_cohort_ltv(spark: SparkSession, sf: str) -> DataFrame:
    """Customer-lifetime-value curve per acquisition cohort: customers
    are cohorted by their FIRST order month; for each (cohort,
    month-age) the cumulative cents revenue and its per-customer
    average. The value-weighted complement of `ev_cohort_retention`
    (which counts active users).

    Exactness: revenue accumulates in cents; month-age is pure
    integer calendar arithmetic ((Δyear)·12 + Δmonth); the single
    division happens at render. Scale: one shuffle on o_custkey
    (first-month window + fact join share the key), then a
    (cohort, age) aggregation; the cumulative window runs at
    cohort×age grain — bounded by the calendar, not the fact table."""
    o = load_table(spark, sf, "orders").select(
        "o_custkey",
        F.date_trunc("month", "o_orderdate").alias("m"),
        SC.cents("o_totalprice").alias("rev_c"),
    )
    wc = Window.partitionBy("o_custkey")
    oc = o.withColumn("cohort", F.min("m").over(wc))
    age = (F.year("m") - F.year("cohort")) * 12 + (F.month("m") - F.month("cohort"))
    g = oc.groupBy("cohort", age.alias("age")).agg(F.sum("rev_c").alias("rev_c"))
    sizes = (
        oc.select("o_custkey", "cohort")
        .distinct()
        .groupBy("cohort")
        .agg(F.count(F.lit(1)).alias("n_cohort"))
    )
    wcum = (
        Window.partitionBy("cohort")
        .orderBy("age")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        g.join(F.broadcast(sizes), "cohort")
        .select(
            F.date_format("cohort", "yyyy-MM").alias("cohort"),
            "age",
            "n_cohort",
            F.sum("rev_c").over(wcum).alias("cum_rev_c"),
        )
        .withColumn(
            "ltv_per_cust",
            F.round(F.col("cum_rev_c") / (100.0 * F.col("n_cohort")), 6),
        )
        .orderBy("cohort", "age")
    )


_AG_COHORT_LTV_SQL = """
WITH o AS (
  SELECT o_custkey,
         date_trunc('month', o_orderdate) AS m,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS rev_c
  FROM orders
),
oc AS (
  SELECT *, MIN(m) OVER (PARTITION BY o_custkey) AS cohort FROM o
),
g AS (
  -- keep the monthly subtotal BIGINT: DuckDB window-sums HUGEINT
  -- inputs in double (inexact); BIGINT inputs stay exact integer
  SELECT cohort,
         (YEAR(m) - YEAR(cohort)) * 12 + (MONTH(m) - MONTH(cohort)) AS age,
         CAST(SUM(rev_c) AS BIGINT) AS rev_c
  FROM oc GROUP BY 1, 2
),
sizes AS (
  SELECT cohort, COUNT(*) AS n_cohort
  FROM (SELECT DISTINCT o_custkey, cohort FROM oc) GROUP BY 1
),
c AS (
  SELECT g.cohort, g.age, s.n_cohort,
         CAST(SUM(g.rev_c) OVER (PARTITION BY g.cohort ORDER BY g.age
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_rev_c
  FROM g JOIN sizes s USING (cohort)
)
SELECT strftime(cohort, '%Y-%m') AS cohort,
       age,
       n_cohort,
       cum_rev_c,
       ROUND(CAST(cum_rev_c AS DOUBLE) / (100.0 * n_cohort), 6) AS ltv_per_cust
FROM c
"""


# ---------------------------------------------------------------------------
# ly_zonemap — block min/max statistics and predicate skip ratio
# ---------------------------------------------------------------------------

_ZM_BLOCK = 64  # orderkeys per synthetic block (~file-grain proxy)
_ZM_LO = "1996-01-01"
_ZM_HI = "1997-01-01"


def ly_zonemap(spark: SparkSession, sf: str) -> DataFrame:
    """Zone-map effectiveness audit: per-block min/max statistics
    over ``l_shipdate`` under TWO layouts — ``natural`` (blocks =
    ``l_orderkey DIV 64``, the insert-order file proxy) and
    ``clustered`` (blocks = ship month, what date partitioning /
    `ly_zorder` re-clustering would produce) — and, for each, how
    much of the table a one-year ship-date predicate could SKIP from
    the footer metadata alone. The side-by-side is the measurement
    that decides whether the re-clustering rewrite pays for itself
    (here: natural ≈ 0 skip because orderkeys are date-uncorrelated;
    clustered skips every out-of-range month).

    A block is skippable iff ``max < lo OR min >= hi`` (footer-only
    decision). Scale: each zone-map build is one map-side-combinable
    aggregation at block grain; the verdicts are global aggregates of
    the BLOCK relation (metadata grain), so the one-row exchanges
    never see fact rows."""
    lo = F.lit(_ZM_LO).cast("timestamp")
    hi = F.lit(_ZM_HI).cast("timestamp")
    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")

    def audit(blk: Column, layout: str) -> DataFrame:
        zm = (
            li.select(blk.alias("blk"), "l_shipdate")
            .groupBy("blk")
            .agg(
                F.min("l_shipdate").alias("lo_d"),
                F.max("l_shipdate").alias("hi_d"),
                F.count(F.lit(1)).alias("rws"),
            )
        )
        skip = (F.col("hi_d") < lo) | (F.col("lo_d") >= hi)
        return zm.agg(
            F.count(F.lit(1)).alias("n_blocks"),
            F.sum(skip.cast("bigint")).alias("n_skippable"),
            F.sum("rws").alias("rows_total"),
            F.sum(F.when(skip, F.col("rws")).otherwise(F.lit(0))).alias(
                "rows_skipped"
            ),
        ).select(
            F.lit(layout).alias("layout"),
            "n_blocks",
            "n_skippable",
            "rows_total",
            "rows_skipped",
            F.round(
                F.col("rows_skipped") / F.col("rows_total").cast("double"), 6
            ).alias("skip_ratio"),
        )

    natural = audit(F.expr(f"l_orderkey DIV {_ZM_BLOCK}").cast("string"), "natural")
    clustered = audit(F.date_format("l_shipdate", "yyyy-MM"), "clustered")
    return natural.unionByName(clustered)


_LY_ZONEMAP_SQL = f"""
WITH li AS (SELECT l_orderkey, l_shipdate FROM lineitem),
nat AS (
  SELECT CAST(l_orderkey // {_ZM_BLOCK} AS VARCHAR) AS blk,
         MIN(l_shipdate) AS lo_d, MAX(l_shipdate) AS hi_d, COUNT(*) AS rws
  FROM li GROUP BY 1
),
clu AS (
  SELECT strftime(l_shipdate, '%Y-%m') AS blk,
         MIN(l_shipdate) AS lo_d, MAX(l_shipdate) AS hi_d, COUNT(*) AS rws
  FROM li GROUP BY 1
),
verdict AS (
  SELECT 'natural' AS layout, * FROM nat
  UNION ALL
  SELECT 'clustered' AS layout, * FROM clu
)
SELECT layout,
       COUNT(*) AS n_blocks,
       CAST(SUM(CASE WHEN hi_d < TIMESTAMP '{_ZM_LO} 00:00:00'
                       OR lo_d >= TIMESTAMP '{_ZM_HI} 00:00:00'
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_skippable,
       CAST(SUM(rws) AS BIGINT) AS rows_total,
       CAST(SUM(CASE WHEN hi_d < TIMESTAMP '{_ZM_LO} 00:00:00'
                       OR lo_d >= TIMESTAMP '{_ZM_HI} 00:00:00'
                     THEN rws ELSE 0 END) AS BIGINT) AS rows_skipped,
       ROUND(CAST(SUM(CASE WHEN hi_d < TIMESTAMP '{_ZM_LO} 00:00:00'
                             OR lo_d >= TIMESTAMP '{_ZM_HI} 00:00:00'
                           THEN rws ELSE 0 END) AS DOUBLE)
             / CAST(SUM(rws) AS DOUBLE), 6) AS skip_ratio
FROM verdict GROUP BY layout
"""


# ---------------------------------------------------------------------------
# o14_upsert_evolve — schema-evolving upsert
# ---------------------------------------------------------------------------


def o14_upsert_evolve(spark: SparkSession, sf: str) -> DataFrame:
    """Schema-evolving rerun of the reference's ON CONFLICT upsert
    (``02_etl.py:84-101``): the incoming batch ADDS a column the
    target never had (``o_channel``) and DROPS one it still carries
    (``o_orderpriority``). Delta-style MERGE WITH SCHEMA EVOLUTION
    semantics: the result carries the union schema; matched rows take
    incoming values for shared columns, keep the old value for the
    dropped column, and gain the new column; pre-existing rows read
    NULL for the new column; inserts read NULL for the dropped one."""
    o = load_table(spark, sf, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        "o_orderpriority",
    )
    target = o.filter(F.col("o_orderkey") % 3 != 0)
    updates = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey",
        "o_custkey",
        F.lit("E").alias("o_orderstatus"),
        SC.money_from_cents(SC.cents("o_totalprice") + 123).alias("o_totalprice"),
        "o_orderdate",
        F.concat(F.lit("ch-"), (F.col("o_orderkey") % 3).cast("string")).alias(
            "o_channel"
        ),
    )
    return merge.upsert_evolve(target, updates, ["o_orderkey"])


_O14_SQL = """
WITH ord AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
         strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_orderpriority
  FROM orders
),
target AS (SELECT * FROM ord WHERE o_orderkey % 3 <> 0),
updates AS (
  SELECT o_orderkey, o_custkey, 'E' AS o_orderstatus,
         CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) + 123 AS DOUBLE) / 100.0
           AS o_totalprice,
         o_orderdate,
         'ch-' || CAST(o_orderkey % 3 AS VARCHAR) AS o_channel
  FROM ord WHERE o_orderkey % 2 = 0
)
SELECT u.o_orderkey, u.o_custkey, u.o_orderstatus, u.o_totalprice,
       u.o_orderdate, t.o_orderpriority, u.o_channel
FROM updates u LEFT JOIN target t USING (o_orderkey)
UNION ALL
SELECT t.o_orderkey, t.o_custkey, t.o_orderstatus, t.o_totalprice,
       t.o_orderdate, t.o_orderpriority, NULL AS o_channel
FROM target t
WHERE t.o_orderkey NOT IN (SELECT o_orderkey FROM updates)
"""


QUERIES = {
    "ts_decompose": ts_decompose,
    "ts_m4_downsample": ts_m4_downsample,
    "ev_audience_overlap": ev_audience_overlap,
    "ag_cohort_ltv": ag_cohort_ltv,
    "ly_zonemap": ly_zonemap,
    "o14_upsert_evolve": o14_upsert_evolve,
}

ORACLES = {
    "ts_decompose": _TS_DECOMPOSE_SQL,
    "ts_m4_downsample": _TS_M4_SQL,
    "ev_audience_overlap": _EV_AUDIENCE_SQL,
    "ag_cohort_ltv": _AG_COHORT_LTV_SQL,
    "ly_zonemap": _LY_ZONEMAP_SQL,
    "o14_upsert_evolve": _O14_SQL,
}
