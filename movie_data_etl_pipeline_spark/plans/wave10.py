"""Round-3 wave 10: multi-objective frontier mining, variance-optimal
sampling allocation, dynamic partition overwrite, and seasonal
anomaly flagging — rounding out the curation/serving layer of waves
8–9.

Determinism contract unchanged: exact integer state for every
cross-row reduction (revenues and thresholds cross-multiplied rather
than divided; standard deviations snapped to whole cents BEFORE they
enter any sum so no float aggregation exists anywhere); one final
IEEE expression per rendered value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.functions import portable_hash as ph
from movie_data_etl_pipeline_spark.functions import scalar as SC
from movie_data_etl_pipeline_spark.operators import merge
from movie_data_etl_pipeline_spark.sources import load_table


# ---------------------------------------------------------------------------
# w8_pareto_front — 2-D skyline of suppliers
# ---------------------------------------------------------------------------


def w8_pareto_front(spark: SparkSession, sf: str) -> DataFrame:
    """Pareto frontier (2-D skyline) of suppliers over (total revenue
    cents, latest ship date): a supplier is on the frontier iff no
    other supplier is at least as good on both axes and strictly
    better on one — the multi-objective 'best vendors' query a
    single ORDER BY cannot answer.

    The skyline is computed by the sort-scan identity, not a pairwise
    join: collapse to DISTINCT revenue values with their best ship
    date, then keep the values whose best-y strictly exceeds the
    running max over all strictly-higher revenues (the `w7_record_days`
    strictly-prior frame). Supplier grain is a dimension (bounded),
    so the ordered window never sees fact rows; the only fact-grain
    work is one groupBy on l_suppkey."""
    sup = (
        load_table(spark, sf, "lineitem")
        .groupBy("l_suppkey")
        .agg(
            F.sum(SC.cents("l_extendedprice")).alias("rev_c"),
            F.max("l_shipdate").alias("last_ship"),
        )
    )
    bestx = sup.groupBy("rev_c").agg(F.max("last_ship").alias("best_y"))
    wprior = (
        Window.orderBy(F.desc("rev_c"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    front = (
        bestx.select(
            "rev_c", "best_y", F.max("best_y").over(wprior).alias("prior_y")
        )
        .filter(F.col("prior_y").isNull() | (F.col("best_y") > F.col("prior_y")))
        .select(F.col("rev_c").alias("f_rev_c"), F.col("best_y").alias("f_best_y"))
    )
    return (
        sup.join(
            front,
            (F.col("rev_c") == F.col("f_rev_c"))
            & (F.col("last_ship") == F.col("f_best_y")),
        )
        .select(
            "l_suppkey",
            "rev_c",
            F.date_format("last_ship", "yyyy-MM-dd HH:mm:ss").alias("last_ship"),
        )
        .orderBy(F.desc("rev_c"), "l_suppkey")
    )


_W8_PARETO_SQL = """
WITH sup AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS rev_c,
         MAX(l_shipdate) AS last_ship
  FROM lineitem GROUP BY 1
),
bestx AS (SELECT rev_c, MAX(last_ship) AS best_y FROM sup GROUP BY 1),
front AS (
  SELECT rev_c, best_y,
         MAX(best_y) OVER (ORDER BY rev_c DESC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prior_y
  FROM bestx
)
SELECT s.l_suppkey, s.rev_c,
       strftime(s.last_ship, '%Y-%m-%d %H:%M:%S') AS last_ship
FROM sup s JOIN front f
  ON s.rev_c = f.rev_c AND s.last_ship = f.best_y
WHERE f.prior_y IS NULL OR f.best_y > f.prior_y
"""


# ---------------------------------------------------------------------------
# sa_neyman_alloc — variance-optimal stratified sampling allocation
# ---------------------------------------------------------------------------

_NEYMAN_BUDGET = 1000


def sa_neyman_alloc(spark: SparkSession, sf: str) -> DataFrame:
    """Neyman allocation for a 1000-row stratified sample: each
    stratum's share of the budget ∝ N_h·σ_h (minimum-variance
    allocation for estimating the mean), with the realized sample
    drawn by the portable hash so the SELECTION SIZE is
    oracle-checkable, not just the plan.

    Float-free state: σ_h is snapped to WHOLE cents immediately
    after its one sqrt (so the N_h·σ_h weights and their grand total
    are exact integers); the per-stratum inclusion test is the
    integer cross-multiplication mix(key)·N_h < alloc_n·P — no float
    threshold anywhere. Two passes over the fact scan (moments, then
    membership count), both map-side-combinable; strata are a
    catalog constant."""
    o = load_table(spark, sf, "orders").select(
        "o_orderkey",
        F.col("o_orderpriority").alias("stratum"),
        SC.cents("o_totalprice").alias("vc"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = o.groupBy("stratum").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(dec("vc")).alias("sx"),
        F.sum(dec("vc") * F.col("vc")).alias("sxx"),
    )
    nn = F.col("n_rows").cast("double")
    var = (
        nn * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double")
    ) / (nn * nn)
    stats = m.select(
        "stratum",
        "n_rows",
        F.round(F.sqrt(var)).cast("bigint").alias("sd_c"),
    ).withColumn("w", F.col("n_rows") * F.col("sd_c"))
    tot = stats.agg(F.sum("w").alias("tw"))
    alloc = (
        stats.crossJoin(F.broadcast(tot))
        .select(
            "stratum",
            "n_rows",
            "sd_c",
            F.round(
                F.lit(_NEYMAN_BUDGET) * F.col("w").cast("double") / F.col("tw").cast("double")
            )
            .cast("bigint")
            .alias("alloc_n"),
        )
    )
    key_mix = ph.mix(ph.str_hash(F.col("o_orderkey").cast("string")))
    sampled = (
        o.join(F.broadcast(alloc), "stratum")
        .filter(key_mix * F.col("n_rows") < F.col("alloc_n") * F.lit(ph.P))
        .groupBy("stratum")
        .agg(F.count(F.lit(1)).alias("sampled_n"))
    )
    return (
        alloc.join(sampled, "stratum", "left")
        .withColumn("sampled_n", F.coalesce("sampled_n", F.lit(0)))
        .orderBy("stratum")
    )


_SA_NEYMAN_SQL = f"""
WITH o AS (
  SELECT o_orderkey, o_orderpriority AS stratum,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS vc
  FROM orders
),
m AS (
  SELECT stratum, COUNT(*) AS n_rows,
         SUM(vc) AS sx, SUM(vc * vc) AS sxx
  FROM o GROUP BY 1
),
stats AS (
  SELECT stratum, n_rows,
         CAST(ROUND(SQRT(
           (CAST(n_rows AS DOUBLE) * CAST(sxx AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
           / (CAST(n_rows AS DOUBLE) * CAST(n_rows AS DOUBLE))
         )) AS BIGINT) AS sd_c
  FROM m
),
tot AS (SELECT CAST(SUM(n_rows * sd_c) AS BIGINT) AS tw FROM stats),
alloc AS (
  SELECT stratum, n_rows, sd_c,
         CAST(ROUND({_NEYMAN_BUDGET} * CAST(n_rows * sd_c AS DOUBLE)
                    / CAST(tw AS DOUBLE)) AS BIGINT) AS alloc_n
  FROM stats, tot
),
sampled AS (
  SELECT o.stratum, COUNT(*) AS sampled_n
  FROM o JOIN alloc a USING (stratum)
  WHERE {ph.sql_mix(ph.sql_str_hash("CAST(o.o_orderkey AS VARCHAR)"))} * a.n_rows
        < a.alloc_n * {ph.P}
  GROUP BY 1
)
SELECT a.stratum, a.n_rows, a.sd_c, a.alloc_n,
       COALESCE(s.sampled_n, 0) AS sampled_n
FROM alloc a LEFT JOIN sampled s USING (stratum)
"""


# ---------------------------------------------------------------------------
# o15_partition_overwrite — dynamic partition replacement
# ---------------------------------------------------------------------------


def o15_partition_overwrite(spark: SparkSession, sf: str) -> DataFrame:
    """Dynamic INSERT OVERWRITE: the batch carries revised rows for
    some partitions (here: every 1996 order month, restated with a
    price adjustment); those partitions are replaced WHOLESALE —
    rows absent from the batch vanish — while untouched partitions
    pass through. The restatement/backfill primitive that key-level
    upsert (O8) cannot express, because O8 can never delete."""
    o = load_table(spark, sf, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        F.date_format("o_orderdate", "yyyy-MM").alias("pm"),
        "o_orderpriority",
    )
    updates = (
        o.filter(F.col("pm").startswith("1996"))
        # the restatement drops half the rows (simulating corrected
        # dedup) — partition overwrite must NOT resurrect the rest
        .filter(F.col("o_orderkey") % 2 == 0)
        .select(
            "o_orderkey",
            "o_custkey",
            F.lit("V").alias("o_orderstatus"),
            SC.money_from_cents(SC.cents("o_totalprice") + 555).alias("o_totalprice"),
            "pm",
            "o_orderpriority",
        )
    )
    return merge.partition_overwrite(o, updates, ["pm"])


_O15_SQL = """
WITH o AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
         strftime(o_orderdate, '%Y-%m') AS pm, o_orderpriority
  FROM orders
),
updates AS (
  SELECT o_orderkey, o_custkey, 'V' AS o_orderstatus,
         CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) + 555 AS DOUBLE) / 100.0
           AS o_totalprice,
         pm, o_orderpriority
  FROM o WHERE pm LIKE '1996%' AND o_orderkey % 2 = 0
)
SELECT * FROM updates
UNION ALL
SELECT * FROM o WHERE pm NOT IN (SELECT DISTINCT pm FROM updates)
"""


# ---------------------------------------------------------------------------
# ts_seasonal_outliers — residual-based anomaly days
# ---------------------------------------------------------------------------


def ts_seasonal_outliers(spark: SparkSession, sf: str) -> DataFrame:
    """Anomalous days AFTER seasonality is explained away: flag days
    whose `ts_decompose` residual deviates from the residual median
    by more than 3·1.4826·MAD — the robust control chart that
    doesn't false-alarm on weekends the way a raw-count z-score
    does (`qa_volume_anomaly`'s failure mode).

    Residuals are micro-snapped to integers; median and MAD are read
    off cumulative windows at the residual-VALUE grain; the flag is
    the integer cross-multiplication 10000·|r−med| > 44478·mad. All
    ordered state runs at day/value grain (bounded)."""
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
    seas = (
        base.filter(F.col("n7") == 7)
        .groupBy("wd")
        .agg(F.sum(7 * F.col("cnt") - F.col("s7")).alias("sd"), F.count(F.lit(1)).alias("nw"))
    )
    num = 7 * F.col("nw") * F.col("cnt") - F.col("nw") * F.col("s7") - F.col("sd")
    rel = (
        base.filter(F.col("n7") == 7)
        .join(F.broadcast(seas), "wd")
        .select(
            "d",
            "cnt",
            F.round(F.lit(1e6) * num / (7.0 * F.col("nw"))).cast("bigint").alias("r_u"),
        )
    )

    def lower_median(df: DataFrame, col: str) -> DataFrame:
        hist = df.groupBy(col).agg(F.count(F.lit(1)).alias("c"))
        nn = hist.agg(F.sum("c").alias("nn"))
        wcum = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, 0)
        return (
            hist.select(col, F.sum("c").over(wcum).alias("cc"))
            .crossJoin(F.broadcast(nn))
            .filter(F.col("cc") * 2 >= F.col("nn"))
            .agg(F.min(col).alias("med"))
        )
    med = lower_median(rel, "r_u")
    dev = rel.crossJoin(F.broadcast(med)).select(
        "d", "cnt", "r_u", F.abs(F.col("r_u") - F.col("med")).alias("dev_u"), "med"
    )
    mad = lower_median(dev.select("dev_u"), "dev_u").select(
        F.col("med").alias("mad_u")
    )
    return (
        dev.crossJoin(F.broadcast(mad))
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "cnt",
            F.round(F.col("r_u") / 1e6, 6).alias("resid"),
            (10000 * F.col("dev_u") > 44478 * F.col("mad_u")).cast("int").alias(
                "is_outlier"
            ),
        )
        .orderBy("day")
    )


_TS_OUTLIER_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, COUNT(*) AS cnt FROM events GROUP BY 1
),
b AS (
  SELECT d, cnt,
         SUM(cnt) OVER w AS s7, COUNT(*) OVER w AS n7,
         CAST(d - DATE '1970-01-01' AS INTEGER) % 7 AS wd
  FROM daily
  WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
seas AS (
  SELECT wd, SUM(7 * cnt - s7) AS sd, COUNT(*) AS nw
  FROM b WHERE n7 = 7 GROUP BY wd
),
rel AS (
  SELECT b.d, b.cnt,
         CAST(ROUND(1e6 * (7 * nw * cnt - nw * s7 - sd) / (7.0 * nw)) AS BIGINT)
           AS r_u
  FROM b JOIN seas USING (wd) WHERE n7 = 7
),
h1 AS (SELECT r_u, COUNT(*) AS c FROM rel GROUP BY 1),
n1 AS (SELECT CAST(SUM(c) AS BIGINT) AS nn FROM h1),
c1 AS (SELECT r_u, CAST(SUM(c) OVER (ORDER BY r_u) AS BIGINT) AS cc FROM h1),
med AS (SELECT MIN(r_u) AS med FROM c1, n1 WHERE cc * 2 >= nn),
dev AS (
  SELECT rel.d, rel.cnt, rel.r_u, ABS(rel.r_u - med.med) AS dev_u
  FROM rel, med
),
h2 AS (SELECT dev_u, COUNT(*) AS c FROM dev GROUP BY 1),
n2 AS (SELECT CAST(SUM(c) AS BIGINT) AS nn FROM h2),
c2 AS (SELECT dev_u, CAST(SUM(c) OVER (ORDER BY dev_u) AS BIGINT) AS cc FROM h2),
mad AS (SELECT MIN(dev_u) AS mad_u FROM c2, n2 WHERE cc * 2 >= nn)
SELECT strftime(dev.d, '%Y-%m-%d') AS day,
       dev.cnt,
       ROUND(dev.r_u / 1e6, 6) AS resid,
       CAST(10000 * dev.dev_u > 44478 * mad.mad_u AS INTEGER) AS is_outlier
FROM dev, mad
"""


QUERIES = {
    "w8_pareto_front": w8_pareto_front,
    "sa_neyman_alloc": sa_neyman_alloc,
    "o15_partition_overwrite": o15_partition_overwrite,
    "ts_seasonal_outliers": ts_seasonal_outliers,
}

ORACLES = {
    "w8_pareto_front": _W8_PARETO_SQL,
    "sa_neyman_alloc": _SA_NEYMAN_SQL,
    "o15_partition_overwrite": _O15_SQL,
    "ts_seasonal_outliers": _TS_OUTLIER_SQL,
}
