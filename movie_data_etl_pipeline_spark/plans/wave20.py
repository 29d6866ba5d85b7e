"""Round-3 wave 20: the remaining engine-surface families —
table-generating functions (stack/inline/posexplode over struct
arrays) and calendar arithmetic (add_months / last_day / trunc /
date sequences) — completing the `fn_*` breadth set
(`fn_scalar_surface`, `fn_hof_surface`, `fn_try_surface`).

Both queries are shuffle-free row-local projections (plus the
generator fan-out); everything stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.sources import load_table


# ---------------------------------------------------------------------------
# fn_generator_surface — table-generating functions
# ---------------------------------------------------------------------------


def fn_generator_surface(spark: SparkSession, sf: str) -> DataFrame:
    """Generator breadth in one pass: ``posexplode`` over a derived
    struct array (the `inline`/`stack` shape) — each order fans out
    to its (key, derived-metric) pairs with the ordinal retained.
    Row-local fan-out; the bound is the literal arity (3), so the
    output is exactly 3× the scan with zero shuffles."""
    o = load_table(spark, sf, "orders").filter(F.col("o_orderkey") % 37 == 0)
    pairs = F.array(
        F.struct(
            F.lit("price_c").alias("metric"),
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("val"),
        ),
        F.struct(
            F.lit("custkey").alias("metric"), F.col("o_custkey").cast("bigint").alias("val")
        ),
        F.struct(
            F.lit("year").alias("metric"),
            F.year("o_orderdate").cast("bigint").alias("val"),
        ),
    )
    return (
        o.select("o_orderkey", F.posexplode(pairs).alias("pos", "kv"))
        .select(
            "o_orderkey",
            F.col("pos").cast("bigint").alias("pos"),
            F.col("kv.metric").alias("metric"),
            F.col("kv.val").alias("val"),
        )
        .orderBy("o_orderkey", "pos")
    )


_FN_GEN_SQL = """
SELECT o_orderkey,
       CAST(g.pos AS BIGINT) AS pos,
       g.metric,
       g.val
FROM (SELECT * FROM orders WHERE o_orderkey % 37 = 0),
LATERAL (VALUES
  (0, 'price_c', CAST(ROUND(o_totalprice * 100) AS BIGINT)),
  (1, 'custkey', CAST(o_custkey AS BIGINT)),
  (2, 'year', CAST(YEAR(o_orderdate) AS BIGINT))
) AS g(pos, metric, val)
"""


# ---------------------------------------------------------------------------
# fn_datetime_surface — calendar arithmetic breadth
# ---------------------------------------------------------------------------


def fn_datetime_surface(spark: SparkSession, sf: str) -> DataFrame:
    """Calendar-arithmetic breadth in one shuffle-free projection:
    month shifting (`add_months`), month-end snapping (`last_day`),
    period truncation, day-of-year, ISO week, and the day count to
    the next quarter boundary — every expression a JVM Column in one
    codegen span, with the DuckDB twin proving the calendar
    semantics (month-end clamping included) agree."""
    o = load_table(spark, sf, "orders").filter(F.col("o_orderkey") % 41 == 0)
    d = F.to_date("o_orderdate")
    next_q = F.date_trunc("quarter", F.add_months(d, 3))
    return o.select(
        "o_orderkey",
        F.date_format(d, "yyyy-MM-dd").alias("d"),
        F.date_format(F.add_months(d, 7), "yyyy-MM-dd").alias("plus_7m"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.date_trunc("quarter", d), "yyyy-MM-dd").alias("quarter_start"),
        F.dayofyear(d).cast("int").alias("doy"),
        F.weekofyear(d).cast("int").alias("iso_week"),
        F.datediff(next_q.cast("date"), d).cast("int").alias("days_to_next_q"),
    ).orderBy("o_orderkey")


_FN_DT_SQL = """
SELECT o_orderkey,
       strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS d,
       strftime(CAST(o_orderdate AS DATE) + INTERVAL 7 MONTH, '%Y-%m-%d') AS plus_7m,
       strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
       strftime(date_trunc('quarter', CAST(o_orderdate AS DATE)), '%Y-%m-%d')
         AS quarter_start,
       CAST(dayofyear(CAST(o_orderdate AS DATE)) AS INTEGER) AS doy,
       CAST(weekofyear(CAST(o_orderdate AS DATE)) AS INTEGER) AS iso_week,
       CAST(date_diff('day', CAST(o_orderdate AS DATE),
            CAST(date_trunc('quarter', CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH)
                 AS DATE)) AS INTEGER) AS days_to_next_q
FROM orders
WHERE o_orderkey % 41 = 0
"""


QUERIES = {
    "fn_generator_surface": fn_generator_surface,
    "fn_datetime_surface": fn_datetime_surface,
}

ORACLES = {
    "fn_generator_surface": _FN_GEN_SQL,
    "fn_datetime_surface": _FN_DT_SQL,
}
