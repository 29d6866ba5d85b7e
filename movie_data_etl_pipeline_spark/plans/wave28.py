"""Round-4 wave 28: fixed-frequency periodogram (integer cosine
tables) and bitmap-index conjunction queries.

Determinism contract unchanged.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.sources import load_table

# ---------------------------------------------------------------------------
# ts_periodogram — spectral power at fixed candidate periods
# ---------------------------------------------------------------------------

_PERIODS = [7, 30, 91, 365]


def _cos_sin_tables() -> list[tuple[int, int, int, int]]:
    """(period, phase, cos_micro, sin_micro) rows — the trig values
    snapped ONCE to integer micro-units at table-build time, so the
    cross-row sums downstream are exact integer arithmetic (the same
    lockstep trick as the LM micro-nats). Built in Python, embedded as
    literals in BOTH engines, so there is no cross-libm exposure at
    all."""
    rows = []
    for p in _PERIODS:
        for k in range(p):
            ang = 2.0 * math.pi * k / p
            rows.append(
                (p, k, int(round(math.cos(ang) * 1e6)), int(round(math.sin(ang) * 1e6)))
            )
    return rows


def ts_periodogram(spark: SparkSession, sf: str) -> DataFrame:
    """Discrete periodogram of daily revenue at the candidate periods a
    retail series actually has (week, month, quarter, year): power at
    period P is a_P² + b_P² with a_P = Σ y·cos(2πx/P), b_P = Σ
    y·sin(2πx/P) — the Goertzel/DFT-at-k-frequencies seasonality
    detector that ranks which calendar rhythm dominates. The trig
    values come from a PRECOMPUTED integer micro-unit table (one row
    per (period, phase), built in Python and embedded in both engines'
    plans as literals), joined by ``x mod P`` — so every cross-row sum
    is exact int64 and the result is engine-portable with zero libm
    exposure. Output: period, the integer a/b accumulators, and the
    normalized power share of total variance (one double render).

    Scale: the day-grain series is calendar-bounded; the table join is
    a broadcast of ≤ 493 rows into it. The fact scan happens once."""
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
    )
    tbl = spark.createDataFrame(
        _cos_sin_tables(), "period int, phase int, cosm bigint, sinm bigint"
    )
    j = daily.join(
        F.broadcast(tbl), F.pmod(F.col("x"), F.col("period")) == F.col("phase")
    )
    acc = j.groupBy("period").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("y") * F.col("cosm")).cast("bigint").alias("a_micro"),
        F.sum(F.col("y") * F.col("sinm")).cast("bigint").alias("b_micro"),
    )
    power = (
        F.col("a_micro").cast("double") * F.col("a_micro").cast("double")
        + F.col("b_micro").cast("double") * F.col("b_micro").cast("double")
    )
    return (
        acc.select(
            F.col("period").cast("bigint").alias("period"),
            "n",
            "a_micro",
            "b_micro",
            F.round(
                F.log10(power + F.lit(1.0)),
                6,
            ).alias("log10_power"),
        )
        .orderBy("period")
    )


def _cos_sin_values_sql() -> str:
    return ", ".join(
        f"({p}, {k}, {c}, {s})" for p, k, c, s in _cos_sin_tables()
    )


_TS_PERIODOGRAM_SQL = f"""
WITH daily AS (
  SELECT CAST(datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
         CAST(SUM(CAST(ROUND(o_totalprice) AS BIGINT)) AS BIGINT) AS y
  FROM orders GROUP BY 1
),
tbl(period, phase, cosm, sinm) AS (VALUES {_cos_sin_values_sql()}),
acc AS (
  SELECT period, COUNT(*)::BIGINT AS n,
         CAST(SUM(y * cosm) AS BIGINT) AS a_micro,
         CAST(SUM(y * sinm) AS BIGINT) AS b_micro
  FROM daily JOIN tbl ON x % period = phase
  GROUP BY period
)
SELECT CAST(period AS BIGINT) AS period, n, a_micro, b_micro,
       ROUND(log10(CAST(a_micro AS DOUBLE) * CAST(a_micro AS DOUBLE)
                   + CAST(b_micro AS DOUBLE) * CAST(b_micro AS DOUBLE) + 1.0), 6)
         AS log10_power
FROM acc ORDER BY period
"""


# ---------------------------------------------------------------------------
# ix_bitmap_and — bitmap-index conjunction queries
# ---------------------------------------------------------------------------

_BM_PREDS = [
    ("urgent", "o_orderpriority = '1-URGENT'"),
    ("finished", "o_orderstatus = 'F'"),
    ("q1", "EXTRACT(month FROM CAST(o_orderdate AS DATE)) <= 3"),
]
_BM_PAIRS = [("urgent", "finished"), ("urgent", "q1"), ("finished", "q1")]


def ix_bitmap_and(spark: SparkSession, sf: str) -> DataFrame:
    """Bitmap-index conjunction: build one bitmap per predicate over
    the orders key space (word = key div 32, bit = key mod 32, OR-
    aggregated into int64 words — the roaring-bitmap idea at its
    simplest), then answer each pairwise AND query by joining the two
    bitmaps on word, bitwise-ANDing, and popcounting — the classic
    OLAP index that turns multi-predicate counting into word-parallel
    bit arithmetic. Output per pair: matching-order count from the
    bitmap AND plus the words touched; the count provably equals the
    direct predicate count (asserted in tests, and the whole pipeline
    is integer-exact).

    Scale: bitmaps are |keyspace|/32 words regardless of how many
    predicates match; the AND is an equi-join on word — at 100 TB the
    bitmaps partition by word range and conjunctions never rescan the
    fact."""
    orders = load_table(spark, sf, "orders")
    maps = {}
    for name, pred in _BM_PREDS:
        maps[name] = (
            orders.filter(F.expr(pred))
            .select(
                (F.col("o_orderkey") / 32).cast("bigint").alias("word"),
                F.expr("shiftleft(1L, CAST(o_orderkey % 32 AS INT))").alias("bit"),
            )
            .groupBy("word")
            .agg(F.bit_or("bit").alias("bm"))
        )
    outs = []
    for a, b in _BM_PAIRS:
        j = (
            maps[a]
            .select("word", F.col("bm").alias("bm_a"))
            .join(maps[b].select("word", F.col("bm").alias("bm_b")), "word")
            .select(F.bit_count(F.col("bm_a").bitwiseAND(F.col("bm_b"))).alias("c"))
        )
        outs.append(
            j.agg(
                F.sum("c").cast("bigint").alias("n_match"),
                F.count(F.lit(1)).cast("bigint").alias("n_words"),
            ).select(
                F.lit(f"{a} AND {b}").alias("query"),
                F.coalesce("n_match", F.lit(0)).cast("bigint").alias("n_match"),
                F.coalesce("n_words", F.lit(0)).cast("bigint").alias("n_words"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out.orderBy("query")


def _bm_build_sql(name: str, pred: str) -> str:
    return f"""
bm_{name} AS (
  SELECT o_orderkey // 32 AS word,
         CAST(bit_or(1::BIGINT << CAST(o_orderkey % 32 AS INTEGER)) AS BIGINT) AS bm
  FROM orders WHERE {pred}
  GROUP BY 1
)"""


def _bm_pair_sql(a: str, b: str) -> str:
    return f"""
SELECT '{a} AND {b}' AS query,
       COALESCE(CAST(SUM(bit_count(x.bm & y.bm)) AS BIGINT), 0) AS n_match,
       COUNT(*)::BIGINT AS n_words
FROM bm_{a} x JOIN bm_{b} y USING (word)"""


_IX_BITMAP_SQL = (
    "WITH "
    + ",".join(_bm_build_sql(n, p) for n, p in _BM_PREDS)
    + "\nUNION ALL\n".join(_bm_pair_sql(a, b) for a, b in _BM_PAIRS)
    + "\nORDER BY query"
)


QUERIES = {
    "ts_periodogram": ts_periodogram,
    "ix_bitmap_and": ix_bitmap_and,
}

ORACLES = {
    "ts_periodogram": _TS_PERIODOGRAM_SQL,
    "ix_bitmap_and": _IX_BITMAP_SQL,
}
