"""Round-3 wave 17: packing fragmentation, time-bounded funnel
conversion, and Tukey median polish — training-batch hygiene, the
product conversion metric, and the robust two-way decomposition.

Determinism contract unchanged: exact integer state; medians are
ORDER STATISTICS over integers (lower median), never accumulations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.operators import text_analysis
from movie_data_etl_pipeline_spark.functions import scalar as SC
from movie_data_etl_pipeline_spark.sources import load_table

# whitespace tokenizer, identical to fixture_queries._D_TOKS (kept
# inline — importing fixture_queries here would be circular, since
# that module imports this one to assemble the registry)
_D_TOKS = r"list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')"


# ---------------------------------------------------------------------------
# tx_pack_fragmentation — document splitting across training bins
# ---------------------------------------------------------------------------


def tx_pack_fragmentation(spark: SparkSession, sf: str) -> DataFrame:
    """Fragmentation profile of `tx_pack_sequences`' concatenate-and-
    cut packing: how many documents land whole in one bin vs split
    across 2, 3, … bins — the cross-boundary-attention cost of
    zero-padding-waste packing (each extra fragment is a context
    window that sees a document boundary mid-text). Histogram at
    fragment-count grain from one aggregation of the packing
    output."""
    packed = text_analysis.pack_sequences(
        load_table(spark, sf, "documents"), budget_tokens=64
    )
    per_doc = packed.groupBy("doc_id").agg(F.count(F.lit(1)).alias("fragments"))
    return (
        per_doc.groupBy("fragments")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("fragments")
    )


_TX_FRAG_SQL = f"""
WITH t AS (
  SELECT doc_id, CAST(len({_D_TOKS}) AS BIGINT) AS n_tokens
  FROM documents
  WHERE len({_D_TOKS}) > 0
),
c AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS "offset"
  FROM t
),
per_doc AS (
  SELECT doc_id,
         ("offset" + n_tokens - 1) // 64 - "offset" // 64 + 1 AS fragments
  FROM c
)
SELECT CAST(fragments AS BIGINT) AS fragments,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM per_doc GROUP BY 1
"""


# ---------------------------------------------------------------------------
# ev_funnel_timebound — conversion within a deadline
# ---------------------------------------------------------------------------

_FUNNEL_DEADLINE_S = 24 * 3600


def ev_funnel_timebound(spark: SparkSession, sf: str) -> DataFrame:
    """Time-bounded funnel conversion: for each funnel edge, the
    share of users who reach the next step within 24 hours of their
    first occurrence of the previous one — the product metric
    `ev_funnel`'s unordered presence counts and `ev_step_latency`'s
    latency quantiles both stop short of (a conversion that takes a
    month is not a conversion). Integer second arithmetic; one
    user-grain aggregation + one equi-join."""
    firsts = (
        load_table(spark, sf, "events")
        .groupBy("user_id", "event_type")
        .agg(F.min("ts").alias("t"))
    )
    pairs = spark.createDataFrame(
        [("signup", "view"), ("view", "click"), ("click", "purchase")],
        "step_a string, step_b string",
    )
    a = firsts.select("user_id", F.col("event_type").alias("step_a"), F.col("t").alias("ta"))
    b = firsts.select("user_id", F.col("event_type").alias("step_b"), F.col("t").alias("tb"))
    lat_s = F.expr("(unix_micros(tb) - unix_micros(ta)) DIV 1000000")
    j = (
        a.join(F.broadcast(pairs), "step_a")
        .join(b, ["user_id", "step_b"], "left")
        .select(
            "step_a",
            "step_b",
            F.when((F.col("tb").isNotNull()) & (F.col("tb") >= F.col("ta")), lat_s).alias(
                "lat_s"
            ),
        )
    )
    conv = (F.col("lat_s").isNotNull()) & (F.col("lat_s") <= _FUNNEL_DEADLINE_S)
    return (
        j.groupBy("step_a", "step_b")
        .agg(
            F.count(F.lit(1)).alias("n_started"),
            F.sum(F.col("lat_s").isNotNull().cast("bigint")).alias("n_converted_ever"),
            F.sum(conv.cast("bigint")).alias("n_converted_24h"),
        )
        .select(
            "step_a",
            "step_b",
            "n_started",
            "n_converted_ever",
            "n_converted_24h",
            F.round(
                F.col("n_converted_24h") / F.col("n_started").cast("double"), 6
            ).alias("conv_rate_24h"),
        )
        .orderBy("step_a", "step_b")
    )


_EV_FUNNEL_TB_SQL = f"""
WITH firsts AS (
  SELECT user_id, event_type, MIN(ts) AS t FROM events GROUP BY 1, 2
),
pairs AS (
  SELECT step_a, step_b FROM (VALUES
    ('signup', 'view'), ('view', 'click'), ('click', 'purchase')
  ) t(step_a, step_b)
),
j AS (
  SELECT p.step_a, p.step_b,
         CASE WHEN b.t IS NOT NULL AND b.t >= a.t
              THEN (epoch_us(b.t) - epoch_us(a.t)) // 1000000 END AS lat_s
  FROM firsts a
  JOIN pairs p ON a.event_type = p.step_a
  LEFT JOIN firsts b ON b.user_id = a.user_id AND b.event_type = p.step_b
)
SELECT step_a, step_b,
       CAST(COUNT(*) AS BIGINT) AS n_started,
       CAST(SUM(CASE WHEN lat_s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_converted_ever,
       CAST(SUM(CASE WHEN lat_s IS NOT NULL AND lat_s <= {_FUNNEL_DEADLINE_S}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_converted_24h,
       ROUND(CAST(SUM(CASE WHEN lat_s IS NOT NULL AND lat_s <= {_FUNNEL_DEADLINE_S}
                           THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS conv_rate_24h
FROM j GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# ag_median_polish — Tukey two-way robust decomposition
# ---------------------------------------------------------------------------

_POLISH_SWEEPS = 2


def _lower_median(df: DataFrame, part: str, val: str) -> DataFrame:
    """Per-``part`` lower median of ``val`` as an order statistic."""
    w = Window.partitionBy(part).orderBy(val)
    n = Window.partitionBy(part)
    return (
        df.select(part, val, F.row_number().over(w).alias("rn"),
                  F.count(F.lit(1)).over(n).alias("cnt"))
        .filter(F.col("rn") * 2 == F.col("cnt") + (F.col("cnt") % 2))
        .select(part, F.col(val).alias("med"))
    )


def ag_median_polish(spark: SparkSession, sf: str) -> DataFrame:
    """Tukey median polish of the (priority × status) mean-order-value
    grid: 2 full sweeps of alternating row-median and column-median
    removal — the ROBUST two-way decomposition (cell = row effect +
    column effect + residual) that OLS-style effect estimates get
    wrong under a single contaminated cell; the robust sibling of
    `ag_raking` on the same grid.

    Cell values are whole-cent means; every median is a LOWER-median
    order statistic over integers, so all effects and residuals stay
    exact integers end to end — no convergence epsilon anywhere. All
    state at cell grain after one conditional aggregation."""
    cells = (
        load_table(spark, sf, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("pri"),
            F.col("o_orderstatus").alias("sta"),
        )
        .agg(
            F.round(
                F.sum(SC.cents("o_totalprice")) / F.count(F.lit(1)).cast("double")
            )
            .cast("bigint")
            .alias("x_c")
        )
        .localCheckpoint(eager=True)
    )
    r = cells.select("pri", "sta", "x_c", F.col("x_c").alias("res"))
    row_eff = cells.select("pri").distinct().withColumn("a", F.lit(0).cast("bigint"))
    col_eff = cells.select("sta").distinct().withColumn("b", F.lit(0).cast("bigint"))
    for _ in range(_POLISH_SWEEPS):
        rm = _lower_median(r, "pri", "res")
        row_eff = (
            row_eff.join(rm, "pri")
            .select("pri", (F.col("a") + F.col("med")).alias("a"))
        )
        r = (
            r.join(F.broadcast(rm), "pri")
            .select("pri", "sta", "x_c", (F.col("res") - F.col("med")).alias("res"))
        )
        cm = _lower_median(r, "sta", "res")
        col_eff = (
            col_eff.join(cm, "sta")
            .select("sta", (F.col("b") + F.col("med")).alias("b"))
        )
        r = (
            r.join(F.broadcast(cm), "sta")
            .select("pri", "sta", "x_c", (F.col("res") - F.col("med")).alias("res"))
        )
    return (
        r.join(F.broadcast(row_eff), "pri")
        .join(F.broadcast(col_eff), "sta")
        .select("pri", "sta", "x_c", "a", "b", F.col("res").alias("resid_c"))
        .orderBy("pri", "sta")
    )


def _polish_sql() -> str:
    parts = [
        """
WITH cells AS (
  SELECT o_orderpriority AS pri, o_orderstatus AS sta,
         CAST(ROUND(CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
                    / COUNT(*)) AS BIGINT) AS x_c
  FROM orders GROUP BY 1, 2
),
r0 AS (SELECT pri, sta, x_c, x_c AS res FROM cells),
a_init AS (SELECT DISTINCT pri, CAST(0 AS BIGINT) AS eff FROM cells),
b_init AS (SELECT DISTINCT sta, CAST(0 AS BIGINT) AS eff FROM cells)"""
    ]
    step = 0
    for _ in range(_POLISH_SWEEPS):
        for axis, eff in (("pri", "a"), ("sta", "b")):
            prev_eff = f"{eff}_init" if step < 2 else f"{eff}{step - 2}"
            parts.append(
                f""",
m{step} AS (
  SELECT {axis}, med FROM (
    SELECT {axis}, res AS med,
           ROW_NUMBER() OVER (PARTITION BY {axis} ORDER BY res) AS rn,
           COUNT(*) OVER (PARTITION BY {axis}) AS cnt
    FROM r{step}
  ) WHERE rn * 2 = cnt + (cnt % 2)
),
{eff}{step} AS (
  SELECT e.{axis}, e.eff + m{step}.med AS eff
  FROM {prev_eff} e JOIN m{step} USING ({axis})
),
r{step + 1} AS (
  SELECT r.pri, r.sta, r.x_c, r.res - m{step}.med AS res
  FROM r{step} r JOIN m{step} USING ({axis})
)"""
            )
            step += 1
    parts.append(
        f"""
SELECT r.pri, r.sta, r.x_c, ra.eff AS a, rb.eff AS b, r.res AS resid_c
FROM r{step} r
JOIN a{step - 2} ra USING (pri)
JOIN b{step - 1} rb USING (sta)
"""
    )
    return "".join(parts)


_AG_POLISH_SQL = _polish_sql()


QUERIES = {
    "tx_pack_fragmentation": tx_pack_fragmentation,
    "ev_funnel_timebound": ev_funnel_timebound,
    "ag_median_polish": ag_median_polish,
}

ORACLES = {
    "tx_pack_fragmentation": _TX_FRAG_SQL,
    "ev_funnel_timebound": _EV_FUNNEL_TB_SQL,
    "ag_median_polish": _AG_POLISH_SQL,
}
