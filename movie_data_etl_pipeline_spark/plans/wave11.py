"""Round-3 wave 11: causal measurement (difference-in-differences),
survey-style weight calibration (iterative proportional fitting), and
index-accelerated substring search — the analyst-facing closers on
the waves 8–10 curation layer.

Determinism contract unchanged: exact integer state everywhere a sum
crosses rows; the IPF weights are re-snapped to nano integers after
every half-step so both engines iterate in lockstep (the
`ev_markov_reach` discipline for iterative float algorithms).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.functions import scalar as SC
from movie_data_etl_pipeline_spark.sources import load_table


# ---------------------------------------------------------------------------
# ag_did — difference-in-differences
# ---------------------------------------------------------------------------

_DID_CUTOFF = "1998-01-01"


def ag_did(spark: SparkSession, sf: str) -> DataFrame:
    """Difference-in-differences estimate of a treatment effect on
    order value: treated = customers of even-keyed nations, post =
    orders from 1998 on. DiD = (treated_post − treated_pre) −
    (control_post − control_pre), the standard parallel-trends
    estimator that a naive before/after comparison (which absorbs the
    market-wide trend) gets wrong.

    One conditional aggregation produces all four cells; the four
    means are snapped to whole cents BEFORE the double differencing,
    so the estimate is pure integer arithmetic. The nation flag
    arrives via a broadcast dimension join — the fact table shuffles
    zero times."""
    cutoff = F.lit(_DID_CUTOFF).cast("timestamp")
    cust = load_table(spark, sf, "customer").select(
        "c_custkey", (F.col("c_nationkey") % 2 == 0).alias("treated")
    )
    o = (
        load_table(spark, sf, "orders")
        .select("o_custkey", "o_orderdate", SC.cents("o_totalprice").alias("vc"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select("treated", (F.col("o_orderdate") >= cutoff).alias("post"), "vc")
    )

    def cell(t: bool, p: bool, what: str):
        cond = (F.col("treated") == t) & (F.col("post") == p)
        if what == "n":
            return F.sum(cond.cast("bigint"))
        return F.sum(F.when(cond, F.col("vc")).otherwise(F.lit(0)))

    agg = o.agg(
        *[
            expr.alias(name)
            for name, expr in [
                ("n_tp", cell(True, False, "n")),
                ("s_tp", cell(True, False, "s")),
                ("n_ta", cell(True, True, "n")),
                ("s_ta", cell(True, True, "s")),
                ("n_cp", cell(False, False, "n")),
                ("s_cp", cell(False, False, "s")),
                ("n_ca", cell(False, True, "n")),
                ("s_ca", cell(False, True, "s")),
            ]
        ]
    )
    mean = lambda s, n: F.round(F.col(s) / F.col(n).cast("double")).cast("bigint")  # noqa: E731
    m = agg.select(
        mean("s_tp", "n_tp").alias("treated_pre_c"),
        mean("s_ta", "n_ta").alias("treated_post_c"),
        mean("s_cp", "n_cp").alias("control_pre_c"),
        mean("s_ca", "n_ca").alias("control_post_c"),
        "n_tp", "n_ta", "n_cp", "n_ca",
    )
    return m.select(
        "treated_pre_c",
        "treated_post_c",
        "control_pre_c",
        "control_post_c",
        (
            (F.col("treated_post_c") - F.col("treated_pre_c"))
            - (F.col("control_post_c") - F.col("control_pre_c"))
        ).alias("did_c"),
        (F.col("n_tp") + F.col("n_ta") + F.col("n_cp") + F.col("n_ca")).alias(
            "n_orders"
        ),
    )


_AG_DID_SQL = f"""
WITH o AS (
  SELECT (c.c_nationkey % 2 = 0) AS treated,
         (ord.o_orderdate >= TIMESTAMP '{_DID_CUTOFF} 00:00:00') AS post,
         CAST(ROUND(ord.o_totalprice * 100) AS BIGINT) AS vc
  FROM orders ord JOIN customer c ON ord.o_custkey = c.c_custkey
),
agg AS (
  SELECT
    CAST(SUM(CASE WHEN treated AND NOT post THEN 1 ELSE 0 END) AS BIGINT) AS n_tp,
    CAST(SUM(CASE WHEN treated AND NOT post THEN vc ELSE 0 END) AS BIGINT) AS s_tp,
    CAST(SUM(CASE WHEN treated AND post THEN 1 ELSE 0 END) AS BIGINT) AS n_ta,
    CAST(SUM(CASE WHEN treated AND post THEN vc ELSE 0 END) AS BIGINT) AS s_ta,
    CAST(SUM(CASE WHEN NOT treated AND NOT post THEN 1 ELSE 0 END) AS BIGINT) AS n_cp,
    CAST(SUM(CASE WHEN NOT treated AND NOT post THEN vc ELSE 0 END) AS BIGINT) AS s_cp,
    CAST(SUM(CASE WHEN NOT treated AND post THEN 1 ELSE 0 END) AS BIGINT) AS n_ca,
    CAST(SUM(CASE WHEN NOT treated AND post THEN vc ELSE 0 END) AS BIGINT) AS s_ca
  FROM o
),
m AS (
  SELECT CAST(ROUND(CAST(s_tp AS DOUBLE) / CAST(n_tp AS DOUBLE)) AS BIGINT) AS treated_pre_c,
         CAST(ROUND(CAST(s_ta AS DOUBLE) / CAST(n_ta AS DOUBLE)) AS BIGINT) AS treated_post_c,
         CAST(ROUND(CAST(s_cp AS DOUBLE) / CAST(n_cp AS DOUBLE)) AS BIGINT) AS control_pre_c,
         CAST(ROUND(CAST(s_ca AS DOUBLE) / CAST(n_ca AS DOUBLE)) AS BIGINT) AS control_post_c,
         n_tp + n_ta + n_cp + n_ca AS n_orders
  FROM agg
)
SELECT treated_pre_c, treated_post_c, control_pre_c, control_post_c,
       (treated_post_c - treated_pre_c) - (control_post_c - control_pre_c)
         AS did_c,
       n_orders
FROM m
"""


# ---------------------------------------------------------------------------
# ag_raking — iterative proportional fitting (survey calibration)
# ---------------------------------------------------------------------------

_RAKE_ROUNDS = 2  # full IPF rounds (each = one row step + one column step)


def ag_raking(spark: SparkSession, sf: str) -> DataFrame:
    """Survey-style weight calibration by iterative proportional
    fitting on the (priority × status) grid: find per-cell weights
    whose weighted marginals match UNIFORM targets on both axes — the
    raking step every reweighted analysis (or training-mix
    rebalancing à la `px_training_mix`) runs when the sample's joint
    distribution is skewed.

    2 unrolled IPF rounds; weights live as nano integers and are
    re-snapped after every half-step, each scale factor being ONE
    double expression over exactly-converted integers — engine
    lockstep for the classic iterative algorithm. Everything after
    the one fact-grain count runs at CELL grain (≤ |priorities|·
    |statuses| rows)."""
    cells = (
        load_table(spark, sf, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("pri"),
            F.col("o_orderstatus").alias("sta"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    tot = cells.agg(
        F.sum("n").alias("nn"),
        F.countDistinct("pri").alias("npri"),
        F.countDistinct("sta").alias("nsta"),
    )
    w = cells.select("pri", "sta", "n", F.lit(10**9).cast("bigint").alias("w"))
    for _ in range(_RAKE_ROUNDS):
        for axis, n_axis in (("pri", "npri"), ("sta", "nsta")):
            marg = w.groupBy(axis).agg(
                F.sum(F.col("n").cast("decimal(38,0)") * F.col("w")).alias("ms")
            )
            w = (
                w.join(F.broadcast(marg), axis)
                .crossJoin(F.broadcast(tot))
                .select(
                    "pri",
                    "sta",
                    "n",
                    F.round(
                        F.col("w").cast("double")
                        * F.col("nn").cast("double")
                        * F.lit(1e9)
                        / (F.col(n_axis).cast("double") * F.col("ms").cast("double"))
                    )
                    .cast("bigint")
                    .alias("w"),
                )
            )
    return (
        w.select(
            "pri",
            "sta",
            "n",
            F.round(F.col("w") / 1e9, 6).alias("weight"),
            F.round(F.col("n") * F.col("w") / 1e9, 4).alias("weighted_n"),
        )
        .orderBy("pri", "sta")
    )


def _rake_step(r: int, axis: str, n_axis: str) -> str:
    prev = f"w{r}"
    return f"""
m{r} AS (
  SELECT {axis}, SUM(n * w) AS ms FROM {prev} GROUP BY {axis}
),
w{r + 1} AS (
  SELECT p.pri, p.sta, p.n,
         CAST(ROUND(CAST(p.w AS DOUBLE) * CAST(t.nn AS DOUBLE) * 1e9
                    / (CAST(t.{n_axis} AS DOUBLE) * CAST(m{r}.ms AS DOUBLE)))
              AS BIGINT) AS w
  FROM {prev} p JOIN m{r} USING ({axis}) CROSS JOIN tot t
)"""


_AG_RAKE_SQL = (
    """
WITH cells AS (
  SELECT o_orderpriority AS pri, o_orderstatus AS sta, COUNT(*) AS n
  FROM orders GROUP BY 1, 2
),
tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS nn,
         COUNT(DISTINCT pri) AS npri,
         COUNT(DISTINCT sta) AS nsta
  FROM cells
),
w0 AS (SELECT pri, sta, n, CAST(1000000000 AS BIGINT) AS w FROM cells),"""
    + ",".join(
        _rake_step(r, axis, n_axis)
        for r, (axis, n_axis) in enumerate(
            [("pri", "npri"), ("sta", "nsta")] * _RAKE_ROUNDS
        )
    )
    + f"""
SELECT pri, sta, n,
       ROUND(w / 1e9, 6) AS weight,
       ROUND(n * w / 1e9, 4) AS weighted_n
FROM w{2 * _RAKE_ROUNDS}
"""
)


# ---------------------------------------------------------------------------
# ix_trigram_search — index-accelerated substring search
# ---------------------------------------------------------------------------

_TRIGRAM_NEEDLE = "stream"


def _needle_trigrams(needle: str) -> list[str]:
    return sorted({needle[i : i + 3] for i in range(len(needle) - 2)})


def ix_trigram_search(spark: SparkSession, sf: str) -> DataFrame:
    """Substring search through a trigram index: a document can
    contain the needle only if it contains EVERY trigram of the
    needle, so candidates = docs whose (distinct) trigram sets cover
    the needle's — the pruning a `%needle%` LIKE scan cannot get from
    a B-tree, and the reason engines (pg_trgm, code-search indexes)
    keep trigram postings. The verify pass runs `contains` on the
    candidates only.

    Scale: the index build explodes each doc once at character grain
    and keeps ONLY the needle's trigrams (the filter is pushed inside
    the explode projection — the posting list materialized is
    |needle_trigrams|-bounded per doc, not |text|); candidate check
    is one groupBy counting distinct covered trigrams. On a real
    deployment the full trigram posting table is built once and
    reused across needles."""
    tgs = _needle_trigrams(_TRIGRAM_NEEDLE)
    docs = load_table(spark, sf, "documents").select("doc_id", "text", "n_chars")
    posting = (
        docs.filter(F.length("text") >= 3)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), F.length("text") - 2)).alias("i"),
            "text",
        )
        .select("doc_id", F.expr("substring(text, i, 3)").alias("tg"))
        .filter(F.col("tg").isin(tgs))
        .distinct()
    )
    cands = (
        posting.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("cov"))
        .filter(F.col("cov") == len(tgs))
        .select("doc_id")
    )
    return (
        docs.join(cands, "doc_id")
        .filter(F.col("text").contains(_TRIGRAM_NEEDLE))
        .select("doc_id", "n_chars")
        .orderBy("doc_id")
    )


_IX_TRIGRAM_SQL = f"""
SELECT doc_id, n_chars
FROM documents
WHERE text LIKE '%{_TRIGRAM_NEEDLE}%'
"""


QUERIES = {
    "ag_did": ag_did,
    "ag_raking": ag_raking,
    "ix_trigram_search": ix_trigram_search,
}

ORACLES = {
    "ag_did": _AG_DID_SQL,
    "ag_raking": _AG_RAKE_SQL,
    "ix_trigram_search": _IX_TRIGRAM_SQL,
}
