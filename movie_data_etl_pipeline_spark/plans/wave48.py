"""Round-4 wave 48: HLL set operations — audience intersection /
Jaccard between event types by sketch inclusion-exclusion.

Determinism contract: at fixture cardinalities the lg_k=14 HLL is in
exact list mode (the `ap_hll_rollup` argument, fixture_queries:5584),
so every estimate equals the exact distinct count and the whole
derivation is hash-checkable; at production cardinalities the same
plan returns ±0.8% estimates — the trade the pattern exists to make.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.operators import sketches
from movie_data_etl_pipeline_spark.sources import load_table


def ap_hll_setops(spark: SparkSession, sf: str) -> DataFrame:
    """Audience overlap between event types from STORED sketches: one
    per-type HLL user sketch, then for every type pair the union is a
    sketch MERGE and the intersection falls out by inclusion-exclusion
    (|A∩B| = |A|+|B|−|A∪B|) with the Jaccard ratio — the
    sketch-algebra answer to `ev_audience_overlap`'s exact self-join,
    at profile (not fact) cost: the pair stage touches #types² sketch
    rows, never the events table. Per-pair outputs are exact ints here
    (list-mode sketches) and fixed doubles for the ratio."""
    ev = load_table(spark, sf, "events").select("event_type", "user_id")
    prof = sketches.hll_profile(ev, ["event_type"], "user_id")
    singles = prof.select(
        "event_type", F.hll_sketch_estimate("sk").cast("bigint").alias("n")
    )
    a = prof.select(F.col("event_type").alias("type_a"), F.col("sk").alias("sk_a"))
    b = prof.select(F.col("event_type").alias("type_b"), F.col("sk").alias("sk_b"))
    pairs = a.join(b, F.col("type_a") < F.col("type_b"))
    unions = pairs.select(
        "type_a",
        "type_b",
        F.hll_sketch_estimate(F.hll_union("sk_a", "sk_b"))
        .cast("bigint")
        .alias("n_union"),
    )
    return (
        unions.join(singles.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a")), "type_a")
        .join(singles.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b")), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            "n_union",
            (F.col("n_a") + F.col("n_b") - F.col("n_union")).alias("n_inter"),
            (
                (F.col("n_a") + F.col("n_b") - F.col("n_union")).cast("double")
                / F.col("n_union").cast("double")
            ).alias("jaccard"),
        )
        .orderBy("type_a", "type_b")
    )


_AP_HLL_SETOPS_SQL = """
WITH s AS (
  SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n
  FROM events GROUP BY 1
),
u AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM events e
          WHERE e.event_type IN (a.event_type, b.event_type)) AS n_union
  FROM s a JOIN s b ON a.event_type < b.event_type
)
SELECT type_a, type_b, sa.n AS n_a, sb.n AS n_b, n_union,
       CAST(sa.n + sb.n - n_union AS BIGINT) AS n_inter,
       CAST(sa.n + sb.n - n_union AS DOUBLE) / CAST(n_union AS DOUBLE)
         AS jaccard
FROM u
JOIN s sa ON sa.event_type = type_a
JOIN s sb ON sb.event_type = type_b
ORDER BY type_a, type_b
"""


QUERIES = {
    "ap_hll_setops": ap_hll_setops,
}

ORACLES = {
    "ap_hll_setops": _AP_HLL_SETOPS_SQL,
}
