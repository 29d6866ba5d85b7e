"""Round-4 wave 32: edit-distance journey similarity (prefix-blocked
levenshtein join).

Determinism contract unchanged — levenshtein is an exact integer in
both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.sources import load_table

_ED_MAX = 4
_ED_PREFIX = 3
_ED_TRUNC = 12  # compare journey OPENINGS: the first 12 steps


def ev_journey_editdist(spark: SparkSession, sf: str) -> DataFrame:
    """User-journey similarity by EDIT DISTANCE: each user's event
    sequence collapses to an opcode string (the `ev_pattern_match`
    encoding), and user pairs whose journeys are within levenshtein
    distance 4 are reported — the sequence-level near-dup detector
    (bot rings, scripted traffic, duplicated sessions) that token-set
    methods (MinHash etc.) miss because ORDER is the signal.

    Candidate generation is prefix blocking: only pairs sharing the
    first 3 opcodes AND within a ±3 length band are compared — the
    documented recall trade (journeys diverging in their first three
    steps are not near-duplicates for this purpose); sequences are
    truncated to their first 12 steps — the OPENING is where scripted
    traffic repeats and where edit distance is discriminative (whole
    50-step journeys are almost never within distance 3) — and the standard
    way an O(len²)-per-pair verifier survives scale: block sizes are
    bounded by the opcode-prefix domain, never all-pairs. Distance is
    an exact integer in both engines. Top-100 by (dist, user_a,
    user_b)."""
    ev = load_table(spark, sf, "events").select(
        "user_id",
        F.struct("ts", "event_id", F.upper(F.substring("event_type", 1, 1)).alias("op")).alias("e"),
    )
    seqs = (
        ev.groupBy("user_id")
        .agg(
            F.substring(
                F.concat_ws(
                    "", F.transform(F.array_sort(F.collect_list("e")), lambda x: x["op"])
                ),
                1,
                _ED_TRUNC,
            ).alias("s")
        )
        .filter(F.length("s") >= _ED_PREFIX)
        .select(
            "user_id",
            "s",
            F.substring("s", 1, _ED_PREFIX).alias("blk"),
            F.length("s").alias("ln"),
        )
    )
    a, b = seqs.alias("a"), seqs.alias("b")
    pairs = a.join(
        b,
        (F.col("a.blk") == F.col("b.blk"))
        & (F.col("a.user_id") < F.col("b.user_id"))
        & (F.abs(F.col("a.ln") - F.col("b.ln")) <= _ED_MAX),
    ).select(
        F.col("a.user_id").alias("user_a"),
        F.col("b.user_id").alias("user_b"),
        F.levenshtein(F.col("a.s"), F.col("b.s")).cast("bigint").alias("dist"),
        F.col("a.ln").cast("bigint").alias("len_a"),
        F.col("b.ln").cast("bigint").alias("len_b"),
    )
    return (
        pairs.filter(F.col("dist") <= _ED_MAX)
        .orderBy("dist", "user_a", "user_b")
        .limit(100)
    )


_EV_EDITDIST_SQL = f"""
WITH seqs AS (
  SELECT user_id,
         substr(string_agg(upper(substr(event_type, 1, 1)), '' ORDER BY ts, event_id),
                1, {_ED_TRUNC}) AS s
  FROM events GROUP BY user_id
),
keyed AS (
  SELECT user_id, s, substr(s, 1, {_ED_PREFIX}) AS blk, length(s) AS ln
  FROM seqs WHERE length(s) >= {_ED_PREFIX}
)
SELECT a.user_id AS user_a, b.user_id AS user_b,
       CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist,
       CAST(a.ln AS BIGINT) AS len_a, CAST(b.ln AS BIGINT) AS len_b
FROM keyed a JOIN keyed b
  ON a.blk = b.blk AND a.user_id < b.user_id AND ABS(a.ln - b.ln) <= {_ED_MAX}
WHERE levenshtein(a.s, b.s) <= {_ED_MAX}
ORDER BY dist, user_a, user_b
LIMIT 100
"""


QUERIES = {"ev_journey_editdist": ev_journey_editdist}
ORACLES = {"ev_journey_editdist": _EV_EDITDIST_SQL}
