"""Round-4 wave 46: RAKE-style keyword extraction (degree-only
integer scoring).

Determinism contract: candidate phrases are maximal non-stopword runs
found by the gaps-and-islands identity over token positions (pure
integer arithmetic); word degree/frequency and phrase scores are
exact int64 sums, so the ranking is engine-exact — the degree-only
RAKE variant, chosen over deg/freq ratio scoring precisely because it
keeps the pipeline integer-deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.functions.text import STOPWORDS
from movie_data_etl_pipeline_spark.sources import load_table

_RAKE_TOP = 25
_RAKE_MAX_PHRASE = 4


def tx_rake_keywords(spark: SparkSession, sf: str) -> DataFrame:
    """RAKE keyword extraction over the document corpus: split each
    text into candidate phrases at stopword/boundary positions via the
    gaps-and-islands identity (position − per-doc non-stopword rank is
    constant within a run), cap phrases at 4 words, compute per-word
    degree = Σ(phrase length) over containing phrases and freq =
    occurrence count — both exact int64 — then score each DISTINCT
    phrase by Σ word-degrees (degree-only RAKE: integer-deterministic
    where the classic deg/freq ratio sum is float-order-sensitive).
    Top-25 by (score desc, phrase asc) with corpus occurrence counts.
    Scale: token-grain windows are per-doc; word stats and phrase
    scores are two keyed aggregations."""
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "tok"),
    ).filter(F.col("tok") != "")
    sw = F.array(*[F.lit(s) for s in STOPWORDS])
    nonstop = toks.filter(~F.array_contains(sw, F.col("tok")))
    w = Window.partitionBy("doc_id").orderBy("pos")
    runs = nonstop.withColumn(
        "island", F.col("pos") - F.row_number().over(w)
    )
    phrases = (
        runs.groupBy("doc_id", "island")
        .agg(
            # collect_list order is not guaranteed: sort by position
            # before joining (the ev_top_paths discipline)
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda x: x["tok"],
                ),
            ).alias("phrase"),
            F.count(F.lit(1)).cast("bigint").alias("plen"),
        )
        .filter(F.col("plen") <= _RAKE_MAX_PHRASE)
    )
    words = phrases.select(
        "plen", F.explode(F.split("phrase", " ")).alias("word")
    )
    wstats = words.groupBy("word").agg(
        F.sum("plen").cast("bigint").alias("degree"),
        F.count(F.lit(1)).cast("bigint").alias("freq"),
    )
    pwords = phrases.select(
        "phrase", F.explode(F.split("phrase", " ")).alias("word")
    )
    scored = (
        pwords.join(wstats, "word")
        .groupBy("phrase", "word")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("occ_word"),
            F.max("degree").alias("degree"),
        )
        .groupBy("phrase")
        .agg(F.sum(F.col("degree") * F.col("occ_word")).cast("bigint").alias("score"))
    )
    occ = phrases.groupBy("phrase").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occurrences")
    )
    # scored is per-OCCURRENCE word multiset; divide by occurrence count
    # to get the per-phrase score: Σ over the phrase's own words
    return (
        scored.join(occ, "phrase")
        .select(
            "phrase",
            F.expr("score div n_occurrences").cast("bigint").alias("score"),
            "n_occurrences",
        )
        .orderBy(F.desc("score"), F.asc("phrase"))
        .limit(_RAKE_TOP)
    )


_SW_LIST = ", ".join(f"'{s}'" for s in STOPWORDS)

_TX_RAKE_SQL = f"""
WITH toks AS (
  SELECT doc_id, pos - 1 AS pos, tok
  FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
           generate_subscripts(string_split(text, ' '), 1) AS pos
    FROM documents
  )
  WHERE tok <> ''
),
nonstop AS (
  SELECT doc_id, pos, tok FROM toks WHERE tok NOT IN ({_SW_LIST})
),
runs AS (
  SELECT doc_id, pos, tok,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM nonstop
),
phrases AS (
  SELECT doc_id, island,
         string_agg(tok, ' ' ORDER BY pos) AS phrase,
         COUNT(*)::BIGINT AS plen
  FROM runs GROUP BY 1, 2
  HAVING COUNT(*) <= {_RAKE_MAX_PHRASE}
),
words AS (
  SELECT plen, unnest(string_split(phrase, ' ')) AS word FROM phrases
),
wstats AS (
  SELECT word, CAST(SUM(plen) AS BIGINT) AS degree,
         COUNT(*)::BIGINT AS freq
  FROM words GROUP BY 1
),
pwords AS (
  SELECT phrase, unnest(string_split(phrase, ' ')) AS word FROM phrases
),
perword AS (
  SELECT phrase, word, COUNT(*)::BIGINT AS occ_word, MAX(degree) AS degree
  FROM pwords JOIN wstats USING (word)
  GROUP BY 1, 2
),
scored AS (
  SELECT phrase, CAST(SUM(degree * occ_word) AS BIGINT) AS score
  FROM perword GROUP BY 1
),
occ AS (
  SELECT phrase, COUNT(*)::BIGINT AS n_occurrences FROM phrases GROUP BY 1
)
SELECT phrase,
       CAST(score // n_occurrences AS BIGINT) AS score,
       n_occurrences
FROM scored JOIN occ USING (phrase)
ORDER BY score DESC, phrase
LIMIT {_RAKE_TOP}
"""


QUERIES = {
    "tx_rake_keywords": tx_rake_keywords,
}

ORACLES = {
    "tx_rake_keywords": _TX_RAKE_SQL,
}
