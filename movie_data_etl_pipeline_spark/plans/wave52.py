"""Round-4 wave 52: end-to-end curation pipeline — exact dedup →
quality filter → target-mixture resample — as ONE oracle-checked
composition.

Determinism contract: every stage is individually engine-exact (the
md5-canonical dedup arbiter of `qa_dup_impact`, the integer filter
predicates of `tx_filter_funnel`, the dyadic-weight md5-uniform
acceptance of `sa_mixture_sample`), so the COMPOSITION is too — this
query exists to prove the operators compose without accumulating
nondeterminism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.operators import sampling
from movie_data_etl_pipeline_spark.sources import load_table

# dyadic target mixture (exact doubles summing to 1.0 — the
# sa_mixture_sample knife-edge argument)
_MIX = {"en": 0.375, "de": 0.1875, "fr": 0.1875, "es": 0.125, "zh": 0.125}


def px_curation_e2e(spark: SparkSession, sf: str) -> DataFrame:
    """The curation pipeline a training-data team actually ships, as
    one plan: (1) exact dedup under the md5-canonical keep arbiter,
    (2) cheap quality filters (length ≥ 80 chars, ≥ 15 tokens — pure
    integer predicates), (3) resample the survivors to the target
    language mixture (`operators/sampling.mixture_sample`). Output:
    per-language kept docs, kept whitespace tokens, and an id
    checksum — the datacard row of the final corpus. At 100 TB each
    stage is one keyed shuffle or a broadcast-rate filter; nothing
    here is new machinery, which is the point: composition holds."""
    docs = load_table(spark, sf, "documents").select("doc_id", "lang", "text")
    keyed = docs.withColumn("fp", F.md5(F.col("text").cast("binary")))
    winner = keyed.groupBy("fp").agg(
        F.min(F.struct(F.md5(F.col("doc_id").cast("string")), "doc_id")).alias("w")
    )
    deduped = (
        keyed.join(winner, "fp")
        .filter(F.col("doc_id") == F.col("w.doc_id"))
        .select("doc_id", "lang", "text")
    )
    filtered = deduped.filter(
        (F.length("text") >= 80) & (F.size(F.split("text", " ")) >= 15)
    )
    mixed = sampling.mixture_sample(filtered, "lang", _MIX, "doc_id")
    return (
        mixed.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.size(F.split("text", " ")).cast("bigint"))
            .cast("bigint")
            .alias("n_tokens"),
            F.sum("doc_id").cast("bigint").alias("checksum"),
        )
        .orderBy("lang")
    )


def _mix_values() -> str:
    return ", ".join(f"('{k}', {v})" for k, v in _MIX.items())


_PX_E2E_SQL = f"""
WITH keyed AS (
  SELECT doc_id, lang, text, md5(text) AS fp FROM documents
),
winner AS (
  SELECT fp, MIN(struct_pack(m := md5(CAST(doc_id AS VARCHAR)), doc_id := doc_id)) AS w
  FROM keyed GROUP BY fp
),
deduped AS (
  SELECT k.doc_id, k.lang, k.text
  FROM keyed k JOIN winner USING (fp)
  WHERE k.doc_id = (winner.w).doc_id
),
filtered AS (
  SELECT * FROM deduped
  WHERE length(text) >= 80 AND len(string_split(text, ' ')) >= 15
),
w(lang, __w) AS (SELECT * FROM (VALUES {_mix_values()}) t),
c AS (SELECT lang, COUNT(*) AS __n FROM filtered GROUP BY lang),
f AS (SELECT c.lang, c.__n, w.__w FROM c JOIN w USING (lang)),
cap AS (SELECT MIN(__n / __w) AS __cap FROM f),
r AS (SELECT lang, __w * (SELECT __cap FROM cap) / __n AS __rate FROM f),
mixed AS (
  SELECT d.doc_id, d.lang, d.text
  FROM filtered d JOIN r USING (lang)
  WHERE CAST(('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 12)) AS BIGINT)
          / 281474976710656.0 < r.__rate
)
SELECT lang,
       COUNT(*)::BIGINT AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
       CAST(SUM(doc_id) AS BIGINT) AS checksum
FROM mixed
GROUP BY lang
ORDER BY lang
"""


QUERIES = {
    "px_curation_e2e": px_curation_e2e,
}

ORACLES = {
    "px_curation_e2e": _PX_E2E_SQL,
}
