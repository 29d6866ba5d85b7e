"""Round-4 wave 43: quality-filter funnel and dedup-impact report —
the two attrition accountings every training-data pipeline publishes.

Determinism contract: every filter predicate is pure integer
arithmetic (ratio thresholds stated as cross-multiplications, never
double compares), so stage membership is engine-exact; dedup impact
is exact token counts under the md5-canonical keep rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.sources import load_table


def _doc_token_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Per-doc token statistics from one (doc, token) aggregation:
    n_tokens, n_distinct, top-token frequency, summed token length."""
    docs = load_table(spark, sf, "documents").select("doc_id", "text", "n_chars")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).filter(F.col("tok") != "")
    per_tok = toks.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    stats = per_tok.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        F.max("c").cast("bigint").alias("top_freq"),
        F.sum(F.length("tok") * F.col("c")).cast("bigint").alias("sum_len"),
    )
    return docs.select("doc_id", "n_chars").join(stats, "doc_id")


# (stage name, integer predicate as a SQL boolean over the stats row)
_FUNNEL_STAGES = [
    ("len_chars", "n_chars >= 80"),
    ("min_tokens", "n_tokens >= 15"),
    ("repetition", "4 * top_freq <= n_tokens"),  # top-token share <= 25%
    ("ttr", "5 * n_distinct >= 2 * n_tokens"),  # type-token ratio >= 0.4
    ("word_len", "3 * n_tokens <= sum_len AND sum_len <= 12 * n_tokens"),
]


def tx_filter_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """Quality-filter funnel: the corpus walks five sequential filters
    (length, token count, repetition cap, type-token ratio, mean word
    length band — every threshold a pure integer cross-multiplication,
    so stage membership is engine-exact) and each stage reports
    survivors, docs dropped AT that stage, and a survivor id checksum.
    Stage 0 is the intake row. One (doc, token) aggregation feeds all
    five predicates — the filters are priced on the same pass, the way
    a production curation pipeline fuses its cheap filters."""
    stats = _doc_token_stats(spark, sf)
    cum = F.lit(True)
    stage_cols = []
    for name, pred in _FUNNEL_STAGES:
        cum = cum & F.expr(pred)
        stage_cols.append(cum.alias(f"pass_{name}"))
    flagged = stats.select("doc_id", *stage_cols)
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("n_stage0"),
        F.sum("doc_id").cast("bigint").alias("ck_stage0"),
    ]
    for name, _ in _FUNNEL_STAGES:
        aggs.append(
            F.sum(F.col(f"pass_{name}").cast("bigint")).cast("bigint").alias(f"n_{name}")
        )
        aggs.append(
            F.sum(F.when(F.col(f"pass_{name}"), F.col("doc_id")))
            .cast("bigint")
            .alias(f"ck_{name}")
        )
    one = flagged.agg(*aggs)
    rows = [
        F.struct(
            F.lit(0).cast("bigint").alias("stage"),
            F.lit("intake").alias("filter"),
            F.col("n_stage0").alias("survivors"),
            F.lit(0).cast("bigint").alias("dropped_here"),
            F.col("ck_stage0").alias("checksum"),
        )
    ]
    prev = "n_stage0"
    for i, (name, _) in enumerate(_FUNNEL_STAGES, start=1):
        rows.append(
            F.struct(
                F.lit(i).cast("bigint").alias("stage"),
                F.lit(name).alias("filter"),
                F.col(f"n_{name}").alias("survivors"),
                (F.col(prev) - F.col(f"n_{name}")).cast("bigint").alias("dropped_here"),
                F.col(f"ck_{name}").alias("checksum"),
            )
        )
        prev = f"n_{name}"
    return (
        one.select(F.explode(F.array(*rows)).alias("r"))
        .select("r.stage", "r.filter", "r.survivors", "r.dropped_here", "r.checksum")
        .orderBy("stage")
    )


def _funnel_sql() -> str:
    preds = []
    cum = "TRUE"
    for name, pred in _FUNNEL_STAGES:
        cum = f"({cum} AND {pred})"
        preds.append((name, cum))
    sel = [
        "COUNT(*)::BIGINT AS n_stage0",
        "CAST(SUM(doc_id) AS BIGINT) AS ck_stage0",
    ]
    for name, cum in preds:
        sel.append(f"CAST(SUM(CASE WHEN {cum} THEN 1 ELSE 0 END) AS BIGINT) AS n_{name}")
        sel.append(
            f"CAST(SUM(CASE WHEN {cum} THEN doc_id END) AS BIGINT) AS ck_{name}"
        )
    rows = [
        "SELECT CAST(0 AS BIGINT) AS stage, 'intake' AS filter,"
        " n_stage0 AS survivors, CAST(0 AS BIGINT) AS dropped_here,"
        " ck_stage0 AS checksum FROM one"
    ]
    prev = "n_stage0"
    for i, (name, _) in enumerate(_FUNNEL_STAGES, start=1):
        rows.append(
            f"SELECT {i}, '{name}', n_{name},"
            f" CAST({prev} - n_{name} AS BIGINT), ck_{name} FROM one"
        )
        prev = f"n_{name}"
    return f"""
WITH toks AS (
  SELECT doc_id, tok, COUNT(*)::BIGINT AS c
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
  WHERE tok <> ''
  GROUP BY 1, 2
),
stats AS (
  SELECT d.doc_id, d.n_chars,
         CAST(SUM(c) AS BIGINT) AS n_tokens,
         COUNT(*)::BIGINT AS n_distinct,
         CAST(MAX(c) AS BIGINT) AS top_freq,
         CAST(SUM(length(tok) * c) AS BIGINT) AS sum_len
  FROM documents d JOIN toks USING (doc_id)
  GROUP BY 1, 2
),
one AS (
  SELECT {", ".join(sel)} FROM stats
)
{" UNION ALL ".join(rows)}
ORDER BY stage
"""


_TX_FUNNEL_SQL = _funnel_sql()


def qa_dup_impact(spark: SparkSession, sf: str) -> DataFrame:
    """Dedup-impact report: per source, the docs and whitespace tokens
    removed by exact dedup under the md5-canonical keep rule (within
    each identical-text group the doc with the smallest
    (md5(doc_id), doc_id) survives — `sa_stratified_sample`'s
    engine-portable arbiter). The "how much does dedup save"
    accounting a corpus datacard publishes; exact integer token
    counts, one text-hash shuffle."""
    docs = load_table(spark, sf, "documents").select(
        "doc_id", "source", "text"
    ).withColumn("n_tok", F.size(F.split("text", " ")).cast("bigint"))
    keyed = docs.withColumn("fp", F.md5(F.col("text").cast("binary")))
    winner = keyed.groupBy("fp").agg(
        F.min(F.struct(F.md5(F.col("doc_id").cast("string")), "doc_id")).alias("w")
    )
    tagged = keyed.join(winner, "fp").withColumn(
        "kept", F.col("doc_id") == F.col("w.doc_id")
    )
    return (
        tagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum((~F.col("kept")).cast("bigint")).cast("bigint").alias("n_removed"),
            F.sum("n_tok").cast("bigint").alias("tok_total"),
            F.sum(F.when(~F.col("kept"), F.col("n_tok")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("tok_removed"),
        )
        .select(
            "source",
            "n_docs",
            "n_removed",
            "tok_total",
            "tok_removed",
            (
                F.col("tok_removed").cast("double")
                / F.col("tok_total").cast("double")
            ).alias("removal_ratio"),
        )
        .orderBy("source")
    )


_QA_DUP_IMPACT_SQL = """
WITH docs AS (
  SELECT doc_id, source, text,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         md5(text) AS fp
  FROM documents
),
winner AS (
  SELECT fp, MIN(struct_pack(m := md5(CAST(doc_id AS VARCHAR)), doc_id := doc_id)) AS w
  FROM docs GROUP BY fp
),
tagged AS (
  SELECT d.source, d.n_tok,
         (d.doc_id = (w.w).doc_id) AS kept
  FROM docs d JOIN winner w USING (fp)
)
SELECT source,
       COUNT(*)::BIGINT AS n_docs,
       CAST(SUM(CASE WHEN NOT kept THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       CAST(SUM(n_tok) AS BIGINT) AS tok_total,
       CAST(SUM(CASE WHEN NOT kept THEN n_tok ELSE 0 END) AS BIGINT)
         AS tok_removed,
       CAST(SUM(CASE WHEN NOT kept THEN n_tok ELSE 0 END) AS DOUBLE)
         / CAST(SUM(n_tok) AS DOUBLE) AS removal_ratio
FROM tagged
GROUP BY source
ORDER BY source
"""


QUERIES = {
    "tx_filter_funnel": tx_filter_funnel,
    "qa_dup_impact": qa_dup_impact,
}

ORACLES = {
    "tx_filter_funnel": _TX_FUNNEL_SQL,
    "qa_dup_impact": _QA_DUP_IMPACT_SQL,
}
