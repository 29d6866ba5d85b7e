"""Round-4 wave 59: BM25-style ranked retrieval over the corpus.

Determinism contract: tf/df/doc-length are exact int64; the
per-(doc,term) score is one fixed double expression; the per-doc
score sums the THREE fixed query terms via a pivoted left-associated
chain (never an order-sensitive SUM of doubles); idf uses the
log-free monotone ratio (N−df+½)/(df+½) — same ranking family as
BM25's ln(idf), chosen because a per-row libm ln is exactly the
cross-engine ulp trap this repo bans (see ts_periodogram's note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.sources import load_table

_QUERY_TERMS = ["window", "merge", "stream"]
_K1 = 1.2
_B = 0.75
_TOPK = 20


def ix_bm25_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Ranked retrieval for the fixed 3-term query ``window merge
    stream``: postings (doc, term, tf) from one tokenize pass, df per
    term, doc length and corpus-average length, then the BM25 weight
    tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)) · idf per (doc, term) and the
    per-doc score as a pivoted 3-term chain. Top-20 docs via
    distributed TakeOrderedAndProject with id tiebreak. The
    `ix_inverted_index` family's scoring stage — one posting shuffle,
    one doc-grain aggregate, never a cross join."""
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).filter(F.col("tok") != "")
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).cast("bigint").alias("dl"))
    corpus = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("total_len"),
    )
    postings = (
        toks.filter(F.col("tok").isin(*_QUERY_TERMS))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    df = postings.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    scored = (
        postings.join(F.broadcast(df), "tok")
        .join(dl, "doc_id")
        .join(F.broadcast(corpus))
    )
    avgdl = F.col("total_len").cast("double") / F.col("n_docs").cast("double")
    idf = (
        (F.col("n_docs").cast("double") - F.col("df").cast("double") + 0.5)
        / (F.col("df").cast("double") + 0.5)
    )
    w = (
        F.col("tf").cast("double")
        * (1.0 + _K1)
        / (
            F.col("tf").cast("double")
            + _K1 * (1.0 - _B + _B * F.col("dl").cast("double") / avgdl)
        )
    ) * idf
    per_term = scored.select("doc_id", "tok", w.alias("w"))
    piv = per_term.groupBy("doc_id").agg(
        *[
            F.coalesce(
                F.max(F.when(F.col("tok") == t, F.col("w"))), F.lit(0.0)
            ).alias(f"w_{i}")
            for i, t in enumerate(_QUERY_TERMS)
        ],
        F.count(F.lit(1)).cast("bigint").alias("n_terms"),
    )
    score = F.col("w_0") + F.col("w_1") + F.col("w_2")
    return (
        piv.select("doc_id", "n_terms", score.alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(_TOPK)
    )


def _bm25_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in _QUERY_TERMS)
    wcols = ", ".join(
        f"COALESCE(MAX(CASE WHEN tok = '{t}' THEN w END), 0.0) AS w_{i}"
        for i, t in enumerate(_QUERY_TERMS)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, tok
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
  WHERE tok <> ''
),
dl AS (SELECT doc_id, COUNT(*)::BIGINT AS dl FROM toks GROUP BY 1),
corpus AS (
  SELECT COUNT(*)::BIGINT AS n_docs, CAST(SUM(dl) AS BIGINT) AS total_len FROM dl
),
postings AS (
  SELECT doc_id, tok, COUNT(*)::BIGINT AS tf
  FROM toks WHERE tok IN ({terms})
  GROUP BY 1, 2
),
df AS (SELECT tok, COUNT(*)::BIGINT AS df FROM postings GROUP BY 1),
scored AS (
  SELECT p.doc_id, p.tok,
         (CAST(tf AS DOUBLE) * (1.0 + {_K1})
           / (CAST(tf AS DOUBLE)
              + {_K1} * (1.0 - {_B} + {_B} * CAST(dl.dl AS DOUBLE)
                  / (CAST(total_len AS DOUBLE) / CAST(n_docs AS DOUBLE)))))
         * ((CAST(n_docs AS DOUBLE) - CAST(df.df AS DOUBLE) + 0.5)
            / (CAST(df.df AS DOUBLE) + 0.5)) AS w
  FROM postings p
  JOIN df USING (tok)
  JOIN dl USING (doc_id)
  CROSS JOIN corpus
),
piv AS (
  SELECT doc_id, {wcols},
         COUNT(*)::BIGINT AS n_terms
  FROM scored GROUP BY doc_id
)
SELECT doc_id, n_terms, w_0 + w_1 + w_2 AS score
FROM piv
ORDER BY score DESC, doc_id
LIMIT {_TOPK}
"""


_IX_BM25_SQL = _bm25_sql()


QUERIES = {
    "ix_bm25_topk": ix_bm25_topk,
}

ORACLES = {
    "ix_bm25_topk": _IX_BM25_SQL,
}
