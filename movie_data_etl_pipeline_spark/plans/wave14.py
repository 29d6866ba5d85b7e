"""Round-3 wave 14: ML-hygiene and completeness audits — train/test
leakage, embedding centroid drift between data halves, and key-space
gap detection.

Determinism contract unchanged: exact integer state (micro-snapped
centroid differences, key counts), single-IEEE-expression renders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.operators import sampling
from movie_data_etl_pipeline_spark.sources import load_table


# ---------------------------------------------------------------------------
# sa_split_leakage — duplicate text across train/test
# ---------------------------------------------------------------------------


def sa_split_leakage(spark: SparkSession, sf: str) -> DataFrame:
    """Split-internal leakage audit: documents whose TEXT appears in
    both the train and the test side of `sa_hash_split`'s assignment
    — the evaluation-inflating leak hash-splitting by doc_id cannot
    prevent when the corpus carries exact duplicates (the reason
    real pipelines dedup BEFORE splitting; `dd_contamination` is the
    external-benchmark sibling of this internal check).

    One text-grain aggregation of split indicator sums; contamination
    rate = leaked test docs / test docs, integers until the one
    division."""
    docs = sampling.hash_split(
        load_table(spark, sf, "documents"),
        "doc_id",
        {"train": 0.75, "val": 0.125, "test": 0.125},
    ).select("text", "split")
    g = docs.groupBy("text").agg(
        F.sum((F.col("split") == "train").cast("bigint")).alias("n_tr"),
        F.sum((F.col("split") == "test").cast("bigint")).alias("n_te"),
    )
    leaky = (F.col("n_tr") > 0) & (F.col("n_te") > 0)
    return g.agg(
        F.sum("n_tr").alias("n_train"),
        F.sum("n_te").alias("n_test"),
        F.sum(leaky.cast("bigint")).alias("leaky_texts"),
        F.sum(F.when(leaky, F.col("n_te")).otherwise(F.lit(0))).alias(
            "test_docs_leaked"
        ),
    ).select(
        "n_train",
        "n_test",
        "leaky_texts",
        "test_docs_leaked",
        F.round(
            F.col("test_docs_leaked") / F.col("n_test").cast("double"), 6
        ).alias("contamination_rate"),
    )


_SA_LEAK_SQL = """
WITH assigned AS (
  SELECT text,
         CASE WHEN u < 0.75 THEN 'train'
              WHEN u < 0.875 THEN 'val'
              ELSE 'test' END AS split
  FROM (
    SELECT text,
           CAST(('0x' || substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 12))
                AS BIGINT) / 281474976710656.0 AS u
    FROM documents
  )
),
g AS (
  SELECT text,
         CAST(SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_tr,
         CAST(SUM(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT) AS n_te
  FROM assigned GROUP BY text
)
SELECT CAST(SUM(n_tr) AS BIGINT) AS n_train,
       CAST(SUM(n_te) AS BIGINT) AS n_test,
       CAST(SUM(CASE WHEN n_tr > 0 AND n_te > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS leaky_texts,
       CAST(SUM(CASE WHEN n_tr > 0 AND n_te > 0 THEN n_te ELSE 0 END) AS BIGINT)
         AS test_docs_leaked,
       ROUND(CAST(SUM(CASE WHEN n_tr > 0 AND n_te > 0 THEN n_te ELSE 0 END)
                  AS DOUBLE) / CAST(SUM(n_te) AS DOUBLE), 6)
         AS contamination_rate
FROM g
"""


# ---------------------------------------------------------------------------
# emb_centroid_drift — per-label centroid shift between data halves
# ---------------------------------------------------------------------------

_DRIFT_DIMS = 8


def emb_centroid_drift(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding drift monitor: per label, the L2 distance between
    the centroid of the even-keyed half and the odd-keyed half of the
    vectors — the same-model-two-batches check an embedding pipeline
    runs before trusting `sim_label_centroids` downstream (a quiet
    re-embed or feature-order bug shows up here first).

    Per-dimension centroid differences are snapped to micro integers
    via the cross-multiplied form round(1e6·(sₑ·nₒ − sₒ·nₑ)/(nₑ·nₒ)),
    so the squared-sum under the final sqrt is EXACT integer — no
    float aggregation. State lives at (label, dim) grain after one
    fact-grain component aggregation."""
    emb = load_table(spark, sf, "embeddings").select(
        "label",
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode(
            F.slice(
                F.transform(
                    "embedding",
                    lambda x: F.round(x.cast("double") * 1e6).cast("bigint"),
                ),
                1,
                _DRIFT_DIMS,
            )
        ).alias("i", "v"),
    )
    m = emb.groupBy("label", "half", "i").agg(
        F.sum("v").alias("s"), F.count(F.lit(1)).alias("n")
    )
    e = m.filter(F.col("half") == 0).select(
        "label", "i", F.col("s").alias("se"), F.col("n").alias("ne")
    )
    o = m.filter(F.col("half") == 1).select(
        "label", "i", F.col("s").alias("so"), F.col("n").alias("no")
    )
    d = e.join(o, ["label", "i"]).select(
        "label",
        "i",
        "ne",
        "no",
        # components are ALREADY micro-snapped, so the cross-multiplied
        # mean difference is in micro units as-is — no extra scaling
        F.round(
            (F.col("se") * F.col("no") - F.col("so") * F.col("ne"))
            / (F.col("ne") * F.col("no")).cast("double")
        )
        .cast("bigint")
        .alias("du"),
    )
    return (
        d.groupBy("label")
        .agg(
            F.max("ne").alias("n_even"),
            F.max("no").alias("n_odd"),
            F.sum(F.col("du") * F.col("du")).alias("ss"),
            F.max(F.abs("du")).alias("mx"),
        )
        .select(
            F.col("label").cast("bigint").alias("label"),
            "n_even",
            "n_odd",
            F.round(F.sqrt(F.col("ss").cast("double")) / 1e6, 6).alias("l2_drift"),
            F.round(F.col("mx") / 1e6, 6).alias("max_dim_drift"),
        )
        .orderBy("label")
    )


_EMB_DRIFT_SQL = f"""
WITH ex AS (
  SELECT label, vec_id % 2 AS half, g.i,
         CAST(ROUND(CAST(embedding[CAST(g.i AS INT) + 1] AS DOUBLE) * 1e6)
              AS BIGINT) AS v
  FROM embeddings, LATERAL unnest(range({_DRIFT_DIMS})) AS g(i)
),
m AS (
  SELECT label, half, i, CAST(SUM(v) AS BIGINT) AS s, COUNT(*) AS n
  FROM ex GROUP BY 1, 2, 3
),
d AS (
  SELECT e.label, e.i, e.n AS ne, o.n AS no,
         CAST(ROUND((e.s * o.n - o.s * e.n)
                    / CAST(e.n * o.n AS DOUBLE)) AS BIGINT) AS du
  FROM (SELECT * FROM m WHERE half = 0) e
  JOIN (SELECT * FROM m WHERE half = 1) o USING (label, i)
)
SELECT CAST(label AS BIGINT) AS label,
       CAST(MAX(ne) AS BIGINT) AS n_even,
       CAST(MAX(no) AS BIGINT) AS n_odd,
       ROUND(SQRT(CAST(SUM(du * du) AS DOUBLE)) / 1e6, 6) AS l2_drift,
       ROUND(CAST(MAX(ABS(du)) AS DOUBLE) / 1e6, 6) AS max_dim_drift
FROM d GROUP BY label
"""


# ---------------------------------------------------------------------------
# qa_key_gaps — block-grain key-space completeness
# ---------------------------------------------------------------------------

_GAP_BLOCK = 1024


def qa_key_gaps(spark: SparkSession, sf: str) -> DataFrame:
    """Key-space completeness audit: per 1024-key block of
    ``o_orderkey``, how many keys are PRESENT vs the block's expected
    span — a missing ingestion chunk shows up as a block with
    ``missing > 0`` long before any sum drifts (the sequence-number
    rendering of `qa_balance_check`). Runs entirely at BLOCK grain
    after one distinct-count aggregation; no per-key window exists
    anywhere, so the audit costs one scan at any scale. Boundary
    blocks expect only the observed global key range."""
    keys = load_table(spark, sf, "orders").select(F.col("o_orderkey").alias("k"))
    blocks = keys.groupBy(F.expr(f"k DIV {_GAP_BLOCK}").alias("blk")).agg(
        F.countDistinct("k").alias("present")
    )
    bounds = keys.agg(F.min("k").alias("lo"), F.max("k").alias("hi"))
    span_lo = F.greatest(F.col("blk") * _GAP_BLOCK, F.col("lo"))
    span_hi = F.least(F.col("blk") * _GAP_BLOCK + (_GAP_BLOCK - 1), F.col("hi"))
    return (
        blocks.crossJoin(F.broadcast(bounds))
        .select(
            "blk",
            "present",
            (span_hi - span_lo + 1).alias("expected"),
            (span_hi - span_lo + 1 - F.col("present")).alias("missing"),
        )
        .orderBy("blk")
    )


_QA_GAPS_SQL = f"""
WITH blocks AS (
  SELECT o_orderkey // {_GAP_BLOCK} AS blk,
         COUNT(DISTINCT o_orderkey) AS present
  FROM orders GROUP BY 1
),
bounds AS (SELECT MIN(o_orderkey) AS lo, MAX(o_orderkey) AS hi FROM orders)
SELECT blk,
       CAST(present AS BIGINT) AS present,
       (LEAST(blk * {_GAP_BLOCK} + {_GAP_BLOCK - 1}, hi)
        - GREATEST(blk * {_GAP_BLOCK}, lo) + 1) AS expected,
       (LEAST(blk * {_GAP_BLOCK} + {_GAP_BLOCK - 1}, hi)
        - GREATEST(blk * {_GAP_BLOCK}, lo) + 1 - present) AS missing
FROM blocks, bounds
"""


QUERIES = {
    "sa_split_leakage": sa_split_leakage,
    "emb_centroid_drift": emb_centroid_drift,
    "qa_key_gaps": qa_key_gaps,
}

ORACLES = {
    "sa_split_leakage": _SA_LEAK_SQL,
    "emb_centroid_drift": _EMB_DRIFT_SQL,
    "qa_key_gaps": _QA_GAPS_SQL,
}
