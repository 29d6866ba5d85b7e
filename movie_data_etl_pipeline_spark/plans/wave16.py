"""Round-3 wave 16: full conditional MERGE (the last missing MERGE
clause shape) and deterministic source-interleaved training order —
closing the merge family and the data-loader surface.

Determinism contract unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.functions import scalar as SC
from movie_data_etl_pipeline_spark.operators import merge
from movie_data_etl_pipeline_spark.sources import load_table


# ---------------------------------------------------------------------------
# o16_merge_conditional — MERGE with clause conditions
# ---------------------------------------------------------------------------


def o16_merge_conditional(spark: SparkSession, sf: str) -> DataFrame:
    """Full conditional MERGE (``merge.merge_conditional``): WHEN
    MATCHED AND <cond> THEN UPDATE, WHEN MATCHED AND <cond> THEN
    DELETE, WHEN NOT MATCHED AND <cond> THEN INSERT — the complete
    ANSI MERGE clause surface the unconditional upsert family
    (O8/O9/o12/o14/o15) does not exercise. Here: matched even-custkey
    rows take the restated price, matched odd-custkey rows are
    retired, and only every fourth unmatched batch row qualifies for
    insert."""
    o = load_table(spark, sf, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        "o_orderpriority",
    )
    target = o.filter(F.col("o_orderkey") % 3 != 0)
    updates = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey",
        "o_custkey",
        F.lit("M").alias("o_orderstatus"),
        SC.money_from_cents(SC.cents("o_totalprice") + 777).alias("o_totalprice"),
        "o_orderdate",
        "o_orderpriority",
    )
    return merge.merge_conditional(
        target,
        updates,
        ["o_orderkey"],
        when_matched_update="u.o_custkey % 2 = 0",
        when_matched_delete="u.o_custkey % 2 = 1",
        when_not_matched_insert="u.o_orderkey % 4 = 0",
    )


_O16_SQL = """
WITH ord AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
         strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_orderpriority
  FROM orders
),
target AS (SELECT * FROM ord WHERE o_orderkey % 3 <> 0),
updates AS (
  SELECT o_orderkey, o_custkey, 'M' AS o_orderstatus,
         CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) + 777 AS DOUBLE) / 100.0
           AS o_totalprice,
         o_orderdate, o_orderpriority
  FROM ord WHERE o_orderkey % 2 = 0
)
-- matched rows where the first clause fires: batch row wins
SELECT u.* FROM updates u JOIN target t USING (o_orderkey)
WHERE u.o_custkey % 2 = 0
-- (matched odd-custkey rows are retired by the second clause; the
-- two matched conditions partition custkeys, so no survivor branch)
UNION ALL
-- target-only rows pass through
SELECT t.* FROM target t
WHERE t.o_orderkey NOT IN (SELECT o_orderkey FROM updates)
UNION ALL
-- unmatched batch rows admitted by the third clause
SELECT u.* FROM updates u
WHERE u.o_orderkey NOT IN (SELECT o_orderkey FROM target)
  AND u.o_orderkey % 4 = 0
"""


# ---------------------------------------------------------------------------
# px_interleave_order — deterministic source-interleaved loader order
# ---------------------------------------------------------------------------


def px_interleave_order(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic round-robin interleaving of training documents
    across sources: global position = (rank within source)·S +
    source index — the data-loader ordering that prevents a large
    source from monopolizing any training window, reproducible
    across runs and engines (the ordering twin of `px_training_mix`'s
    composition weighting).

    Per-source rank is a key-partitioned window; the source index
    comes from a window at SOURCE grain (catalog-bounded) broadcast
    back. No global fact-grain ordering ever materializes — the
    global position is computed, not sorted for."""
    docs = load_table(spark, sf, "documents").select("doc_id", "source")
    srcs = (
        docs.select("source")
        .distinct()
        .withColumn(
            "src_idx",
            F.row_number().over(Window.orderBy("source")) - 1,
        )
    )
    n_src = srcs.groupBy().agg(F.count(F.lit(1)).alias("n_src"))
    wsrc = Window.partitionBy("source").orderBy("doc_id")
    return (
        docs.withColumn("rn", F.row_number().over(wsrc) - 1)
        .join(F.broadcast(srcs), "source")
        .crossJoin(F.broadcast(n_src))
        .select(
            "doc_id",
            "source",
            (F.col("rn") * F.col("n_src") + F.col("src_idx")).alias("global_pos"),
        )
        .orderBy("global_pos")
    )


_PX_INTERLEAVE_SQL = """
WITH srcs AS (
  SELECT source, ROW_NUMBER() OVER (ORDER BY source) - 1 AS src_idx
  FROM (SELECT DISTINCT source FROM documents)
),
n AS (SELECT COUNT(*) AS n_src FROM srcs),
ranked AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) - 1 AS rn
  FROM documents
)
SELECT r.doc_id, r.source,
       CAST(r.rn * n.n_src + s.src_idx AS BIGINT) AS global_pos
FROM ranked r JOIN srcs s USING (source) CROSS JOIN n
"""


QUERIES = {
    "o16_merge_conditional": o16_merge_conditional,
    "px_interleave_order": px_interleave_order,
}

ORACLES = {
    "o16_merge_conditional": _O16_SQL,
    "px_interleave_order": _PX_INTERLEAVE_SQL,
}
