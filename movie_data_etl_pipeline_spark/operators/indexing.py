"""Global, order-consistent row numbering without a global window.

The SQL form — ``ROW_NUMBER() OVER (ORDER BY ...)`` with no
PARTITION BY — is semantically what a pipeline needs for stable
example ids, resumable export offsets, or positional train-set
slicing; physically it funnels every row through ONE task (Spark
plans an Exchange SinglePartition + Window) and is the canonical
100 TB scale-killer. This operator computes the identical numbering
with the distributed two-phase prefix count (the same mechanism as
``text_analysis.pack_sequences``' token prefix sum):

1. range-repartition on the order key, so partition index order ==
   global key order;
2. per-partition row counts → a #partitions-row relation; the
   exclusive prefix over THAT is a single-task window over a few
   hundred rows, not the data;
3. broadcast the partition offsets back; each partition numbers its
   own rows in parallel and adds its offset.

Requires ``order_by`` to be a total order (unique key combination)
for a deterministic result — the same caveat SQL ROW_NUMBER carries;
ties within a range partition would be broken arbitrarily.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame, order_by: Sequence[str], out_col: str = "rn"
) -> DataFrame:
    """Attach ``out_col`` = 1-based global rank of the row under
    ``ORDER BY order_by`` — equal to the single-partition window's
    answer, computed at full parallelism.

    The range exchange is materialized once (``localCheckpoint``)
    because two branches observe the partition assignment: the
    totals aggregation and the numbering join. Without pinning, the
    pid↔row mapping would silently depend on Catalyst exchange reuse
    (disabled or re-planned ⇒ two independent range samples could
    disagree). Cost: one cache of the projected relation — callers
    should project to needed columns first at scale."""
    cols = list(order_by)
    # Sort WITHIN the range partitions (no extra exchange), pin the
    # layout, then read the intra-partition position straight out of
    # monotonically_increasing_id: mid = pid·2^33 + position, so
    # position = mid & (2^33−1). This sidesteps the per-pid window
    # entirely — a Window partitioned by __pid would force Catalyst to
    # re-shuffle the FULL data into hashpartitioning(__pid), even
    # though rows already sit in those partitions (RangePartitioning
    # on the keys cannot satisfy a hash requirement on the pid).
    # Caveat: >2^33 rows in one partition would alias — at that point
    # the partition itself is the problem.
    d = (
        df.repartitionByRange(*cols)
        .sortWithinPartitions(*cols)
        .withColumn("__pid", F.spark_partition_id())
        .withColumn("__seq", F.monotonically_increasing_id().bitwiseAND((1 << 33) - 1))
        .localCheckpoint()
    )
    totals = d.groupBy("__pid").agg(F.count(F.lit(1)).alias("__n"))
    prefix = totals.withColumn(
        "__off",
        F.coalesce(
            F.sum("__n").over(
                Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).select("__pid", "__off")
    return (
        d.join(F.broadcast(prefix), "__pid")
        .withColumn(out_col, (F.col("__seq") + F.col("__off") + 1).cast("bigint"))
        .drop("__pid", "__seq", "__off")
    )


def inverted_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_postings: int = 20,
) -> DataFrame:
    """Corpus inverted index at token grain: for every token, its
    document frequency (``df``), collection frequency (``cf``), and
    the first ``max_postings`` doc ids (ascending) as a comma-joined
    posting string — the retrieval/BM25 backbone and the fastest
    "which documents mention X" lookup a curation pipeline has.

    Scale shape: one explode pre-aggregated to (doc, token, tf) —
    the same Zipf-skew bound as the LM scorers: per-doc repetition
    collapses BEFORE the token-keyed shuffle — then a single groupBy
    token. The posting LIST is the part that cannot be unbounded at
    100 TB (the token "the" would accumulate a billion-element array
    in one reducer): postings are truncated to ``max_postings`` ids
    *after* an in-reducer sort of the collected set, and the cap is
    enforced pre-collect by only collecting from docs whose id falls
    in the token's k smallest — approximated here with a per-token
    min-k window, which bounds reducer state to ``max_postings`` rows
    per token before the final agg. ``df``/``cf`` stay exact (computed
    from the full relation, not the capped one).
    """
    from movie_data_etl_pipeline_spark.functions import text as TX
    from movie_data_etl_pipeline_spark.sources.parquet import ensure_min_partitions

    base = ensure_min_partitions(
        docs.select(F.col(id_col).alias("id"), TX.tokens(text_col).alias("t"))
    )
    dt = (
        base.select("id", F.explode("t").alias("token"))
        .groupBy("id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # Exact per-token totals from the full (doc, token, tf) relation.
    totals = dt.groupBy("token").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").cast("bigint").alias("cf"),
    )
    # Bounded posting collection: keep each token's max_postings
    # smallest doc ids before any collect_list — a pre-shuffle
    # WindowGroupLimit caps per-token state (same mechanism as
    # top_n_per_group), so no reducer ever materializes a hot token's
    # full posting list.
    w = Window.partitionBy("token").orderBy(F.asc("id"))
    capped = (
        dt.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= max_postings)
        .groupBy("token")
        .agg(
            F.array_join(F.sort_array(F.collect_list("id")), ",").alias("postings")
        )
    )
    return (
        totals.join(capped, "token")
        .select("token", "df", "cf", "postings")
        .orderBy("token")
    )
