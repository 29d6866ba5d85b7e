"""Deterministic training-shard export.

The last step of a corpus pipeline is physical: split the curated
corpus into N stable shards so a training job can stream them with
per-worker assignment and resumable offsets. Two properties matter at
100 TB:

* **Determinism** — shard membership must be a pure function of a
  stable key (never ``rand()`` or partition index), so a re-run after
  a failure, a backfill, or an incremental append places every
  document in the same shard and downstream sample orders are
  reproducible.
* **Balance** — shards must be near-uniform in bytes/tokens, or the
  slowest shard gates every training epoch.

Both come from hashing the key through md5 (the house uniform-hash
convention, shared with ``operators/sampling``: first 12 hex digits →
48-bit integer). A 48-bit integer mod N is uniform to ~2^-48 bias per
shard — byte-balance then follows from doc-size independence, which
the manifest query verifies rather than assumes.

The physical write routes rows with ONE hash-shuffle
(``repartition(n, shard)``) so each task writes exactly one shard
directory (``partitionBy`` then splits no further) — at cluster scale
that is one wave of N writers, no small-files explosion, and the
output layout (``shard=K/part-*.parquet``) is partition-prunable for
per-shard reads.

Reference parity: the reference's terminal step is a bulk INSERT into
one Postgres table (``/root/reference/02_etl.py:118-135``); a sharded
columnar layout is the Spark-native rendering of "the load destination"
at a scale one table cannot hold.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 48 bits of md5 → exact BIGINT in every engine (DuckDB, Spark, Python)
# with no double rounding; the same slice sampling.uniform_hash uses.
_HEX_DIGITS = 12


def shard_of(key: Column | str, n_shards: int, salt: str = "shard") -> Column:
    """Stable shard id in ``[0, n_shards)`` as a pure function of
    ``key``: integer arithmetic only (no float boundary risk), salted
    so shard assignment is independent of the sampling/split hashes
    derived from the same key."""
    c = F.col(key) if isinstance(key, str) else key
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{salt}:"), c.cast("string"))), 1, _HEX_DIGITS),
        16,
        10,
    ).cast("long")
    return (h % n_shards).cast("int")


def assign_shards(
    df: DataFrame, key: str, n_shards: int, shard_col: str = "shard"
) -> DataFrame:
    """Add the deterministic shard-id column (narrow, no shuffle)."""
    return df.withColumn(shard_col, shard_of(key, n_shards))


def shard_export(
    df: DataFrame,
    path: str,
    key: str,
    n_shards: int,
    mode: str = "overwrite",
    shard_col: str = "shard",
) -> None:
    """Write ``df`` as ``path/shard=K/`` parquet, one writer wave.

    ``repartition(n_shards, shard_col)`` aligns the physical partitions
    with the output directories BEFORE the write: without it,
    ``partitionBy`` makes every input task open a file in every shard
    directory — tasks × shards small files, the classic 100 TB export
    mistake. Hash-partitioning on the shard column can alias two shard
    ids into one task (and leave some tasks empty), which only affects
    wave parallelism, not layout: each output directory is still
    written whole, and AQE rebalances the rare empty task."""
    shards = assign_shards(df, key, n_shards, shard_col)
    (
        shards.repartition(n_shards, F.col(shard_col))
        .write.mode(mode)
        .partitionBy(shard_col)
        .parquet(path)
    )


def shard_manifest(df: DataFrame, key: str, n_shards: int, size_col: str) -> DataFrame:
    """Per-shard manifest: row/byte totals and the key range, the
    sidecar a training loader consumes (and the balance check for the
    hash). One scan, one partial-aggregated groupBy on the shard id."""
    return (
        assign_shards(df, key, n_shards)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col(size_col).cast("long")).alias("total_size"),
            F.min(key).alias("min_key"),
            F.max(key).alias("max_key"),
        )
        .orderBy("shard")
    )


def range_layout(
    df: DataFrame,
    path: str,
    order_by: tuple[str, ...],
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as globally range-sorted parquet runs: file K holds
    a contiguous, non-overlapping slice of the ``order_by`` key space,
    rows sorted within each file.

    This is the sorted-run layout that makes a single-key access path
    out of plain parquet — the Spark rendering of the reference's
    DESC value btrees (``/root/reference/sql/01_schema.sql:62-65``):
    a reader seeking a key range prunes to the one file whose [min,max]
    straddles it (footer stats), then scans rows already in order.
    Complementary to ``layout.zorder_layout``: z-order trades perfect
    single-key locality for multi-key locality; range layout is the
    optimum when ONE key dominates access.

    ``repartitionByRange`` samples key quantiles so file sizes track
    the data distribution (balanced runs even under skew);
    ``sortWithinPartitions`` costs no extra exchange."""
    out = df.repartitionByRange(*order_by) if n_files is None else df.repartitionByRange(
        n_files, *order_by
    )
    out.sortWithinPartitions(*order_by).write.mode(mode).parquet(path)


def range_manifest(spark, path: str, key: str) -> DataFrame:
    """Per-file (min, max, rows) of ``key`` for a ``range_layout``
    output — the validity proof (non-overlapping ranges) and the
    pruning index a reader would binary-search. One scan of the laid
    table, grouped by provenance file."""
    return (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("file"))
        .agg(
            F.min(key).alias("min_key"),
            F.max(key).alias("max_key"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("min_key")
    )
