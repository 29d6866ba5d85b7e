"""Parquet table sources (SURVEY.md §2.1 S5/S7 → Spark rendering).

The reference bootstraps fixed DDL (``/root/reference/sql/01_schema.sql``)
and loads via batched inserts; the Spark-native equivalent is
schema-declared Parquet scans. Reading with an explicit schema keeps the
scan prunable (ReadSchema contains only referenced columns once Catalyst
prunes) and removes the footer-sampling inference step — which matters
when "the table" is 100k files on object storage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.schemas import EVENTS, EVENTS_RAW, FIXTURE_SCHEMAS

TABLES = tuple(FIXTURE_SCHEMAS)

# Cache of {events parquet path -> True if ts is stored as nanoseconds}.
# One footer read per path per process; negligible driver cost.
_NANOS_TS_CACHE: dict[str, bool] = {}


def events_ts_is_nanos(sf_dir: str) -> bool:
    """Sniff the physical timestamp unit of ``events.ts`` from the parquet
    footer. The fixture has shipped both TIMESTAMP(NANOS) (which Spark's
    vectorized reader cannot read as a timestamp — it needs the raw-int64
    + div-1000 path) and plain ``timestamp[us]`` (native read). Trusting
    one hardcoded assumption corrupts every event timestamp when the
    fixture flips, so branch on the footer instead."""
    path = f"{sf_dir}/events.parquet"
    cached = _NANOS_TS_CACHE.get(path)
    if cached is not None:
        return cached
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    probe = path
    if os.path.isdir(path):  # directory-of-part-files layout
        parts = sorted(
            f for f in os.listdir(path) if f.endswith(".parquet") and not f.startswith(".")
        )
        if parts:
            probe = os.path.join(path, parts[0])
    t = pq.read_schema(probe).field("ts").type
    # Arrow reports BOTH real TIMESTAMP(NANOS) and legacy INT96 as
    # timestamp[ns]; only the INT64-backed nanos column needs the
    # raw-long div-1000 path (Spark's vectorized reader handles INT96
    # natively). Disambiguate on the parquet PHYSICAL type.
    phys = None
    try:
        meta = pq.ParquetFile(probe).metadata.schema
        for i in range(meta.num_columns):
            col = meta.column(i)
            if col.name == "ts" or col.path_in_schema == "ts":
                phys = col.physical_type
                break
    except Exception:
        phys = None
    is_nanos = (
        pa.types.is_timestamp(t) and t.unit == "ns" and phys != "INT96"
    ) or pa.types.is_int64(t)
    _NANOS_TS_CACHE[path] = is_nanos
    return is_nanos


# Cache of {table path -> physical schema matches declaration}. One
# pyarrow footer read per path per process (~1 ms, driver-local) —
# letting Spark infer instead would submit a schema-inference JOB per
# load_table call, which measurably dominates short queries.
_SCHEMA_MATCH_CACHE: dict[str, bool] = {}


def _arrow_matches(arrow_type, spark_type) -> bool:
    """Does the parquet physical type already decode to the declared
    Spark type? (Only the types the fixture schemas use.)"""
    import pyarrow as pa
    from pyspark.sql import types as T

    if isinstance(spark_type, T.LongType):
        return pa.types.is_int64(arrow_type)
    if isinstance(spark_type, T.IntegerType):
        return pa.types.is_int32(arrow_type)
    if isinstance(spark_type, T.DoubleType):
        return pa.types.is_float64(arrow_type)
    if isinstance(spark_type, T.StringType):
        return pa.types.is_string(arrow_type) or pa.types.is_large_string(arrow_type)
    if isinstance(spark_type, T.TimestampType):
        return pa.types.is_timestamp(arrow_type) and arrow_type.unit == "us"
    if isinstance(spark_type, T.FloatType):
        return pa.types.is_float32(arrow_type)
    if isinstance(spark_type, T.ArrayType):
        return (
            pa.types.is_list(arrow_type) or pa.types.is_large_list(arrow_type)
        ) and _arrow_matches(arrow_type.value_type, spark_type.elementType)
    return False


def _physical_matches(sf_dir: str, name: str) -> bool:
    path = f"{sf_dir}/{name}.parquet"
    cached = _SCHEMA_MATCH_CACHE.get(path)
    if cached is not None:
        return cached
    import os

    import pyarrow.parquet as pq

    probe = path
    if os.path.isdir(path):
        parts = sorted(
            f for f in os.listdir(path) if f.endswith(".parquet") and not f.startswith(".")
        )
        if parts:
            probe = os.path.join(path, parts[0])
    try:
        footer = pq.read_schema(probe)
        ok = all(
            f.name in footer.names
            and _arrow_matches(footer.field(f.name).type, f.dataType)
            for f in FIXTURE_SCHEMAS[name]
        )
    except Exception:
        ok = False  # unreadable footer: fall to the tolerant cast path
    _SCHEMA_MATCH_CACHE[path] = ok
    return ok


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table from ``{sf_dir}/{name}.parquet``,
    normalized to the declared schema.

    Steady state (footer types == declaration, checked ONCE per path
    via a cached pyarrow footer read): a strict ``spark.read.schema``
    — no inference job, plans identical to always. Drift state (the
    round-2 failure mode: ``events.ts`` flipped TIMESTAMP(NANOS) →
    ``timestamp[us]`` under a regeneration): a native read followed by
    a cast of every declared column, which converts instead of
    corrupting or refusing the scan. Missing declared columns still
    fail loudly in both paths."""
    if name not in FIXTURE_SCHEMAS:
        raise KeyError(f"unknown table {name!r}; known: {sorted(FIXTURE_SCHEMAS)}")
    if name == "events" and events_ts_is_nanos(sf_dir):
        # ts is TIMESTAMP(NANOS) on disk: read int64 nanos, truncate to
        # µs — byte-identical to DuckDB's nanosecond-parquet handling.
        raw = spark.read.schema(EVENTS_RAW).parquet(f"{sf_dir}/events.parquet")
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if _physical_matches(sf_dir, name):
        return spark.read.schema(FIXTURE_SCHEMAS[name]).parquet(f"{sf_dir}/{name}.parquet")
    raw = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    return raw.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in FIXTURE_SCHEMAS[name]]
    )


def ensure_min_partitions(df: DataFrame, target: int | None = None) -> DataFrame:
    """Round-robin repartition iff ``df`` has fewer partitions than
    ``target`` (default ``defaultParallelism``) — call it AFTER column
    pruning, right before CPU-heavy per-row work (shingling, hashing,
    vector folds), so the shuffle moves only the columns the operator
    needs.

    Why it exists: a small parquet table is a single row group, which
    Spark cannot split — the scan yields ONE task and every downstream
    expression runs on one core no matter how many are idle. On a real
    cluster the same table arrives as thousands of splits and this is a
    no-op (the partition check keeps the extra exchange out of the
    100 TB path); the repartition only fires when the input is too
    coarse for the machine, where one tiny shuffle buys full-width
    parallelism for the expensive map stage.
    """
    sc = df.sparkSession.sparkContext
    n = target or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n)


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Load several tables at once; all tables when none named."""
    use = names or TABLES
    return {n: load_table(spark, sf_dir, n) for n in use}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register each table as a temp view so the SQL surface works
    (``spark.sql("SELECT ... FROM lineitem")``) — the Spark rendering of
    the reference's always-present base tables."""
    for name, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(name)


def write_table(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: tuple[str, ...] = (),
    bucket_by: tuple[int, tuple[str, ...]] | None = None,
    table_name: str | None = None,
) -> None:
    """Table sink (SURVEY.md §2.1 S5 — the reference's batched
    ``execute_values`` INSERT, ``02_etl.py:44-45`` etc., becomes a
    columnar write).

    Scale knobs surfaced explicitly because they ARE the 100 TB story:

    * ``partition_by`` — hive-style directory partitioning; downstream
      filters on these columns become partition pruning (no file even
      opened). Use low-cardinality keys (date, region).
    * ``bucket_by`` — ``(n_buckets, cols)``: pre-shuffles rows into a
      fixed hash layout so later joins/aggs on those columns skip their
      exchange entirely. Requires a saveAsTable (bucket metadata lives
      in the catalog), hence ``table_name``.

    Upsert semantics are deliberately NOT here — compose
    ``operators.merge`` first, then write the merged state (on
    Delta/Iceberg backends the same merge call sites become MERGE INTO).
    """
    if bucket_by is not None:
        n, cols = bucket_by
        if not table_name:
            raise ValueError("bucket_by requires table_name (catalog metadata)")
        (
            df.write.mode(mode)
            .option("path", path)
            .bucketBy(n, *cols)
            .sortBy(*cols)
            .format("parquet")
            .saveAsTable(table_name)
        )
        return
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
