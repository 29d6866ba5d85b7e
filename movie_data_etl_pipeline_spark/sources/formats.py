"""Generic format connectors: CSV / JSON-lines / ORC / Parquet, read and
write, schema-explicit.

The reference's only inputs are REST JSON and its only sink is
PostgreSQL (``/root/reference/02_etl.py``); an engine replacing it needs
the interchange formats its users actually land data in. Everything
here is a thin, *disciplined* wrapper over ``spark.read``/``df.write``:

* **schema is mandatory on read** — inference is a full extra pass over
  the data (CSV/JSON) and produces drifting types between runs; at
  100 TB it is also how you end up with a string column of dates.
* CSV/JSON readers run in PERMISSIVE mode with an explicit
  ``_corrupt_record`` column when ``keep_corrupt`` is set, so bad rows
  are quarantinable instead of job-fatal (the load-side contract of the
  reference's idempotent pipeline, ``README.md:81``).
* columnar formats (parquet/orc) keep predicate pushdown + pruning;
  row formats (csv/json) at least prune columns at the parser.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructType

_READ_FORMATS = ("parquet", "orc", "json", "csv")


def read_format(
    spark: SparkSession,
    path: str,
    fmt: str,
    schema: StructType,
    keep_corrupt: bool = False,
    **options: str,
) -> DataFrame:
    """Schema-explicit read of ``path`` as ``fmt``.

    CSV defaults: header on. JSON is JSON-lines (one object per line —
    the only JSON layout that splits across workers; a single giant
    array/document cannot be parallelized).
    """
    if fmt not in _READ_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {_READ_FORMATS}")
    reader = spark.read
    if fmt == "csv":
        options.setdefault("header", "true")
    if fmt in ("csv", "json"):
        options.setdefault("mode", "PERMISSIVE")
        if keep_corrupt:
            if "_corrupt_record" not in schema.fieldNames():
                schema = schema.add("_corrupt_record", StringType())
            options.setdefault("columnNameOfCorruptRecord", "_corrupt_record")
    return reader.format(fmt).options(**options).schema(schema).load(path)


def read_text(spark: SparkSession, path: str, whole: bool = False) -> DataFrame:
    """Raw text source: one row per line (``value: string``), or one row
    per file when ``whole`` — the landing reader for unstructured
    corpora before tokenization/dedup (the ``documents``-table shape).
    Line mode splits across workers on block boundaries; whole-file mode
    cannot split, so it is only for many-small-files layouts."""
    return spark.read.text(path, wholetext=whole)


def read_binary_files(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """Binary-file source for multimodal assets (image/audio/video):
    one row per file with ``(path, modificationTime, length, content:
    binary)`` — the ingest edge feeding ``operators/multimodal``'s
    decode/feature UDFs. Non-splittable by nature (a file is one blob);
    parallelism comes from file count, so at scale assets should be
    landed many-files-per-partition, never one giant archive. The glob
    filter prunes at listing time — no bytes read for skipped files."""
    return (
        spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)
    )


def write_format(
    df: DataFrame,
    path: str,
    fmt: str,
    mode: str = "overwrite",
    partition_by: tuple[str, ...] = (),
    **options: str,
) -> None:
    """Write ``df`` to ``path`` as ``fmt`` (same partitioning discipline
    as ``parquet.write_table``; csv gets a header by default)."""
    if fmt not in _READ_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {_READ_FORMATS}")
    if fmt == "csv":
        options.setdefault("header", "true")
    writer = df.write.mode(mode).options(**options)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.format(fmt).save(path)
