"""SparkSession factory tuned for both local testing and cluster scale.

Local mode is a single JVM (``local[N]``); the configs below are chosen so
the *same* logical plans scale to a multi-executor cluster: AQE enabled
(runtime partition coalescing, skew-join splitting) with its
flip-to-broadcast conversion OFF (it sizes on compressed shuffle bytes,
which lies about narrow int64 fact relations — the round-7 OOM class;
static broadcast planning on parquet file sizes stays on), UTC session
timezone (parity with the DuckDB oracle, which is UTC-naive), Arrow
transfer for the pandas-UDF slow path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "movie_data_etl_pipeline_spark",
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or return) the SparkSession.

    ``shuffle_partitions`` defaults to the local core count — at cluster
    scale you would instead size it to ~2-3× total executor cores, or
    simply rely on AQE's coalescing (enabled here) to right-size every
    exchange at runtime.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    if shuffle_partitions is None:
        # Scale-dependent knob, env-parameterised (r10): the local
        # default stays = cores (an interleaved 32-vs-96 A/B over the
        # frozen CORE_R2 workload measured 3×cores 11% SLOWER at sf0.1
        # — tools/ab_r10_shuffle.json — so raising the default would
        # trade real bench seconds for nothing at this volume). At
        # AMPLIFIED volume the per-task aggregate/sort state grows
        # linearly with data under a fixed partition count and the
        # graph-family shared build dies with AGGREGATE_OUT_OF_MEMORY
        # at 100× under 32 partitions while running clean at 96–128
        # (OPTIMIZATION_r10.md) — so amplified-scale tooling sets
        # SPARK_GRAFT_SHUFFLE_PARTITIONS≈3×cores, and a production
        # cluster sizes this to ~2-3× total executor cores (or sizes
        # partitions to 100 MB–1 GB of shuffle bytes) and lets AQE
        # coalescing right-size small exchanges down.
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
        )
    # default is local mode sized to the machine; on a cluster set
    # SPARK_GRAFT_MASTER (yarn / k8s://... / spark://...) — or submit
    # via spark-submit --master, which wins over any builder setting —
    # and size shuffle_partitions to ~2-3x total executor cores (or
    # let AQE coalescing right-size each exchange at runtime)
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # close the AQE flip-to-broadcast fault class engine-wide
        # (round-7 root cause, VERDICT-r7 ask #3): the runtime flip
        # sizes its broadcast decision on COMPRESSED shuffle bytes, and
        # a narrow all-int64 fact relation dictionary/RLE-compresses
        # 20-100x — so a build side that "fits" the threshold can be
        # gigabytes deserialized (the gr_bipartite_project 30x OOM).
        # Static planning is unaffected: it sizes on parquet file
        # bytes (trustworthy), so every dimension broadcast keeps its
        # plan; only the untrustworthy runtime SMJ/SHJ->BHJ conversion
        # is off. Per-site shuffle_hash pins on known fact⋈fact joins
        # remain as belt-and-braces (and are faster at 1x anyway).
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
        # allow Python DataSource readers (sources/pyds.py) to absorb
        # pushed filters for partition pruning
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # the events fixture stores ts as TIMESTAMP(NANOS), which Spark's
        # vectorized reader rejects; read as raw int64 nanos and convert
        # in sources.parquet (ns→µs truncation, matching DuckDB)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # write timestamps as TIMESTAMP(MICROS), not legacy INT96:
        # µs round-trips through every reader (DuckDB, pyarrow, our
        # own footer-sniffing loader); INT96 is deprecated and
        # surfaces as timestamp[ns] in arrow, confusing unit sniffs
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
