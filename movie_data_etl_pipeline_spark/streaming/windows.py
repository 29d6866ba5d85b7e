"""Event-time windowing over the ``events`` stream (north-star
extension, SURVEY.md §2.9): tumbling / sliding / session windows, in both
batch form (oracle-checkable — ``F.window`` works identically on static
DataFrames) and Structured-Streaming form (``readStream`` + watermark,
late data dropped past the watermark horizon).

The batch functions return the window start/end as formatted strings —
timestamp rendering is pinned to ``yyyy-MM-dd HH:mm:ss`` so the DuckDB
oracle (UTC-naive timestamps) compares byte-identically.

Scale posture: windowed aggregation shuffles on (window, group-key) with
map-side partial aggregation; state in the streaming case is bounded by
the watermark (eviction after ``delay`` past max event time), which is
the only thing that makes 100 TB/day streams possible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.functions.scalar import avg_money, cents, money_from_cents
from movie_data_etl_pipeline_spark.schemas import EVENTS_RAW

_FMT = "yyyy-MM-dd HH:mm:ss"


def _fmt(col) -> F.Column:
    return F.date_format(col, _FMT)


def tumbling_counts(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Per (tumbling window, event_type): count + value sum/avg.
    ``value`` is money-like → aggregated in exact integer cents
    (functions.scalar) so results are deterministic at any parallelism."""
    return (
        events.withColumn("__vc", cents("value"))
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money_from_cents(F.sum("__vc")).alias("total_value"),
            avg_money(F.sum("__vc"), F.count(F.lit(1))).alias("avg_value"),
        )
        .select(
            _fmt("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
            "avg_value",
        )
        .orderBy("window_start", "event_type")
    )


def sliding_counts(events: DataFrame, width: str = "1 hour", slide: str = "30 minutes") -> DataFrame:
    """Per (sliding window, event_type) count: each event lands in
    width/slide overlapping windows (Spark expands via its internal
    window generator — no self-union needed)."""
    return (
        events.groupBy(F.window("ts", width, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            _fmt("w.start").alias("window_start"),
            _fmt("w.end").alias("window_end"),
            "event_type",
            "n_events",
        )
        .orderBy("window_start", "event_type")
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization per user: a new session starts when the
    gap since the previous event exceeds ``gap_minutes``.

    Implemented with lag + cumulative-sum windows (the classic batch
    sessionization), which is deterministic and oracle-expressible —
    unlike ``session_window``'s struct output this also ports 1:1 to the
    DuckDB oracle. Streaming uses native ``session_window`` below; the
    two agree on session boundaries for gap semantics.
    """
    by_user = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    gap_s = gap_minutes * 60
    with_flag = events.withColumn(
        "__new_session",
        F.when(
            F.lag("ts").over(by_user).isNull()
            | (
                F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(by_user))
                > gap_s
            ),
            1,
        ).otherwise(0),
    )
    with_sid = with_flag.withColumn(
        "session_seq",
        F.sum("__new_session").over(
            by_user.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        with_sid.withColumn("__vc", cents("value"))
        .groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _fmt(F.min("ts")).alias("session_start"),
            _fmt(F.max("ts")).alias("session_end"),
            money_from_cents(F.sum("__vc")).alias("session_value"),
        )
        .orderBy("user_id", "session_seq")
    )


def interval_join(
    clicks: DataFrame, errors: DataFrame, interval_minutes: int = 10, how: str = "inner"
) -> DataFrame:
    """Batch form of the stream-stream interval join: each click paired
    with the same user's error events from the preceding
    ``interval_minutes``. An equi-join on the user key with the time
    band INSIDE the join condition — one shuffle on user_id, no
    range-join blowup; identical semantics to the streaming form below
    (which is what bounds its state with watermarks).

    ``how='left'`` keeps clicks with no error in the band (null
    error_id/error_ts) — the band must live in the ON clause, not a
    post-join filter, or the outer rows would be filtered away."""
    c = clicks.select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    e = errors.select(
        F.col("user_id").alias("__eu"),
        F.col("event_id").alias("error_id"),
        F.col("ts").alias("error_ts"),
    )
    band = (F.col("error_ts") <= F.col("click_ts")) & (
        F.col("error_ts") >= F.col("click_ts") - F.expr(f"INTERVAL {interval_minutes} MINUTES")
    )
    return (
        c.join(e, (F.col("user_id") == F.col("__eu")) & band, how)
        .select(
            "user_id",
            "click_id",
            "error_id",
            _fmt("click_ts").alias("click_ts"),
            _fmt("error_ts").alias("error_ts"),
        )
        .orderBy("user_id", "click_id", "error_id")
    )


def streaming_interval_join(
    stream: DataFrame,
    interval_minutes: int = 10,
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join with watermarks on BOTH sides and a bounded
    time condition — the two things Structured Streaming requires to
    evict join state (an unbounded stream-stream join would buffer both
    sides forever). Clicks and errors are two filters of the same
    source stream; at 100 TB/day each would be its own topic.

    ``how='left_outer'`` additionally emits clicks that matched NO
    error — but only once the watermark passes the click's band (state
    eviction is what proves no match can still arrive), so outer rows
    trail the inner ones by up to the watermark delay. That timing is
    inherent to the model, not an implementation detail; size the
    watermark to the latency the consumer tolerates."""
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select("user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts"))
        .withWatermark("click_ts", watermark)
    )
    errors = (
        stream.filter(F.col("event_type") == "error")
        .select(
            F.col("user_id").alias("__eu"),
            F.col("event_id").alias("error_id"),
            F.col("ts").alias("error_ts"),
        )
        .withWatermark("error_ts", watermark)
    )
    band = (F.col("error_ts") <= F.col("click_ts")) & (
        F.col("error_ts") >= F.col("click_ts") - F.expr(f"INTERVAL {interval_minutes} MINUTES")
    )
    return (
        clicks.join(errors, (F.col("user_id") == F.col("__eu")) & band, how)
        .select(
            "user_id",
            "click_id",
            "error_id",
            _fmt("click_ts").alias("click_ts"),
            _fmt("error_ts").alias("error_ts"),
        )
    )


# ---------------------------------------------------------------------------
# Structured Streaming surface — same aggregations with watermarks.
# ---------------------------------------------------------------------------


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table as a bounded stream (parquet file source): the
    local stand-in for a Kafka topic. ``maxFilesPerTrigger`` would
    throttle a production backfill; the schema is declared (streaming
    sources require it — no inference pass). The physical timestamp unit
    is sniffed from the parquet footer (shared helper with the batch
    loader) so a fixture flip between TIMESTAMP(NANOS) and
    ``timestamp[us]`` cannot corrupt event time."""
    from movie_data_etl_pipeline_spark.schemas import EVENTS
    from movie_data_etl_pipeline_spark.sources.parquet import events_ts_is_nanos

    if events_ts_is_nanos(sf_dir):
        raw = (
            spark.readStream.schema(EVENTS_RAW)
            # the file-stream source requires a directory; glob-filter to
            # the events table only
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return (
        spark.readStream.schema(EVENTS)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )


def streaming_tumbling_counts(
    stream: DataFrame, width: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling aggregation: events later than ``watermark``
    behind max event time are dropped and their window state evicted —
    the bounded-state contract. Append output mode emits each window once
    it is final."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


def streaming_session_counts(
    stream: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Native streaming sessionization: ``session_window`` merges
    events within ``gap`` into one growing window; watermark closes
    sessions and evicts state."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def stream_static_enrich(stream: DataFrame, dim: DataFrame, on: str) -> DataFrame:
    """Stream-static enrichment join: each micro-batch joins against the
    static dimension — no watermark needed because the static side holds
    no state. Spark re-plans the static side per batch, so on a
    broadcast-sized dimension every micro-batch gets a broadcast hash
    join; this is THE pattern for decorating a 100 TB/day event firehose
    with dimension attributes (the streaming analogue of the reference's
    view joins, ``/root/reference/sql/03_views.sql:9-11``). Inner join:
    events without a dimension row drop, mirroring the views'
    join-membership filtering."""
    return stream.join(F.broadcast(dim), on, "inner")


def run_stream_to_memory(
    spark: SparkSession,
    streaming_df: DataFrame,
    name: str,
    output_mode: str = "append",
) -> DataFrame:
    """Drive a (bounded) streaming query to completion into an in-memory
    sink and return the result table — the local test/verify harness for
    the streaming surface."""
    q = (
        streaming_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}")
