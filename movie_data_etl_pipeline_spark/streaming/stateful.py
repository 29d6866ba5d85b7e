"""Custom stateful streaming operator via ``applyInPandasWithState``
(north-star extension, SURVEY.md §2.9 — the reference has no streaming;
this is the escape hatch for stateful semantics that Spark's built-in
windowed aggregations cannot express).

The demonstration operator keeps **per-user running totals** across
micro-batches — cumulative event count, value sum, and last-seen event
time — the state shape of a feature-store "user profile" updated by an
event stream. State is a per-key tuple held by the streaming state
store (checkpointed, recoverable); each micro-batch's Arrow-transferred
pandas frames fold into it.

Scale posture: state is O(distinct keys), partitioned by the groupBy
hash — adding executors shards the state store linearly. The per-batch
work is vectorized pandas (sum/max over Arrow batches), not per-row
Python.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:
    from pyspark.sql.streaming.state import GroupState

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double, last_ts timestamp"
STATE_SCHEMA = "n long, total double, last_us long"


def _update_user_totals(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: "GroupState",
) -> Iterator[pd.DataFrame]:
    n, total, last_us = state.get if state.exists else (0, 0.0, 0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            batch_max = int(pdf["ts"].astype("int64").max())  # ns since epoch
            last_us = max(last_us, batch_max // 1000)
    state.update((n, total, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "last_ts": [pd.Timestamp(last_us * 1000)],
        }
    )


def streaming_running_user_totals(stream: DataFrame) -> DataFrame:
    """Per-user cumulative (n_events, total_value, last_ts), re-emitted
    every micro-batch a user appears in. Update output mode: the memory
    or table sink keeps the latest row per user."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return stream.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def batch_running_user_totals(events: DataFrame) -> DataFrame:
    """Batch twin of ``streaming_running_user_totals`` (replay
    equivalence: folding the whole bounded stream must equal one batch
    aggregation)."""
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("total_value"),
        F.max("ts").alias("last_ts"),
    )


def stream_upsert_to_parquet(
    stream: DataFrame,
    target_path: str,
    checkpoint_path: str,
    key_cols: list[str],
) -> "object":
    """Streaming upsert sink: every micro-batch merges into a parquet
    target with the engine's batch ``merge.upsert`` (anti-join/coalesce
    read-modify-write), via ``foreachBatch``.

    This is how the reference's ON CONFLICT load loop
    (``/root/reference/02_etl.py:84-101``) looks when the source is a
    stream instead of paginated REST calls: exactly-once *effect* comes
    from upsert idempotency (a replayed batch is a fixed point) plus the
    checkpointed source offsets. On a table format (Delta/Iceberg) the
    body becomes MERGE INTO; the operator shape is identical.

    Returns the started ``StreamingQuery`` (caller awaits/stops).
    """
    from movie_data_etl_pipeline_spark.operators.merge import upsert

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # latest-per-key within the batch, then merge into target state
        deduped = batch_df.dropDuplicates(key_cols)
        try:
            target = spark.read.parquet(target_path)
            merged = upsert(target, deduped, key_cols=key_cols)
        except Exception:  # first batch: target doesn't exist yet
            merged = deduped
        # plain-parquet RMW needs a full-table localCheckpoint before the
        # overwrite (the plan reads the files it is about to replace);
        # a real deployment writes to a new snapshot dir or table format
        merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(target_path)

    return (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
        .start()
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4.x) — the successor API: typed state
# variables on a StatefulProcessor instead of one opaque tuple.
# ---------------------------------------------------------------------------


def streaming_user_totals_tws(stream: DataFrame) -> DataFrame:
    """Modern twin of ``streaming_running_user_totals`` on the
    ``transformWithStateInPandas`` API: per-user cumulative totals kept
    in a typed ValueState. Compared to ``applyInPandasWithState`` the
    processor owns named state variables (here one; a real profile
    would add ListState/MapState and TTL), and the same replay
    guarantee holds: state shards by the groupBy hash, Arrow batches
    fold vectorized.

    Runtime requirement: the TWS state-server protocol needs
    ``google.protobuf`` in the Python workers (its driver worker
    crashes without it); environments lacking protobuf should use
    ``streaming_running_user_totals`` (applyInPandasWithState), which
    has no such dependency — the test suite skips accordingly."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class UserTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals", "n long, total double, last_us long"
            )

        def handleInputRows(self, key, rows, timerValues):  # noqa: ANN001
            n, total, last_us = (
                self._state.get() if self._state.exists() else (0, 0.0, 0)
            )
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                if len(pdf):
                    batch_max = int(pdf["ts"].astype("int64").max())
                    last_us = max(last_us, batch_max // 1000)
            self._state.update((n, total, last_us))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [total],
                    "last_ts": [pd.Timestamp(last_us * 1000)],
                }
            )

        def close(self) -> None:
            pass

    return stream.groupBy("user_id").transformWithStateInPandas(
        UserTotals(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
