"""Point-in-time top-k join (`joins.point_in_time_topk`): semantics on a
hand-built timeline, differential vs the naive band-join render, and the
single-exchange plan shape."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Window
from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.operators import joins

T0 = dt.datetime(2024, 1, 10, 12, 0, 0)


def _ts(sec):
    return T0 + dt.timedelta(seconds=sec)


def _frames(spark):
    left = spark.createDataFrame(
        [(100, 1, _ts(100)), (101, 1, _ts(50)), (102, 2, _ts(100))],
        "event_id LONG, user_id LONG, ts TIMESTAMP",
    )
    right = spark.createDataFrame(
        [
            (1, 1, "a", _ts(10)),
            (2, 1, "b", _ts(60)),
            (3, 1, "c", _ts(100)),  # equal-ts with left 100 → must match
            (4, 1, "d", _ts(101)),  # future → never matches
            (5, 2, "e", _ts(99)),
            (6, 3, "f", _ts(100)),  # other key
        ],
        "event_id LONG, user_id LONG, event_type STRING, ts TIMESTAMP",
    )
    return left, right


def test_semantics_order_horizon_and_ties(spark):
    left, right = _frames(spark)
    out = joins.point_in_time_topk(
        left, right, on=["user_id"], left_ts="ts", right_ts="ts",
        right_seq="event_id", k=2, horizon_micros=60 * 1_000_000,
    ).collect()
    got = {}
    for r in out:
        got.setdefault(r["event_id"], []).append((r["pit_rank"], r["event_id_r"]))
    for v in got.values():
        v.sort()
    # purchase 100 (t=100): candidates in [40,100] → ids 2 (t=60), 3 (t=100 equal-ts). latest first.
    assert got[100] == [(1, 3), (2, 2)]
    # purchase 101 (t=50): only id 1 (t=10) in [-10,50]
    assert got[101] == [(1, 1)]
    # purchase 102 (user 2): id 5 only; user-3 event never leaks
    assert got[102] == [(1, 5)]


def test_equal_timestamp_ties_break_by_seq_desc(spark):
    left = spark.createDataFrame([(9, 1, _ts(100))], "event_id LONG, user_id LONG, ts TIMESTAMP")
    right = spark.createDataFrame(
        [(i, 1, "x", _ts(100)) for i in range(1, 6)],
        "event_id LONG, user_id LONG, event_type STRING, ts TIMESTAMP",
    )
    out = joins.point_in_time_topk(
        left, right, on=["user_id"], left_ts="ts", right_ts="ts", right_seq="event_id", k=3
    ).collect()
    ranked = sorted((r["pit_rank"], r["event_id_r"]) for r in out)
    assert ranked == [(1, 5), (2, 4), (3, 3)]


def test_differential_vs_band_join(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn("ts", F.col("ts").cast("timestamp"))
    left = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    right = ev.filter(F.col("event_type") != "purchase").select(
        "event_id", "user_id", "event_type", "ts"
    )
    out = joins.point_in_time_topk(
        left, right, on=["user_id"], left_ts="ts", right_ts="ts", right_seq="event_id", k=3
    )
    h = 7 * 24 * 3600 * 1_000_000
    naive = (
        left.alias("l")
        .join(right.alias("r"), F.col("r.user_id") == F.col("l.user_id"))
        .filter(
            (F.unix_micros("r.ts") <= F.unix_micros("l.ts"))
            & (F.unix_micros("r.ts") >= F.unix_micros("l.ts") - h)
        )
        .select(
            F.col("l.event_id"), F.col("l.user_id"), F.col("l.ts"),
            F.col("r.ts").alias("ts_r"), F.col("r.event_id").alias("event_id_r"),
            F.col("r.event_type").alias("event_type_r"),
            F.row_number()
            .over(
                Window.partitionBy("l.event_id").orderBy(
                    F.desc(F.unix_micros("r.ts")), F.desc("r.event_id")
                )
            )
            .alias("pit_rank"),
        )
        .filter(F.col("pit_rank") <= 3)
        .select("event_id", "user_id", "ts", "pit_rank", "ts_r", "event_id_r", "event_type_r")
    )
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, naive.collect()))
    assert a == b and len(a) > 0


def test_single_key_exchange_plan(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn("ts", F.col("ts").cast("timestamp"))
    left = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    right = ev.filter(F.col("event_type") != "purchase").select(
        "event_id", "user_id", "event_type", "ts"
    )
    out = joins.point_in_time_topk(
        left, right, on=["user_id"], left_ts="ts", right_ts="ts", right_seq="event_id", k=3
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the whole operator is ONE hash exchange (the key window); no join
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan
