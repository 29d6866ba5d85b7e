"""Unit tests for the declarative data-quality audit operator
(operators/quality.audit) on hand-crafted rows where every rule class
has a known violation count."""

from __future__ import annotations

from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.operators import quality
from movie_data_etl_pipeline_spark.operators.quality import audit


def test_audit_all_rule_classes(spark):
    child = spark.createDataFrame(
        [
            (1, 10, 5.0, "ok"),
            (2, 10, 50.0, "ok"),   # dup key 10 (1 extra row)
            (3, None, 7.0, "bad"), # null fk/key col
            (4, 99, -1.0, None),   # fk orphan + range violation + null check col
        ],
        "id long, fk int, v double, s string",
    )
    parent = spark.createDataFrame([(10,), (11,)], "pk int")
    out = {
        r.check: r.n_violations
        for r in audit(
            child,
            not_null=["fk"],
            unique=[["fk"]],
            ranges={"v": (0.0, 100.0)},
            checks={"s_ok": F.col("s") == "ok"},
            foreign_keys=[("fk", parent, "pk")],
        ).collect()
    }
    assert out == {
        "not_null:fk": 1,
        "unique:fk": 1,      # 4 rows - 2 distinct non-null - 1 all-null row
        "range:v": 1,
        "check:s_ok": 2,     # 'bad' and NULL both fail
        "fk:fk": 1,          # fk=99 has no parent
    }


def test_audit_multi_key_unique_partial_nulls(spark):
    """Multi-column unique: rows where ANY key column is NULL are
    excluded from the check (count(distinct k1,k2) skips them), so they
    must not be reported as duplicates. Regression for the r2 ADVICE #1
    undercount correction that only handled all-NULL keys."""
    df = spark.createDataFrame(
        [
            (1, "a", 10),
            (1, "a", 20),     # true duplicate of (1,'a') -> 1 extra row
            (1, None, 30),    # partial-null key: excluded, NOT a dup
            (None, "a", 40),  # partial-null key: excluded, NOT a dup
            (None, None, 50), # all-null key: excluded
            (2, "b", 60),
        ],
        "k1 int, k2 string, v int",
    )
    out = {
        r.check: r.n_violations
        for r in audit(df, unique=[["k1", "k2"]]).collect()
    }
    assert out == {"unique:k1,k2": 1}


def test_audit_clean_table_is_all_zero(spark, sf_dir):
    from movie_data_etl_pipeline_spark.sources import load_table

    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    out = {
        r.check: r.n_violations
        for r in audit(
            nation,
            not_null=["n_nationkey", "n_name"],
            unique=[["n_nationkey"]],
            foreign_keys=[("n_regionkey", region, "r_regionkey")],
        ).collect()
    }
    assert set(out.values()) == {0}


def test_volume_anomaly_exact_zscores(spark):
    """z must equal the closed-form sample z-score, and the flags must
    follow |z| > threshold — including catching the planted spike."""
    import datetime
    import statistics

    from movie_data_etl_pipeline_spark.operators import quality

    counts = {d: 100 + (d % 3) for d in range(1, 11)}  # tight normal band
    counts[11] = 220  # planted spike
    rows = []
    eid = 0
    for day, c in counts.items():
        for _ in range(c):
            rows.append((eid, datetime.datetime(2024, 1, day, 12, 0, 0)))
            eid += 1
    df = spark.createDataFrame(rows, ["event_id", "ts"])
    out = {r["day"]: r for r in quality.volume_anomaly(df, ts_col="ts").collect()}

    mean = statistics.mean(counts.values())
    std = statistics.stdev(counts.values())
    for day, c in counts.items():
        key = f"2024-01-{day:02d}"
        assert out[key]["n_events"] == c
        assert abs(out[key]["z"] - (c - mean) / std) < 1e-6
        assert out[key]["is_anomaly"] == (abs((c - mean) / std) > 2.0)
    assert out["2024-01-11"]["is_anomaly"] is True
    assert sum(1 for r in out.values() if r["is_anomaly"]) == 1


def test_dlq_split_routes_corrupt_and_keeps_drift(spark):
    from movie_data_etl_pipeline_spark.operators.quality import dlq_split

    df = spark.createDataFrame(
        [
            (1, '{"k": 69}'),      # well-formed, field present
            (2, '{"k": 6'),        # truncated -> quarantine
            (3, '{"x": 1}'),       # well-formed, field missing -> ok w/ NULL
            (4, "not json"),       # garbage -> quarantine
            (5, None),             # null payload -> quarantine
        ],
        "id long, props string",
    )
    ok, bad = dlq_split(df, "props", "k INT")
    ok_rows = {r["id"]: r["parsed"]["k"] for r in ok.collect()}
    assert ok_rows == {1: 69, 3: None}
    bad_rows = sorted((r["id"], r["props"]) for r in bad.collect())
    # quarantine preserves the original payload bytes for replay
    assert bad_rows == [(2, '{"k": 6'), (4, "not json"), (5, None)]


def test_dlq_split_ok_side_has_no_corrupt_column(spark):
    from movie_data_etl_pipeline_spark.operators.quality import dlq_split

    df = spark.createDataFrame([(1, '{"k": 1}')], "id long, props string")
    ok, _ = dlq_split(df, "props", "k INT")
    assert [f.name for f in ok.schema["parsed"].dataType.fields] == ["k"]


def test_mad_outlier_report_hand_case(spark):
    # group g: values 1..9 plus a 1000 outlier → med of 10 vals, exact halves
    rows = [("g", v) for v in range(1, 10)] + [("g", 1000)]
    df = spark.createDataFrame(rows, "k STRING, x LONG")
    out = quality.mad_outlier_report(df, ["k"], "x", k=5).collect()[0]
    # sorted: 1..9,1000 → median = (5+6)/2 = 5.5 ; devs sorted:
    # 0.5,0.5,1.5,1.5,2.5,2.5,3.5,3.5,4.5,994.5 → mad = 2.5
    assert out["n_rows"] == 10
    assert out["median_val"] == 5.5
    assert out["mad_val"] == 2.5
    # |x-5.5| > 12.5 → only the 1000
    assert out["n_outliers"] == 1


def test_mad_report_breakdown_resistance(spark):
    # mean/std would flag nothing useful with 40% junk; MAD still isolates it
    rows = [("g", v) for v in range(100, 160)] + [("g", 10_000 + v) for v in range(40)]
    df = spark.createDataFrame(rows, "k STRING, x LONG")
    out = quality.mad_outlier_report(df, ["k"], "x", k=5).collect()[0]
    assert out["n_outliers"] == 40


def test_k_anonymity_hand_case(spark):
    rows = [("A", "x")] * 6 + [("B", "x")] * 2 + [("C", "y")] * 1 + [(None, "x")] * 3
    df = spark.createDataFrame(rows, "q1 STRING, q2 STRING")
    out = quality.k_anonymity_report(df, ["q1", "q2"], k=5).collect()[0]
    # groups: (A,x)=6 ok, (B,x)=2 viol, (C,y)=1 viol, (NULL,x)=3 viol
    assert out["n_groups"] == 4
    assert out["min_group_size"] == 1
    assert out["violating_groups"] == 3
    assert out["rows_at_risk"] == 6
