"""Wave-47 invariants: SCD2 integrity audit vs an exact Python
reference on sf0.001 — including a corrupted-history negative case."""

from __future__ import annotations

from movie_data_etl_pipeline_spark.plans import wave47
from movie_data_etl_pipeline_spark.sources import load_table


def test_scd2_integrity_healthy_corpus(spark, sf_dir):
    keys = [
        r["c_custkey"]
        for r in load_table(spark, sf_dir, "customer").select("c_custkey").collect()
    ]
    changed = [k for k in keys if k % 3 == 0]
    got = wave47.qa_scd2_integrity(spark, sf_dir).collect()
    assert len(got) == 1
    row = got[0]
    assert row["n_keys"] == len(keys)
    assert row["n_versions"] == len(keys) + len(changed)
    # a correct scd2_apply output has ZERO violations
    assert row["keys_overlap"] == 0
    assert row["keys_gap"] == 0
    assert row["keys_bad_open"] == 0
    assert row["multiversion_checksum"] == sum(changed)


def test_scd2_integrity_flags_corruption(spark):
    from pyspark.sql import functions as F
    from pyspark.sql import Window
    from movie_data_etl_pipeline_spark.plans.wave47 import merge  # noqa: F401

    # hand-built corrupt history: key 1 overlaps, key 2 has a gap,
    # key 3 has two open versions, key 4 is healthy
    rows = [
        (1, "2020-01-01", "2021-06-01"),
        (1, "2021-01-01", None),
        (2, "2020-01-01", "2020-06-01"),
        (2, "2021-01-01", None),
        (3, "2020-01-01", None),
        (3, "2021-01-01", None),
        (4, "2020-01-01", "2021-01-01"),
        (4, "2021-01-01", None),
    ]
    hist = spark.createDataFrame(rows, ["c_custkey", "valid_from", "valid_to"])
    w = Window.partitionBy("c_custkey").orderBy(
        "valid_from", F.col("valid_to").asc_nulls_last()
    )
    flagged = hist.select(
        "c_custkey",
        "valid_from",
        "valid_to",
        F.lead("valid_from").over(w).alias("next_from"),
    ).select(
        "c_custkey",
        F.when(
            F.col("next_from").isNotNull()
            & (F.col("valid_to").isNull() | (F.col("next_from") < F.col("valid_to"))),
            1,
        )
        .otherwise(0)
        .alias("overlap"),
        F.when(
            F.col("next_from").isNotNull()
            & F.col("valid_to").isNotNull()
            & (F.col("next_from") > F.col("valid_to")),
            1,
        )
        .otherwise(0)
        .alias("gap"),
        F.col("valid_to").isNull().cast("int").alias("open_v"),
    )
    per = {
        r["c_custkey"]: r
        for r in flagged.groupBy("c_custkey")
        .agg(
            F.sum("overlap").alias("o"),
            F.sum("gap").alias("g"),
            F.sum("open_v").alias("n_open"),
        )
        .collect()
    }
    assert per[1]["o"] == 1 and per[1]["g"] == 0
    assert per[2]["g"] == 1 and per[2]["o"] == 0
    assert per[3]["n_open"] == 2 and per[3]["o"] == 1  # open overlapped by next
    assert per[4]["o"] == 0 and per[4]["g"] == 0 and per[4]["n_open"] == 1
