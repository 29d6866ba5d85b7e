"""JSONL-directory sink DataSource (`sources/pyds.py` write path):
round-trip fidelity, manifest, overwrite, and no-partial-on-failure."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.sources.pyds import register_python_sources


def _ls_parts(path):
    return sorted(f for f in os.listdir(path) if f.startswith("part-") and f.endswith(".jsonl"))


def test_roundtrip_and_manifest(spark, sf_dir, tmp_path):
    register_python_sources(spark)
    out = str(tmp_path / "sink")
    os.makedirs(out)
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    nation.repartition(4).write.format("jsonl_dir").option("path", out).mode("append").save()
    parts = _ls_parts(out)
    assert len(parts) == 4
    manifest = json.load(open(os.path.join(out, "_SUCCESS")))
    assert sorted(manifest["files"]) == parts
    assert manifest["total_rows"] == nation.count()
    back = spark.read.schema("n_nationkey LONG, n_name STRING, n_regionkey LONG").json(
        os.path.join(out, "part-*.jsonl")
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nation.collect()))


def test_overwrite_replaces_previous_files(spark, sf_dir, tmp_path):
    register_python_sources(spark)
    out = str(tmp_path / "sink2")
    os.makedirs(out)
    df = spark.range(100).select(F.col("id"))
    df.repartition(8).write.format("jsonl_dir").option("path", out).mode("append").save()
    assert len(_ls_parts(out)) == 8
    df.repartition(2).write.format("jsonl_dir").option("path", out).mode("overwrite").save()
    parts = _ls_parts(out)
    assert len(parts) == 2
    manifest = json.load(open(os.path.join(out, "_SUCCESS")))
    assert manifest["total_rows"] == 100 and sorted(manifest["files"]) == parts


def test_failed_write_leaves_no_parts_and_no_success(spark, tmp_path):
    register_python_sources(spark)
    out = str(tmp_path / "sink3")
    os.makedirs(out)
    df = spark.range(50)
    with pytest.raises(Exception):
        (
            df.repartition(4)
            .write.format("jsonl_dir")
            .option("path", out)
            .option("fail_partition", "2")
            .mode("append")
            .save()
        )
    assert _ls_parts(out) == []
    assert not os.path.exists(os.path.join(out, "_SUCCESS"))
