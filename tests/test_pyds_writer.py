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


def test_stream_writer_epoch_commits_and_equivalence(spark, tmp_path):
    register_python_sources(spark)
    out = str(tmp_path / "stream_sink")
    os.makedirs(out)
    stream = (
        spark.readStream.format("synthetic_events")
        .option("max_batches", "3")
        .option("batch_size", "40")
        .load()
    )
    q = (
        stream.writeStream.format("jsonl_dir")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    epochs = sorted(f for f in os.listdir(out) if f.startswith("_EPOCH-"))
    assert len(epochs) >= 1
    total = sum(json.load(open(os.path.join(out, e)))["total_rows"] for e in epochs)
    assert total == 3 * 40
    # every manifest file exists; no orphan parts outside manifests
    manifested = {f for e in epochs for f in json.load(open(os.path.join(out, e)))["files"]}
    on_disk = set(_ls_parts(out))
    assert manifested == on_disk
    # batch read-back matches the deterministic source replayed as batch
    back = spark.read.schema(
        "event_id LONG, user_id LONG, event_type STRING, value DOUBLE, batch LONG"
    ).json(os.path.join(out, "part-*.jsonl"))
    assert back.count() == 120


def test_stream_writer_recommit_is_idempotent(spark, tmp_path):
    register_python_sources(spark)
    out = str(tmp_path / "stream_sink2")
    os.makedirs(out)
    from movie_data_etl_pipeline_spark.sources.pyds import _JsonlDirStreamWriter, _StagedFile

    w = _JsonlDirStreamWriter({"path": out})
    # simulate one committed epoch
    staging = os.path.join(out, "_staging")
    os.makedirs(staging, exist_ok=True)

    def stage(name, lines):
        p = os.path.join(staging, name)
        with open(p, "w") as f:
            f.writelines(l + "\n" for l in lines)
        return _StagedFile(staged=p, rows=len(lines))

    m1 = stage("task-0-0.jsonl", ['{"x": 1}', '{"x": 2}'])
    w.commit([m1], batchId=7)
    # replayed epoch 7 with different task layout must fully supersede
    m2a = stage("task-0-1.jsonl", ['{"x": 1}'])
    m2b = stage("task-1-1.jsonl", ['{"x": 2}'])
    w.commit([m2a, m2b], batchId=7)
    parts = [f for f in _ls_parts(out) if f.startswith("part-0000000007-")]
    assert len(parts) == 2
    manifest = json.load(open(os.path.join(out, "_EPOCH-0000000007")))
    assert sorted(manifest["files"]) == sorted(parts) and manifest["total_rows"] == 2
