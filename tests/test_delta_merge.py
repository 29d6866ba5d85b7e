"""End-to-end execution of the Delta `MERGE INTO` path (cow.delta_merge_builder)
and its equivalence with the self-contained BucketedCowTable upsert.

The container ships no Delta runtime and installs are not permitted, so
the test skips with that reason where `delta` is absent — the gap is a
documented environment limit (COVERAGE.md), not untested-by-choice. On
an environment with delta-spark the test runs fully.
"""

from __future__ import annotations

import pytest

from movie_data_etl_pipeline_spark.operators import cow


def _delta_available() -> bool:
    try:
        import delta  # noqa: F401
        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _delta_available(),
    reason="no Delta runtime in this container (pip installs not permitted); "
    "BucketedCowTable covers the MERGE semantics — see COVERAGE.md",
)
def test_delta_merge_matches_bucketed_cow(spark, tmp_path):
    target_rows = [(1, "a", 10), (2, "b", 20), (3, "c", 30)]
    batch_rows = [(2, "B", 200), (4, "d", 40)]
    schema = "k int, name string, v int"

    target = spark.createDataFrame(target_rows, schema)
    batch = spark.createDataFrame(batch_rows, schema)

    delta_path = str(tmp_path / "delta_target")
    target.write.format("delta").save(delta_path)
    builder = cow.delta_merge_builder(spark, delta_path, batch, ["k"])
    builder.whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()
    got = {
        tuple(r)
        for r in spark.read.format("delta").load(delta_path).collect()
    }

    t = cow.BucketedCowTable(str(tmp_path / "cow_target"), ["k"], n_buckets=4)
    t.init(target)
    t.upsert(spark, batch)
    want = {
        tuple(r)
        for r in t.read(spark).select("k", "name", "v").collect()
    }
    assert got == want


def test_delta_merge_raises_clearly_without_runtime(spark, tmp_path):
    if _delta_available():
        pytest.skip("delta runtime present; covered by the equivalence test")
    df = spark.createDataFrame([(1, 1)], "k int, v int")
    with pytest.raises(NotImplementedError, match="Delta runtime not available"):
        cow.delta_merge_builder(spark, str(tmp_path), df, ["k"])
