"""Python DataSource connectors (sources/pyds.py): the paginated-API
scan as a partition-parallel batch source with page-filter pruning, and
the replayable synthetic micro-batch stream source."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.operators.dedup import dedup_last_wins
from movie_data_etl_pipeline_spark.sources.pyds import (
    _event_rows,
    _EventsStreamReader,
    register_python_sources,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_python_sources(spark)


def _pages_df(spark, pages=4, page_size=10):
    return (
        spark.read.format("tmdb_pages")
        .option("pages", pages)
        .option("page_size", page_size)
        .load()
    )


def test_batch_read_shape_and_parallelism(spark):
    df = _pages_df(spark, pages=4, page_size=10)
    assert df.count() == 40
    assert df.rdd.getNumPartitions() == 4  # one task per page
    assert [f.name for f in df.schema.fields] == [
        "page", "tmdb_movie_id", "title", "original_language",
        "release_date", "popularity", "vote_average", "vote_count", "genre_ids",
    ]


def test_deterministic_across_reads(spark):
    a = sorted(map(tuple, _pages_df(spark).collect()))
    b = sorted(map(tuple, _pages_df(spark).collect()))
    assert a == b


def test_page_filter_prunes_partitions(spark):
    df = _pages_df(spark, pages=6, page_size=5).filter(F.col("page") == 3)
    assert df.rdd.getNumPartitions() == 1  # pushFilters pruned 5 of 6 pages
    assert df.count() == 5
    rng = _pages_df(spark, pages=6, page_size=5).filter(F.col("page") > 4)
    assert rng.rdd.getNumPartitions() == 2


def test_cross_page_duplicates_and_last_wins(spark):
    df = _pages_df(spark, pages=3, page_size=10)
    dups = df.groupBy("tmdb_movie_id").count().filter("count > 1")
    assert dups.count() == 2  # one boundary duplicate per page seam
    # arrival order = page; last-wins keeps the page-p+1 payload, whose
    # popularity is bumped +5.0 over the original
    deduped = dedup_last_wins(df, ["tmdb_movie_id"], [F.desc("page")])
    assert deduped.count() == df.count() - 2
    boundary_id = 100_000 + 9  # last movie of page 1
    orig_pop = df.filter((F.col("tmdb_movie_id") == boundary_id) & (F.col("page") == 1)).collect()[0]["popularity"]
    kept_pop = deduped.filter(F.col("tmdb_movie_id") == boundary_id).collect()[0]["popularity"]
    assert kept_pop == pytest.approx(orig_pop + 5.0)


def test_empty_string_release_dates_present(spark):
    df = _pages_df(spark, pages=4, page_size=20)
    assert df.filter(F.col("release_date") == "").count() > 0  # P3 input shape


def test_stream_reader_replay_is_exact():
    r = _EventsStreamReader({"batch_size": 7, "max_batches": 3})
    it, off1 = r.read(r.initialOffset())
    first = list(it)
    assert off1 == {"batch": 1} and len(first) == 7
    assert list(r.readBetweenOffsets({"batch": 0}, {"batch": 1})) == first
    # exhausted source returns an empty batch at a fixed offset
    it, off = r.read({"batch": 3})
    assert list(it) == [] and off == {"batch": 3}


def test_stream_end_to_end_micro_batches(spark, tmp_path):
    df = (
        spark.readStream.format("synthetic_events")
        .option("batch_size", 50)
        .option("max_batches", 3)
        .load()
    )
    agg = df.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("pyds_events")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            q.processAllAvailable()
            got = spark.sql("SELECT SUM(n) AS t FROM pyds_events").collect()[0]["t"]
            if got == 150:
                break
            time.sleep(0.5)
        rows = {r["event_type"]: r["n"] for r in spark.sql("SELECT * FROM pyds_events").collect()}
    finally:
        q.stop()
    expect: dict[str, int] = {}
    for b in range(3):
        for _, _, _, et in _event_rows(b, 50):
            expect[et] = expect.get(et, 0) + 1
    assert rows == expect
