"""End-to-end ETL parity: synthesized TMDB-shaped JSON through the full
bronze→silver→load pipeline, asserting the reference's documented
behaviors (SURVEY.md §3 entry point 1):

* cross-page last-wins dedup (later page wins, ``02_etl.py:224-231``)
* empty-string release_date → NULL (``02_etl.py:76``)
* runtime_minutes always NULL at load AND preserved on re-upsert
  (``02_etl.py:67,81,92-100``)
* top-15 cast cap by billing order (``02_etl.py:172-184``)
* full rerun is a fixed point ("safe to rerun", README.md:81)
"""

from __future__ import annotations

import pytest

from movie_data_etl_pipeline_spark import pipeline
from movie_data_etl_pipeline_spark.sources import rest


def _movie(mid, title, page_rank=0.0, release="2020-01-01", genres=(1, 2)):
    return {
        "id": mid,
        "title": title,
        "original_title": title,
        "overview": f"about {title}",
        "release_date": release,
        "original_language": "en",
        "popularity": 10.0 + page_rank,
        "vote_average": 7.5,
        "vote_count": 100,
        "genre_ids": list(genres),
    }


@pytest.fixture(scope="module")
def landed(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("landed"))
    pages = [
        {"page": 1, "total_pages": 2, "results": [
            _movie(101, "Stale Title"),          # superseded on page 2
            _movie(102, "Only Page One", release=""),  # empty release date
        ]},
        {"page": 2, "total_pages": 2, "results": [
            _movie(101, "Fresh Title"),          # last occurrence wins
            _movie(103, "Page Two Movie", genres=(2,)),
        ]},
    ]
    genre_doc = {"genres": [{"id": 1, "name": "Action"}, {"id": 2, "name": "Drama"}]}
    credits = [
        {"id": 101, "cast": [
            {"id": p, "name": f"Actor{p}", "gender": p % 3, "popularity": float(p),
             "order": p, "character": f"Char{p}"} for p in range(20)  # >15 cast
        ], "crew": []},
        {"id": 102, "cast": [
            {"id": 1, "name": "Actor1", "gender": 1, "popularity": 99.0,
             "order": 0, "character": "Lead"}
        ], "crew": []},
    ]
    env_path = rest.land_json_docs(d, "pages", pages)
    genre_path = rest.land_json_docs(d, "genres", [genre_doc])
    credits_path = rest.land_json_docs(d, "credits", credits)
    return {
        "envelopes": rest.read_page_envelopes(spark, env_path),
        "genre_doc": rest.read_genre_list(spark, genre_path),
        "credits": rest.read_credits(spark, credits_path),
    }


def test_bronze_last_wins_across_pages(landed):
    bronze = pipeline.bronze_movies(landed["envelopes"]).collect()
    titles = {r["id"]: r["title"] for r in bronze}
    assert titles == {101: "Fresh Title", 102: "Only Page One", 103: "Page Two Movie"}


def test_duplicate_report(landed):
    rep = pipeline.movie_duplicate_report(landed["envelopes"]).collect()
    assert [(r["id"], r["n"]) for r in rep] == [(101, 2)]


def test_silver_movies_coercions(landed):
    movies = pipeline.silver_movies(pipeline.bronze_movies(landed["envelopes"]))
    rows = {r["tmdb_movie_id"]: r for r in movies.collect()}
    assert rows[102]["release_date"] is None          # "" → NULL (P3)
    assert rows[101]["release_date"] is not None
    assert all(r["runtime_minutes"] is None for r in rows.values())  # always NULL


def test_junction_and_topn(landed):
    bronze = pipeline.bronze_movies(landed["envelopes"])
    mg = pipeline.silver_movie_genre(bronze).collect()
    assert sorted((r["tmdb_movie_id"], r["tmdb_genre_id"]) for r in mg) == [
        (101, 1), (101, 2), (102, 1), (102, 2), (103, 2),
    ]
    ma = pipeline.silver_movie_actor(landed["credits"], top_n_cast=15)
    per_movie = {r["tmdb_movie_id"] for r in ma.collect()}
    assert per_movie == {101, 102}
    assert ma.filter("tmdb_movie_id = 101").count() == 15  # 20 capped to 15
    assert ma.filter("tmdb_movie_id = 101").agg({"cast_order": "max"}).first()[0] == 14


def test_full_rerun_fixed_point(landed):
    first = pipeline.run_pipeline(
        landed["envelopes"], landed["genre_doc"], landed["credits"]
    )
    second = pipeline.run_pipeline(
        landed["envelopes"], landed["genre_doc"], landed["credits"], existing=first
    )

    def rows(df, drop=("created_at",)):
        cols = [c for c in df.columns if c not in drop]
        return sorted(map(tuple, df.select(*cols).collect()))

    for name in first:
        assert rows(first[name]) == rows(second[name]), name


def test_runtime_backfill_preserved(spark, landed):
    from pyspark.sql import functions as F

    first = pipeline.run_pipeline(
        landed["envelopes"], landed["genre_doc"], landed["credits"]
    )
    backfilled = first["movies"].withColumn(
        "runtime_minutes",
        F.when(F.col("tmdb_movie_id") == 101, F.lit(123)).otherwise(F.col("runtime_minutes")),
    )
    state = dict(first, movies=backfilled)
    rerun = pipeline.run_pipeline(
        landed["envelopes"], landed["genre_doc"], landed["credits"], existing=state
    )
    got = {r["tmdb_movie_id"]: r["runtime_minutes"] for r in rerun["movies"].collect()}
    assert got[101] == 123  # backfill survives re-ingest (02_etl.py:92-100)
    assert got[102] is None
