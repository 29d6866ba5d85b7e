"""Reference views V1–V4 on synthesized movie-schema data
(``/root/reference/sql/03_views.sql``), checked against hand-computed
results, plus the SQL surface via ``register``."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pytest

from movie_data_etl_pipeline_spark.plans import movie_views
from movie_data_etl_pipeline_spark.schemas import (
    ACTORS,
    GENRES,
    MOVIE_ACTOR,
    MOVIE_GENRE,
    MOVIES,
)


@pytest.fixture(scope="module")
def frames(spark):
    now = dt.datetime(2026, 1, 1)
    movies = spark.createDataFrame(
        [
            (1, "M1", "M1", None, dt.date(2020, 1, 1), "en",
             Decimal("10.000"), Decimal("8.00"), 100, None, now),
            (2, "M2", "M2", None, dt.date(2021, 1, 1), "en",
             Decimal("20.000"), Decimal("6.00"), 200, None, now),
            (3, "M3", "M3", None, None, "fr",
             Decimal("30.000"), Decimal("7.00"), 300, None, now),
        ],
        MOVIES,
    )
    genres = spark.createDataFrame([(10, "Action"), (20, "Drama")], GENRES)
    actors = spark.createDataFrame(
        [(100, "Alice", 1, Decimal("5.000"), now), (200, "Bob", 2, Decimal("4.000"), now)],
        ACTORS,
    )
    movie_genre = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 20)], MOVIE_GENRE
    )
    movie_actor = spark.createDataFrame(
        [(1, 100, 0, "Hero"), (2, 100, 1, "Cameo"), (3, 100, 0, "Lead"), (3, 200, 1, "Side")],
        MOVIE_ACTOR,
    )
    return movies, genres, actors, movie_genre, movie_actor


def test_v_top_actors(frames):
    movies, genres, actors, movie_genre, movie_actor = frames
    out = movie_views.v_top_actors(actors, movie_actor).collect()
    assert [(r["tmdb_person_id"], r["movie_count"]) for r in out] == [(100, 3), (200, 1)]


def test_v_top_genres(frames):
    movies, genres, actors, movie_genre, movie_actor = frames
    out = movie_views.v_top_genres(genres, movie_genre).collect()
    assert [(r["genre_name"], r["movie_count"]) for r in out] == [("Action", 2), ("Drama", 1)]


def test_v_genre_ratings(frames):
    movies, genres, actors, movie_genre, movie_actor = frames
    out = movie_views.v_genre_ratings(genres, movie_genre, movies).collect()
    by_name = {r["genre_name"]: r for r in out}
    assert float(by_name["Action"]["avg_rating"]) == 7.00  # (8+6)/2
    assert by_name["Action"]["total_votes"] == 300
    assert float(by_name["Drama"]["avg_rating"]) == 7.00
    # tie on avg_rating broken by movies_in_genre desc → Action first
    assert out[0]["genre_name"] == "Action"


def test_v_top_actors_by_rating_having(frames):
    movies, genres, actors, movie_genre, movie_actor = frames
    out = movie_views.v_top_actors_by_rating(actors, movie_actor, movies, min_movies=3).collect()
    # only Alice reaches 3 distinct movies (HAVING semantics, sql/03_views.sql:60)
    assert [r["actor_name"] for r in out] == ["Alice"]
    assert float(out[0]["avg_movie_rating"]) == 7.00
    assert out[0]["total_votes"] == 600


def test_sql_surface(spark, frames):
    movies, genres, actors, movie_genre, movie_actor = frames
    movie_views.register(spark, movies, genres, actors, movie_genre, movie_actor)
    got = spark.sql("SELECT * FROM v_top_actors LIMIT 20").collect()
    assert got[0]["name"] == "Alice" and got[0]["movie_count"] == 3
