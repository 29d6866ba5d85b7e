"""The reference's four analytical views as DataFrame combinators
(SURVEY.md §2.8 V1–V4, source ``/root/reference/sql/03_views.sql:4-61``).

Each function takes the base DataFrames and returns the view DataFrame;
``register`` publishes them as temp views so the SQL surface
(``SELECT * FROM v_top_actors LIMIT 20``, ``/root/reference/README.md:106``)
works identically to the reference.

Scale notes (100 TB posture):
* ``genres`` / ``actors`` are dimensions — Catalyst broadcast-joins them
  automatically under the configured threshold; we add an explicit
  ``F.broadcast`` on the genre side (19 rows in the reference) so the
  plan never degrades to a shuffle even without stats.
* ``countDistinct`` compiles to a two-phase HashAggregate with an Expand
  for the distinct column — partial aggregation runs map-side, so the
  shuffle carries (group, distinct-key) pairs, not raw fact rows.
* The final ``ORDER BY`` is a range-partitioned global sort; consumers
  that only need the head should ``.limit(k)``, which Spark rewrites to
  ``TakeOrderedAndProject`` (no full sort materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def v_top_actors(actors: DataFrame, movie_actor: DataFrame) -> DataFrame:
    """Movies per actor (``sql/03_views.sql:4-13``): J1 + A1 + T1."""
    return (
        actors.join(movie_actor, "tmdb_person_id", "inner")
        .groupBy("tmdb_person_id", "name")
        .agg(F.countDistinct("tmdb_movie_id").alias("movie_count"))
        .orderBy(F.desc("movie_count"), F.asc("name"))
    )


def v_top_genres(genres: DataFrame, movie_genre: DataFrame) -> DataFrame:
    """Movies per genre (``sql/03_views.sql:17-26``): J2 + A2 + T2."""
    return (
        F.broadcast(genres)
        .join(movie_genre, "tmdb_genre_id", "inner")
        .groupBy("tmdb_genre_id", F.col("name").alias("genre_name"))
        .agg(F.countDistinct("tmdb_movie_id").alias("movie_count"))
        .orderBy(F.desc("movie_count"), F.asc("genre_name"))
    )


def v_genre_ratings(genres: DataFrame, movie_genre: DataFrame, movies: DataFrame) -> DataFrame:
    """Per-genre rating stats (``sql/03_views.sql:30-43``): J3 + A3 + P8 + T3."""
    return (
        F.broadcast(genres)
        .join(movie_genre, "tmdb_genre_id", "inner")
        .join(movies, "tmdb_movie_id", "inner")
        .groupBy("tmdb_genre_id", F.col("name").alias("genre_name"))
        .agg(
            F.countDistinct("tmdb_movie_id").alias("movies_in_genre"),
            F.round(F.avg("vote_average"), 2).alias("avg_rating"),
            F.sum("vote_count").alias("total_votes"),
            F.round(F.avg("popularity"), 2).alias("avg_popularity"),
        )
        .orderBy(F.desc("avg_rating"), F.desc("movies_in_genre"))
    )


def v_top_actors_by_rating(
    actors: DataFrame, movie_actor: DataFrame, movies: DataFrame, min_movies: int = 3
) -> DataFrame:
    """Per-actor rating stats with HAVING (``sql/03_views.sql:47-61``):
    J4 + A4 + A5 + P8 + T4. The HAVING clause becomes a post-aggregation
    ``filter`` on the aggregate alias (``sql/03_views.sql:60``)."""
    return (
        actors.join(movie_actor, "tmdb_person_id", "inner")
        .join(movies, "tmdb_movie_id", "inner")
        .groupBy("tmdb_person_id", F.col("name").alias("actor_name"))
        .agg(
            F.countDistinct("tmdb_movie_id").alias("movie_count"),
            F.round(F.avg("vote_average"), 2).alias("avg_movie_rating"),
            F.sum("vote_count").alias("total_votes"),
        )
        .filter(F.col("movie_count") >= min_movies)
        .orderBy(F.desc("avg_movie_rating"), F.desc("movie_count"), F.desc("total_votes"))
    )


def register(
    spark: SparkSession,
    movies: DataFrame,
    genres: DataFrame,
    actors: DataFrame,
    movie_genre: DataFrame,
    movie_actor: DataFrame,
) -> dict[str, DataFrame]:
    """Create all four views as temp views (the SQL surface) and return
    the DataFrames (the DataFrame surface)."""
    views = {
        "v_top_actors": v_top_actors(actors, movie_actor),
        "v_top_genres": v_top_genres(genres, movie_genre),
        "v_genre_ratings": v_genre_ratings(genres, movie_genre, movies),
        "v_top_actors_by_rating": v_top_actors_by_rating(actors, movie_actor, movies),
    }
    for name, df in views.items():
        df.createOrReplaceTempView(name)
    return views
