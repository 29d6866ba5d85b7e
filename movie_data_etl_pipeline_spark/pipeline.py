"""The reference ETL pipeline re-expressed as one lazy DataFrame DAG
(SURVEY.md §3 entry point 1: ``/root/reference/02_etl.py:248-272``).

Medallion layering replaces the reference's staged driver lists:

* **bronze** — landed TMDB JSON read under explicit schemas
  (sources.rest): page envelopes and credits documents;
* **silver** — the five normalized tables
  (``/root/reference/sql/01_schema.sql``), produced by explode /
  projection / dedup / top-N operators;
* **load** — idempotent merges into existing table state
  (operators.merge), honoring every ON CONFLICT clause of the
  reference including the ``runtime_minutes`` preserve rule
  (``02_etl.py:92-100``).

Stage-by-stage parity map (reference → here):

====================  =========================================
02_etl.py stage       function below
====================  =========================================
fetch_popular 50-62   sources.rest (landed) → ``bronze_movies``
print_duplicates 233  ``operators.dedup.duplicate_report``
dedupe 224-231        ``bronze_movies`` (last-wins window)
load_movies 64-107    ``silver_movies`` + ``merge.upsert``
load_movie_genres     ``silver_movie_genre`` + insert_if_absent
 109-133
credits loop 202-221  ``silver_actors`` / ``silver_movie_actor``
                      (join+explode replaces the N+1 loop)
====================  =========================================

Scale notes: every stage is a narrow transformation or a single keyed
shuffle; arrival order is an explicit column (page*page_size + index) so
last-wins dedup is deterministic at any parallelism; the per-movie
credits fetch becomes a bulk scan + explode, so ingest throughput is
bounded by the landing job, not by driver round-trips.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.operators import dedup, merge, topn

PAGE_SIZE = 20  # TMDB fixed page size (02_etl.py:53)


# ---------------------------------------------------------------------------
# bronze → silver transforms
# ---------------------------------------------------------------------------


def bronze_movies(envelopes: DataFrame) -> DataFrame:
    """Page envelopes → one deduplicated row per movie.

    ``posexplode(results)`` keeps the within-page index, so arrival
    order ``page*PAGE_SIZE + pos`` is explicit and the last-wins dedup
    (O6, ``02_etl.py:224-231``) is deterministic — the reference gets
    this implicitly from dict-overwrite order."""
    exploded = envelopes.select(
        "page", F.posexplode("results").alias("pos", "m")
    ).select(
        (F.col("page") * PAGE_SIZE + F.col("pos")).alias("arrival_seq"),
        F.col("m.*"),
    )
    return dedup.dedup_last_wins(exploded, ["id"], [F.desc("arrival_seq")])


def movie_duplicate_report(envelopes: DataFrame) -> DataFrame:
    """Pre-dedup quality check (A6, ``02_etl.py:233-244``)."""
    raw = envelopes.select(F.explode("results").alias("m")).select("m.id")
    return dedup.duplicate_report(raw, ["id"])


def silver_movies(bronze: DataFrame) -> DataFrame:
    """P2–P4 projection (``02_etl.py:64-82``): 9 API fields + always-NULL
    ``runtime_minutes`` (the /movie/popular payload omits it,
    ``02_etl.py:67,81``); empty-string release_date → NULL
    (``02_etl.py:76``)."""
    return bronze.select(
        F.col("id").alias("tmdb_movie_id"),
        F.col("title"),
        F.col("original_title"),
        F.col("overview"),
        F.to_date(F.nullif(F.col("release_date"), F.lit(""))).alias("release_date"),
        F.col("original_language").alias("language"),
        F.col("popularity").cast("decimal(10,3)").alias("popularity"),
        F.col("vote_average").cast("decimal(4,2)").alias("vote_average"),
        F.col("vote_count"),
        F.lit(None).cast("int").alias("runtime_minutes"),
        F.current_timestamp().alias("created_at"),
    )


def silver_genres(genre_doc: DataFrame) -> DataFrame:
    """P1 (``02_etl.py:31-35``): the genre list document's ``genres``
    array → (tmdb_genre_id, name)."""
    return genre_doc.select(F.explode("genres").alias("g")).select(
        F.col("g.id").alias("tmdb_genre_id"), F.col("g.name").alias("name")
    )


def silver_movie_genre(bronze: DataFrame) -> DataFrame:
    """F1 (``02_etl.py:112-117``): explode ``genre_ids`` into the M:N
    junction; distinct guards the composite PK
    (``sql/01_schema.sql:45``)."""
    return (
        bronze.select(
            F.col("id").alias("tmdb_movie_id"),
            F.explode("genre_ids").alias("tmdb_genre_id"),
        )
        .distinct()
    )


def silver_actors(credits: DataFrame) -> DataFrame:
    """P5 (``02_etl.py:142-153``): every cast member over all movies,
    deduped by person id (an actor appears in many casts); highest
    popularity wins deterministically."""
    cast = credits.select(F.explode("cast").alias("c")).select(
        F.col("c.id").alias("tmdb_person_id"),
        F.col("c.name").alias("name"),
        F.col("c.gender").alias("gender"),
        F.col("c.popularity").cast("decimal(10,3)").alias("popularity"),
    )
    deduped = dedup.dedup_last_wins(
        cast, ["tmdb_person_id"], [F.desc("popularity"), F.asc("name")]
    )
    return deduped.withColumn("created_at", F.current_timestamp())


def silver_movie_actor(credits: DataFrame, top_n_cast: int = 15) -> DataFrame:
    """F2+O7+P6 (``02_etl.py:171-184,208-219``): struct-array explode of
    ``cast`` with payload columns, capped to the top ``top_n_cast`` by
    billing order per movie (``cast[:top_n]``, rationale
    ``02_etl.py:176``)."""
    exploded = credits.select(
        F.col("id").alias("tmdb_movie_id"), F.explode("cast").alias("c")
    ).select(
        "tmdb_movie_id",
        F.col("c.id").alias("tmdb_person_id"),
        F.col("c.order").alias("cast_order"),
        F.col("c.character").alias("character_name"),
    )
    return topn.top_cast(exploded, n=top_n_cast)


# ---------------------------------------------------------------------------
# idempotent load (the reference's ON CONFLICT surface, §2.6)
# ---------------------------------------------------------------------------


def load_movies(existing: DataFrame, incoming: DataFrame) -> DataFrame:
    """O8 with the preserve rule: ``runtime_minutes`` is NOT updated on
    conflict (``02_etl.py:92-100``) — a backfilled runtime survives
    re-ingest."""
    return merge.upsert(
        existing, incoming, ["tmdb_movie_id"], preserve_cols=["runtime_minutes"]
    )


def load_genres(existing: DataFrame, incoming: DataFrame) -> DataFrame:
    """O8 (``02_etl.py:37-46``)."""
    return merge.upsert(existing, incoming, ["tmdb_genre_id"])


def load_actors(existing: DataFrame, incoming: DataFrame) -> DataFrame:
    """O8 (``02_etl.py:158-169``)."""
    return merge.upsert(existing, incoming, ["tmdb_person_id"])


def load_movie_genre(existing: DataFrame, incoming: DataFrame) -> DataFrame:
    """O9 insert-if-absent (``02_etl.py:123-131``)."""
    return merge.insert_if_absent(existing, incoming, ["tmdb_movie_id", "tmdb_genre_id"])


def load_movie_actor(existing: DataFrame, incoming: DataFrame) -> DataFrame:
    """O8 on the composite key (``02_etl.py:189-199``)."""
    return merge.upsert(existing, incoming, ["tmdb_movie_id", "tmdb_person_id"])


def run_pipeline(
    envelopes: DataFrame,
    genre_doc: DataFrame,
    credits: DataFrame,
    existing: dict[str, DataFrame] | None = None,
    top_n_cast: int = 15,
) -> dict[str, DataFrame]:
    """Full batch pipeline (``main``, ``02_etl.py:248-272``): bronze →
    silver → merged state. ``existing`` carries prior table state (for
    the rerun/idempotency path); when None, loads reduce to the silver
    frames themselves."""
    bronze = bronze_movies(envelopes)
    silver = {
        "movies": silver_movies(bronze),
        "genres": silver_genres(genre_doc),
        "movie_genre": silver_movie_genre(bronze),
        "actors": silver_actors(credits),
        "movie_actor": silver_movie_actor(credits, top_n_cast),
    }
    if existing is None:
        return silver
    loaders = {
        "movies": load_movies,
        "genres": load_genres,
        "movie_genre": load_movie_genre,
        "actors": load_actors,
        "movie_actor": load_movie_actor,
    }
    return {name: loaders[name](existing[name], silver[name]) for name in silver}
