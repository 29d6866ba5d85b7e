"""Explicit schemas for every table the engine reads.

Two families:

* The driver fixture tables (``/root/repo/FIXTURES.md`` §A) — TPC-H-ish
  star schema plus ``events`` / ``documents`` / ``embeddings``.
* The reference movie schema (``/root/reference/sql/01_schema.sql:9-59``),
  carried so movie-shaped frames can be built / validated. Surrogate
  identity keys are dropped on purpose: the reference never joins on them
  (every FK and view join uses the natural ``tmdb_*`` keys, e.g.
  ``/root/reference/sql/01_schema.sql:46-47``, ``sql/03_views.sql:11``).

Explicit schemas (not inference) are the scale posture: on a 100 TB lake a
schema-inference pass is a full extra scan, and silent type drift between
files becomes a correctness bug. ``spark.read.schema(...).parquet(...)``
also lets Catalyst prune columns against a known ReadSchema.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Driver fixture tables (FIXTURES.md §A) — types match the parquet exactly.
# ---------------------------------------------------------------------------

REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType()),
        T.StructField("r_name", T.StringType()),
    ]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_name", T.StringType()),
        T.StructField("s_nationkey", T.IntegerType()),
        T.StructField("s_acctbal", T.DoubleType()),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType()),
        T.StructField("p_name", T.StringType()),
        T.StructField("p_brand", T.StringType()),
        T.StructField("p_type", T.StringType()),
        T.StructField("p_size", T.IntegerType()),
        T.StructField("p_retailprice", T.DoubleType()),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_partkey", T.LongType()),
        T.StructField("l_suppkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_extendedprice", T.DoubleType()),
        T.StructField("l_discount", T.DoubleType()),
        T.StructField("l_tax", T.DoubleType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_linestatus", T.StringType()),
        T.StructField("l_shipdate", T.TimestampType()),
    ]
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

# Physical read schema for events: the fixture stores ts as
# TIMESTAMP(NANOS), which Spark's parquet reader does not support as a
# timestamp — with spark.sql.legacy.parquet.nanosAsLong it arrives as
# int64 nanos; sources.parquet converts to TimestampType (µs truncation,
# identical to DuckDB's nanosecond handling).
EVENTS_RAW = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

FIXTURE_SCHEMAS: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

# ---------------------------------------------------------------------------
# Reference movie schema (/root/reference/sql/01_schema.sql:9-59), natural
# keys only. Decimal types kept where the reference declares NUMERIC so
# ROUND semantics match an exact-decimal oracle.
# ---------------------------------------------------------------------------

MOVIES = T.StructType(
    [
        T.StructField("tmdb_movie_id", T.IntegerType(), False),
        T.StructField("title", T.StringType(), False),
        T.StructField("original_title", T.StringType()),
        T.StructField("overview", T.StringType()),
        T.StructField("release_date", T.DateType()),
        T.StructField("language", T.StringType()),
        T.StructField("popularity", T.DecimalType(10, 3)),
        T.StructField("vote_average", T.DecimalType(4, 2)),
        T.StructField("vote_count", T.IntegerType()),
        T.StructField("runtime_minutes", T.IntegerType()),
        T.StructField("created_at", T.TimestampType(), False),
    ]
)

GENRES = T.StructType(
    [
        T.StructField("tmdb_genre_id", T.IntegerType(), False),
        T.StructField("name", T.StringType(), False),
    ]
)

ACTORS = T.StructType(
    [
        T.StructField("tmdb_person_id", T.IntegerType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("gender", T.IntegerType()),
        T.StructField("popularity", T.DecimalType(10, 3)),
        T.StructField("created_at", T.TimestampType(), False),
    ]
)

MOVIE_GENRE = T.StructType(
    [
        T.StructField("tmdb_movie_id", T.IntegerType(), False),
        T.StructField("tmdb_genre_id", T.IntegerType(), False),
    ]
)

MOVIE_ACTOR = T.StructType(
    [
        T.StructField("tmdb_movie_id", T.IntegerType(), False),
        T.StructField("tmdb_person_id", T.IntegerType(), False),
        T.StructField("cast_order", T.IntegerType()),
        T.StructField("character_name", T.StringType()),
    ]
)

MOVIE_SCHEMAS: dict[str, T.StructType] = {
    "movies": MOVIES,
    "genres": GENRES,
    "actors": ACTORS,
    "movie_genre": MOVIE_GENRE,
    "movie_actor": MOVIE_ACTOR,
}

# Ingest-side nested JSON shapes (/root/reference/02_etl.py:58,116,138,213):
# the TMDB paginated envelope, the per-movie genre_ids array, and the
# credits document. Used by sources.rest to parse landed JSON without
# inference.

TMDB_MOVIE_RAW = T.StructType(
    [
        T.StructField("id", T.IntegerType()),
        T.StructField("title", T.StringType()),
        T.StructField("original_title", T.StringType()),
        T.StructField("overview", T.StringType()),
        T.StructField("release_date", T.StringType()),  # "" → NULL downstream (02_etl.py:76)
        T.StructField("original_language", T.StringType()),
        T.StructField("popularity", T.DoubleType()),
        T.StructField("vote_average", T.DoubleType()),
        T.StructField("vote_count", T.IntegerType()),
        T.StructField("genre_ids", T.ArrayType(T.IntegerType())),
    ]
)

TMDB_PAGE_ENVELOPE = T.StructType(
    [
        T.StructField("page", T.IntegerType()),
        T.StructField("results", T.ArrayType(TMDB_MOVIE_RAW)),
        T.StructField("total_pages", T.IntegerType()),
    ]
)

TMDB_GENRE_LIST = T.StructType(
    [
        T.StructField(
            "genres",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("id", T.IntegerType()),
                        T.StructField("name", T.StringType()),
                    ]
                )
            ),
        )
    ]
)

TMDB_CAST_MEMBER = T.StructType(
    [
        T.StructField("id", T.IntegerType()),
        T.StructField("name", T.StringType()),
        T.StructField("gender", T.IntegerType()),
        T.StructField("popularity", T.DoubleType()),
        T.StructField("order", T.IntegerType()),
        T.StructField("character", T.StringType()),
    ]
)

TMDB_CREDITS = T.StructType(
    [
        T.StructField("id", T.IntegerType()),  # movie id
        T.StructField("cast", T.ArrayType(TMDB_CAST_MEMBER)),
        T.StructField("crew", T.ArrayType(T.MapType(T.StringType(), T.StringType()))),
    ]
)
