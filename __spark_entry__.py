"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``movie_data_etl_pipeline_spark`` (SURVEY.md §2
operator inventory → plans.fixture_queries registry).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from movie_data_etl_pipeline_spark.plans.fixture_queries import (  # noqa: E402
    ORACLES,
    QUERIES,
    v1_top_actors,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's
    headline view shape (v_top_actors: scan → join → distinct-agg →
    multi-key sort; /root/reference/sql/03_views.sql:4-13)."""
    return v1_top_actors(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §2.9."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every hash-checkable query;
    hash-/approximation-dependent ops are omitted → rows-only check."""
    return dict(ORACLES)
