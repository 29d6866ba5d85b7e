"""movie_data_etl_pipeline_spark — a PySpark-native analytics engine.

Re-expresses the query / data-processing capabilities of the reference
``Marcelo-Gzz/Movie-Data-ETL-Pipeline`` (a TMDB → PostgreSQL ETL with four
analytical SQL views; see ``SURVEY.md``) as an idiomatic Spark DataFrame
engine, then extends it with the operators a large-scale training-data
pipeline needs (dedup, similarity search, text analysis, streaming,
multimodal columns).

Design stance (SURVEY.md §7):
- every operator is a pure function ``(SparkSession, sf_dir) -> DataFrame``
  or a DataFrame→DataFrame combinator — no driver-side collect loops;
- declarative DataFrame/SQL plans so Catalyst handles pushdown, pruning,
  join selection, and AQE handles skew/coalescing at scale;
- plain Parquet storage so a DuckDB oracle can cross-check every result.
"""

from movie_data_etl_pipeline_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
