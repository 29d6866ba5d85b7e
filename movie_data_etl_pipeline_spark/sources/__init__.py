from movie_data_etl_pipeline_spark.sources.parquet import (
    ensure_min_partitions,
    load_table,
    load_tables,
    register_views,
    write_table,
)

__all__ = [
    "ensure_min_partitions",
    "load_table",
    "load_tables",
    "register_views",
    "write_table",
]
