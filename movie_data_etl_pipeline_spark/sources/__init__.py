from movie_data_etl_pipeline_spark.sources.parquet import (
    load_table,
    load_tables,
    register_views,
    write_table,
)

__all__ = ["load_table", "load_tables", "register_views", "write_table"]
