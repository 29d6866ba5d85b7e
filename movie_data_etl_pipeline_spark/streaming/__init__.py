from movie_data_etl_pipeline_spark.streaming import windows

__all__ = ["windows"]
