from movie_data_etl_pipeline_spark.functions import scalar, text, vector

__all__ = ["scalar", "text", "vector"]
