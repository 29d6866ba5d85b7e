from movie_data_etl_pipeline_spark.plans import movie_views, fixture_queries

__all__ = ["movie_views", "fixture_queries"]
