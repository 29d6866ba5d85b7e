from movie_data_etl_pipeline_spark.operators import (
    dedup,
    merge,
    multimodal,
    similarity,
    text_analysis,
    topn,
)

__all__ = ["dedup", "merge", "multimodal", "similarity", "text_analysis", "topn"]
