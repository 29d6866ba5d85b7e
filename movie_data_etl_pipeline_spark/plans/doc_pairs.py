"""Shared document near-duplicate pair / duplicate-component builds.

Six registry queries run over the exact 3-shingle Jaccard pair relation
of the ``documents`` table — ``dd_ngram_jaccard``, ``gr_triangles``,
``gr_local_clustering`` at threshold 0.5, and ``dd_dup_clusters``,
``dd_canonical_pick``, ``dd_survivorship`` at threshold 0.8 (the last
three ALSO each re-ran connected components over the same pairs). This
module builds each (sf, threshold) pair relation, and the 0.8
component labeling, ONCE per SparkSession (WeakKeyDictionary, same
discipline as ``plans/graph_edges``) and eagerly localCheckpoints it,
so the shingle explode + inverted-index self-join — the expensive part
of every consumer — is paid once per session.

At 100 TB the shared relation is the near-dup pair list itself
(bounded by the prefix/positional filters in ``operators/dedup``), the
natural intermediate a production dedup pipeline materializes anyway.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame, SparkSession

from movie_data_etl_pipeline_spark.operators import dedup
from movie_data_etl_pipeline_spark.sources import load_table

_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


def jaccard_pairs(spark: SparkSession, sf: str, threshold: float) -> DataFrame:
    """Exact 3-gram-shingle Jaccard near-dup pairs at ``threshold``,
    built and eagerly localCheckpointed once per (session, sf,
    threshold)."""
    per = _CACHE.setdefault(spark, {})
    key = (sf, "pairs", threshold)
    if key not in per:
        docs = load_table(spark, sf, "documents")
        per[key] = dedup.ngram_jaccard_pairs(
            docs, n=3, threshold=threshold
        ).localCheckpoint(eager=True)
    return per[key]


def dup_components(spark: SparkSession, sf: str, threshold: float = 0.8) -> DataFrame:
    """Connected components (min-label propagation) over the cached
    pair relation — the duplicate-cluster labeling three dd_* queries
    consume."""
    per = _CACHE.setdefault(spark, {})
    key = (sf, "comp", threshold)
    if key not in per:
        per[key] = dedup.connected_components(
            jaccard_pairs(spark, sf, threshold), "a_id", "b_id"
        ).localCheckpoint(eager=True)
    return per[key]
