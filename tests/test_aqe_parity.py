"""Adaptive-query-execution parity: results must be BIT-IDENTICAL with
AQE on and off. AQE re-plans at runtime (partition coalescing, skew
splitting, join-strategy switches) — none of which may change values.
A representative slice of the registry (one member per major physical
family) is hashed under both settings; any divergence would mean a
query's determinism depends on the physical plan, which is exactly the
failure mode the integer-sum / fixed-IEEE-expression design forbids.

`spark.sql.adaptive.enabled` is a runtime SQL conf, so one session can
flip it between runs (same JVM, same everything else).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.plans.fixture_queries import QUERIES

# one representative per physical family
AQE_PROBE = [
    "q9_nation_profit",  # multi-join + agg
    "q18_large_orders",  # semi-join on fact
    "o7_top_n_per_group",  # window group limit
    "ml_calibration",  # distributed prefix sum
    "rc_item_item_cf",  # pair build + top-k
    "gr_bfs_hops",  # iterative frontier rounds
    "dd_exact_dup_groups",  # hash dedup
    "jx_salted_join",  # salted skew join
    "jx_bloom_semijoin",  # bloom reduction
    "ev_rfm_segments",  # multi-pipeline histogram cuts
    "w11_rank_surface",  # rank windows
    "ag_corr_matrix",  # single-pass moments
]


def _result_hash(df) -> tuple:
    cols = sorted(df.columns)
    h = (
        df.select(F.xxhash64(*[F.col(c).cast("string") for c in cols]).alias("h"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("h").cast("decimal(38,0)")).alias("s"),
        )
        .collect()[0]
    )
    return (h["n"], h["s"])


@pytest.mark.parametrize("name", AQE_PROBE)
def test_aqe_on_off_identical(spark, sf_dir, name):
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    on = _result_hash(QUERIES[name](spark, sf_dir))
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        off = _result_hash(QUERIES[name](spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert on == off, f"{name}: AQE changed the result set"
    assert on[0] > 0
