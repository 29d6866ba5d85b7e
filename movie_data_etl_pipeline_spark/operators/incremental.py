"""Incremental aggregate maintenance — materialized-rollup upkeep.

The reference recomputes its four views from scratch on every query
(PostgreSQL view inlining, ``/root/reference/sql/03_views.sql``); at
100 TB a daily-refreshed rollup cannot rescan history. These operators
maintain an *aggregate state table* (the rollup at some grain) by
merging in each new batch's partial aggregate — the batch/streaming
analogue of Spark's own partial+final HashAggregate split, lifted to
cross-run persistence.

Correctness rests on the measures being **algebraic**: COUNT and SUM
merge by addition, MIN/MAX by min/max; AVG is carried as (sum, count)
and finalized at read time. Anything non-algebraic (exact distinct,
median) needs a sketch (HLL, quantile digest — see ``ap_approx_stats``)
or a full regroup.

Scale posture: the state table lives at the rollup grain (orders of
magnitude smaller than the fact), the batch side aggregates before the
merge (map-side combine has already collapsed it), and the merge is one
hash shuffle on the rollup keys. With the state partitioned by a date
key, each refresh rewrites only the partitions its batch touches.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_agg_state(
    state: DataFrame,
    batch_agg: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str],
    min_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
) -> DataFrame:
    """Merge a batch's partial aggregate into the rollup state: same
    schema both sides, union then re-aggregate with the merge function
    of each measure (SUM columns add — COUNT is a SUM of counts —
    MIN/MAX take min/max). Associative and commutative, so any batch
    arrival order and any repartitioning yields the same state."""
    aggs = (
        [F.sum(c).alias(c) for c in sum_cols]
        + [F.min(c).alias(c) for c in min_cols]
        + [F.max(c).alias(c) for c in max_cols]
    )
    return state.unionByName(batch_agg).groupBy(*keys).agg(*aggs)
