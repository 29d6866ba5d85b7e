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


def delta_join(
    a_old: DataFrame,
    delta_a: DataFrame,
    b_old: DataFrame,
    delta_b: DataFrame,
    on: Sequence[str],
) -> DataFrame:
    """The delta of an inner join when BOTH inputs grow (insert-only):

        Δ(A ⋈ B) = ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB

    — the classical incremental-view-maintenance identity (Blakeley et
    al.'s counting algorithm restricted to insertions; the general
    insert+delete form needs signed multiplicities — Z-relations, as in
    DBSP — which :func:`merge_agg_state` could carry as negative
    counts, documented not implemented).

    Why it matters at 100 TB: refreshing a joined rollup by re-joining
    two full fact tables costs O(|A|+|B|) per refresh forever; the
    delta identity costs O(|ΔA|+|ΔB|) joins against the other side
    (each prunable to the delta's key range / partitions) plus the
    tiny ΔA⋈ΔB term. Combined with ``merge_agg_state`` the whole
    pipeline touches delta-sized data only.

    Inputs must be disjoint from their deltas (old ∩ delta = ∅ per
    key-row); the three terms are then disjoint by construction and
    the union needs no dedup.
    """
    key = list(on)
    return (
        delta_a.join(b_old, key)
        .unionByName(a_old.join(delta_b, key))
        .unionByName(delta_a.join(delta_b, key))
    )
