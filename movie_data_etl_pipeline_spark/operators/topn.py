"""Per-group top-N (SURVEY.md §2.6 O7 / §2.7 T6).

The reference keeps the first 15 cast members of each movie's
billing-order-sorted cast array (``/root/reference/02_etl.py:172-184``,
``cast[:top_n]`` with rationale at ``02_etl.py:176``). The relational
semantics are "top-N rows per group, by a rank column, ascending".

Spark rendering: a rank window, NOT a per-group collect — the window
shuffles once on the group key and streams each partition sorted, so it
scales to groups that don't fit in memory and never touches the driver.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_n_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column | str],
    n: int,
    rank_col: str = "rank",
    keep_rank: bool = True,
) -> DataFrame:
    """Keep the first ``n`` rows of each group under ``order_cols``.

    ``row_number`` (not ``rank``) reproduces the reference's slice
    semantics exactly: a hard cap of ``n`` rows per group even on ties.
    Callers must make ``order_cols`` a total order within the group
    (e.g. include a unique id last) or tie-survival is nondeterministic.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    out = df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= n)
    return out if keep_rank else out.drop(rank_col)


def top_cast(movie_actor: DataFrame, n: int = 15) -> DataFrame:
    """Reference-shaped: top-``n`` cast per movie by billing order
    (``02_etl.py:178``; TMDB pre-sorts ``cast`` by ``order``)."""
    return top_n_per_group(
        movie_actor,
        ["tmdb_movie_id"],
        [F.asc("cast_order"), F.asc("tmdb_person_id")],
        n,
        rank_col="billing_rank",
        keep_rank=False,
    )


def stratified_sample_exact(
    df: DataFrame,
    strata_cols: Sequence[str],
    n_per_stratum: int,
    salt_col: str,
) -> DataFrame:
    """Exact per-stratum quota sample: keep exactly
    ``min(n_per_stratum, |stratum|)`` rows per stratum, chosen by a
    content-derived pseudo-random order — the per-language /
    per-source quota cut a training-data pipeline applies before
    expensive downstream stages (dedup, similarity, decoding).

    Unlike ``df.sampleBy`` (Bernoulli per row: quota only in
    expectation, different rows every run), the rank window gives a
    *hard* quota and a *reproducible* pick: rows are ordered by
    ``md5(salt_col)`` — effectively uniform, engine-independent, and
    stable across reruns — with the raw key as tiebreaker. One shuffle
    on the strata key; at scale this is the same plan as any per-group
    top-N (pre-shuffle WindowGroupLimit applies).
    """
    key = F.md5(F.col(salt_col).cast("string"))
    return top_n_per_group(
        df,
        strata_cols,
        [F.asc(key), F.asc(salt_col)],
        n_per_stratum,
        keep_rank=False,
    )
