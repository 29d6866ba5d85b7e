"""Mergeable distinct-count sketches as DATA (the pre-aggregation
pattern).

At 100 TB the question is rarely "what is today's distinct-user
count" — it's "distinct users for ANY date range / region / segment
combination, interactively". Exact COUNT(DISTINCT) cannot be
pre-aggregated (distinct is not summable across groups); HLL sketches
can: build one small binary sketch per finest-grained cell ONCE, store
it like any other column, and answer every coarser roll-up by merging
sketches — no re-scan of the raw data, ever. Merging is max-of-
registers: commutative, associative, idempotent, so estimates are
bit-reproducible regardless of partitioning or merge order (asserted
in tests, not just claimed), and re-delivered rows cannot inflate the
count (idempotence is the exactly-once-free dedup property).

Spark 4 ships the Apache DataSketches HLL family as JVM aggregates
(``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``);
everything here is codegen-compatible built-ins — no UDFs.

The reference has no analogue (Postgres would re-scan per rollup);
this is a north-star scale extension (SURVEY.md §2.9).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# lg_k=14 → 16 Ki registers ≈ 0.8% relative standard error, exact to
# ~thousands of uniques; 12 KiB per sketch cell — the profile relation
# stays tiny relative to the data even with millions of cells.
DEFAULT_LG_K = 14


def hll_profile(
    df: DataFrame, keys: Sequence[str], col: str, lg_k: int = DEFAULT_LG_K
) -> DataFrame:
    """The finest-grain sketch relation: one row per ``keys`` cell with
    the binary HLL sketch of ``col`` (column ``sk``) — the persistable
    artifact every later roll-up merges from. One scan, one partially-
    aggregated shuffle on the cell keys."""
    return df.groupBy(*keys).agg(F.hll_sketch_agg(col, F.lit(lg_k)).alias("sk"))


def hll_rollup(profile: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Roll the sketch relation up to coarser ``keys``: merge the cell
    sketches (``hll_union_agg``) and render the distinct estimate.
    Input is the profile, not the data — cost scales with #cells."""
    return (
        profile.groupBy(*keys)
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("n_distinct_est"))
        .orderBy(*keys)
    )


def hll_estimate_cells(profile: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Per-cell estimates straight off the profile (no merge) — the
    sanity view of the stored sketches."""
    return profile.select(
        *keys, F.hll_sketch_estimate("sk").alias("n_distinct_est")
    ).orderBy(*keys)


# ---------------------------------------------------------------------------
# Mergeable quantile sketch: fixed-bin integer histogram state
# ---------------------------------------------------------------------------
#
# Same pre-aggregation argument as the HLL profile, for quantiles: exact
# percentiles cannot be pre-aggregated, but a fixed-bin histogram over a
# declared integer domain can — states merge by summing bin counts
# (commutative/associative/deterministic), and any roll-up answers any
# quantile to ±bin-width without re-scanning the data. Unlike t-digest /
# KLL (whose merge is order-sensitive in the low bits), every operation
# here is int64 arithmetic: the same inputs give the same sketch on any
# partitioning, any engine — so the whole path is oracle-checkable.


def histogram_profile(
    df: DataFrame,
    keys: Sequence[str],
    col: str,
    lo: int,
    hi: int,
    n_bins: int = 4096,
) -> DataFrame:
    """Finest-grain histogram state: one row per (keys…, bin) with the
    int64 count. ``col`` must be integer-valued (cents discipline);
    values outside [lo, hi) saturate into the edge bins (documented
    sketch behavior, not data loss — the count is preserved).
    Overflow bound: (hi-lo)·n_bins must fit int64."""
    b = F.least(
        F.lit(n_bins - 1),
        F.greatest(
            F.lit(0),
            F.expr(f"(({col} - {lo}) * {n_bins}) div ({hi} - {lo})").cast("long"),
        ),
    )
    return df.groupBy(*keys, b.alias("bin")).agg(F.count(F.lit(1)).alias("cnt"))


def histogram_rollup(profile: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Merge histogram states to coarser ``keys``: element-wise sum of
    bin counts. Input is the profile relation — cost scales with #cells,
    never with the raw data."""
    return profile.groupBy(*keys, "bin").agg(F.sum("cnt").alias("cnt"))


def histogram_quantiles(
    profile: DataFrame,
    keys: Sequence[str],
    qs: Sequence[tuple[str, int, int]],
    lo: int,
    hi: int,
    n_bins: int = 4096,
) -> DataFrame:
    """Quantile estimates off a (possibly rolled-up) histogram state.

    For each ``(name, num, den)`` in ``qs`` the estimate is the LEFT
    EDGE of the smallest bin whose cumulative count reaches
    ``num/den`` of the cell total — the lower-quantile convention on
    binned data, every comparison exact int64 (``cum·den ≥ num·total``),
    so the result is engine- and partitioning-exact. Error vs the true
    quantile is bounded by one bin width.
    """
    from pyspark.sql import Window

    klist = list(keys)
    w = Window.partitionBy(*klist).orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.partitionBy(*klist)
    cum = profile.select(
        *klist,
        "bin",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(wt).alias("total"),
    )
    aggs = [F.max("total").alias("n_rows")]
    for name, num, den in qs:
        aggs.append(
            F.min(F.when(F.col("cum") * den >= F.lit(num) * F.col("total"), F.col("bin")))
            .alias(f"min_bin_{name}")
        )
    found = cum.groupBy(*klist).agg(*aggs)
    outs = [F.col(c) for c in klist] + [F.col("n_rows")]
    for name, _, _ in qs:
        outs.append(
            (F.lit(lo) + F.expr(f"(min_bin_{name} * ({hi} - {lo})) div {n_bins}"))
            .cast("long")
            .alias(name)
        )
    return found.select(*outs).orderBy(*klist)
