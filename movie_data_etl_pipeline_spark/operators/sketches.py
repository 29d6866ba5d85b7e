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
