"""Beyond-equi joins the reference lacks but a large-scale pipeline
needs (north-star extension, SURVEY.md §2.9): as-of (temporal) join and
range (interval/band) join.

The reference's SQL views only ever equi-join on natural keys
(``/root/reference/sql/03_views.sql:11,24,39-41,56-58``); these
operators extend that surface the way time-series / feature-store
workloads require, with Spark plans that survive 100 TB:

* ``asof_join`` — NOT a join at all physically: a union-tag + window
  scan. One shuffle on the key, zero row multiplication, no range
  predicate for the optimizer to mis-plan as a nested loop.
* ``range_join_binned`` — equality pre-join on fixed-width bins (the
  standard trick behind Databricks' range-join hints): each interval
  explodes into the bins it covers, probes equality-join on their bin,
  and the exact predicate filters residue. Shuffle is linear in
  rows × bins-per-interval instead of |L|×|R|.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] | None = None,
    tolerance: Column | None = None,
) -> DataFrame:
    """Backward as-of join: attach to every left row the *latest* right
    row with ``right_ts <= left_ts`` for the same key (ties at equal
    timestamps match, like pandas ``merge_asof`` / DuckDB ``ASOF JOIN``).

    Algorithm (scale-first): tag and union both inputs, then one window
    pass per key ordered by (ts, side) carrying the last-seen right
    payload forward (``last(..., ignorenulls=True)`` over an unbounded
    preceding frame). Compared to the naive range join this is a single
    hash exchange on ``on`` + a per-partition sort — the cost profile of
    ONE groupBy, independent of how many right rows precede each left
    row. Right rows sort before left rows at the same timestamp so
    equal-ts matches are visible.

    ``right_cols`` (default: all non-key, non-ts right columns) are
    emitted as ``<col>_r`` plus ``<right_ts>_r`` for the matched row's
    timestamp. ``tolerance``: optional max lookback (e.g.
    ``F.expr("INTERVAL 1 HOUR")``); older matches become NULL.
    """
    key = list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in key and c != right_ts]
    payload = F.struct(
        F.col(right_ts).alias("__rts"), *[F.col(c) for c in right_cols]
    )
    r = right.select(
        *key,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        payload.alias("__r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in left.columns],
    )
    l = left.select(
        *key,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__r"].dataType).alias("__r"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    w = (
        Window.partitionBy(*key)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        r.unionByName(l)
        .withColumn("__m", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    if tolerance is not None:
        matched = matched.withColumn(
            "__m",
            F.when(F.col("__m.__rts") >= F.col("__ts") - tolerance, F.col("__m")),
        )
    return matched.select(
        *[F.col(f"__l_{c}").alias(c) for c in left.columns],
        F.col("__m.__rts").alias(f"{right_ts}_r"),
        *[F.col(f"__m.{c}").alias(f"{c}_r") for c in right_cols],
    )


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    lo: str,
    hi: str,
    bin_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join each left row to every right interval with
    ``lo <= left_val < hi``, without a cross/nested-loop join.

    Both sides map into fixed-width bins: a point belongs to one bin, an
    interval covers ``ceil((hi-lo)/w)`` bins (``sequence`` + ``explode``).
    The join is then a plain equality join on the bin id — hash-
    partitioned, AQE-skew-splittable — followed by the exact range
    predicate. Pick ``bin_width`` near the median interval width so the
    explode factor stays O(1). ``how='left'`` keeps unmatched points
    (NULL interval columns).
    """
    binned_l = left.withColumn(
        "__bin", F.floor(F.col(left_val) / F.lit(bin_width)).cast("long")
    )
    binned_r = right.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo) / F.lit(bin_width)).cast("long"),
                # hi is exclusive, but a point in hi's bin can still be < hi
                F.floor(F.col(hi) / F.lit(bin_width)).cast("long"),
            )
        ),
    )
    cond = (
        (binned_l["__bin"] == binned_r["__bin"])
        & (binned_l[left_val] >= binned_r[lo])
        & (binned_l[left_val] < binned_r[hi])
    )
    joined = binned_l.join(binned_r, cond, how)
    return joined.select(
        *[binned_l[c] for c in left.columns],
        *[binned_r[c] for c in right.columns],
    )
