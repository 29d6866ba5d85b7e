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


def _micros(c: Column) -> Column:
    """Epoch microseconds for TIMESTAMP and TIMESTAMP_NTZ alike (NTZ is
    cast through the session zone; both sides of a join get the same
    treatment, so ordering and ranges are unaffected)."""
    return F.unix_micros(c.cast("timestamp"))


def point_in_time_topk(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_seq: str,
    k: int = 3,
    horizon_micros: int = 7 * 24 * 3600 * 1_000_000,
    right_cols: Sequence[str] | None = None,
    rank_col: str = "pit_rank",
) -> DataFrame:
    """Point-in-time top-k join (the feature-store primitive): for every
    left row, the latest ``k`` right rows with ``right_ts`` in
    ``[left_ts - horizon, left_ts]`` for the same key — leakage-free
    training features ("what did we know about this entity at event
    time"), generalizing :func:`asof_join` from k=1 to k.

    Algorithm: the same union-tag single-shuffle shape as ``asof_join``,
    with a RANGE frame instead of a carry-forward. Both sides get an
    integer sort key ``2·epoch_micros + side`` (right=0, left=1 — the
    parity puts equal-timestamp right rows inside the left row's frame);
    one window per key with ``rangeBetween(-(2·horizon+1), 0)`` collects
    the horizon's right payloads; per-row ``array_sort`` on
    (−ts, −seq)-prefixed structs then ``slice(…, 1, k)`` keeps the k
    latest with a TOTAL deterministic order (``right_seq`` breaks
    timestamp ties), and ``posexplode`` emits one row per match with
    ``rank_col`` 1 = most recent. Left rows with no in-horizon match are
    dropped (inner semantics).

    Scale posture: ONE hash exchange on the key + per-partition sort —
    no join fan-out materialized; window state is bounded by the horizon
    (rows per key per horizon), which is the knob a 100 TB deployment
    tunes. The naive band-join render materializes horizon·|left| rows
    before ranking; this shape never does.
    """
    key = list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in key and c != right_ts and c != right_seq]
    payload = F.struct(
        (-_micros(F.col(right_ts))).alias("__nord"),
        (-F.col(right_seq)).alias("__eord"),
        F.col(right_ts).alias("__rts"),
        F.col(right_seq).alias("__rseq"),
        *[F.col(c) for c in right_cols],
    )
    r = right.select(
        *key,
        (_micros(F.col(right_ts)) * 2).alias("__sk"),
        payload.alias("__r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in left.columns],
    )
    l = left.select(
        *key,
        (_micros(F.col(left_ts)) * 2 + 1).alias("__sk"),
        F.lit(None).cast(r.schema["__r"].dataType).alias("__r"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    w = (
        Window.partitionBy(*key)
        .orderBy("__sk")
        .rangeBetween(-(2 * horizon_micros + 1), Window.currentRow)
    )
    collected = (
        r.unionByName(l)
        .withColumn("__matches", F.collect_list("__r").over(w))  # nulls (left rows) skipped
        .filter(F.col("__sk") % 2 == 1)
        .withColumn("__top", F.slice(F.array_sort("__matches"), 1, k))
    )
    return collected.select(
        *[F.col(f"__l_{c}").alias(c) for c in left.columns],
        F.posexplode("__top").alias("__pos", "__m"),
    ).select(
        *left.columns,
        (F.col("__pos") + 1).alias(rank_col),
        F.col("__m.__rts").alias(f"{right_ts}_r"),
        F.col("__m.__rseq").alias(f"{right_seq}_r"),
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


def fuzzy_self_join_levenshtein(
    df: DataFrame,
    text_col: str,
    max_dist: int,
    id_col: str | None = None,
) -> DataFrame:
    """Exact edit-distance self-join WITHOUT crossJoin: all pairs of
    rows whose ``text_col`` values are within Levenshtein distance
    ``max_dist``, found via length-band blocking.

    Blocking is lossless: edit distance >= |len(a) - len(b)|, so a pair
    within ``k`` must sit in adjacent length bands. The shorter side
    emits keys ``len .. len+k`` (k+1 rows), the longer side is probed on
    its exact length; equal-length pairs deduplicate on ``id < id``.
    The expensive ``levenshtein`` verify therefore runs only on the
    banded candidates — shuffle is linear in rows × (k+1), never
    |L|×|R| (compare ``range_join_binned`` above; same strategy, the
    "interval" is the length band). At corpus scale the same shape
    composes with content prefilters (shared-q-gram counts, as in
    ``dedup.ngram_jaccard_pairs``) for sharper candidate sets.

    Output: canonical pair ``(a_<text>, b_<text>, dist)`` with the
    lexically-smaller value first. ``id_col`` (when given) is the
    equal-length tiebreaker, letting distinct rows with identical text
    pair up as distance-0 duplicates; without it, identical values
    self-pair never (use on a DISTINCT projection).
    """
    cols = [text_col] + ([id_col] if id_col else [])
    base = df.select(*cols).withColumn("__len", F.length(text_col))
    tie = id_col or text_col
    a = base.select(
        F.col(text_col).alias("__a_val"),
        F.col(tie).alias("__a_tie"),
        F.col("__len").alias("__a_len"),
    ).withColumn("__band", F.explode(F.sequence(F.col("__a_len"), F.col("__a_len") + max_dist)))
    b = base.select(
        F.col(text_col).alias("__b_val"),
        F.col(tie).alias("__b_tie"),
        F.col("__len").alias("__b_len"),
    )
    pairs = (
        a.join(b, a["__band"] == b["__b_len"])
        .where(
            (F.col("__a_len") < F.col("__b_len"))
            | ((F.col("__a_len") == F.col("__b_len")) & (F.col("__a_tie") < F.col("__b_tie")))
        )
        .withColumn("dist", F.levenshtein("__a_val", "__b_val"))
        .where(F.col("dist") <= max_dist)
    )
    first = F.least("__a_val", "__b_val")
    second = F.greatest("__a_val", "__b_val")
    return pairs.select(
        first.alias(f"a_{text_col}"),
        second.alias(f"b_{text_col}"),
        F.col("dist").cast("bigint").alias("dist"),
    )
