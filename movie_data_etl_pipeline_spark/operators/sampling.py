"""Deterministic corpus sampling operators (north-star training-data
extension, alongside ``topn.stratified_sample_exact``).

A pretraining corpus is assembled to a TARGET MIXTURE over domains
(web/books/code/... — the Pile/DoReMi-style reweighting), not to
whatever ratio the crawl happened to produce. ``mixture_sample``
computes, per domain, the acceptance rate that yields the largest
corpus achieving the target mixture WITHOUT upsampling any domain,
then applies it with a hash-deterministic Bernoulli draw.

Determinism is load-bearing: the accept/reject decision is a pure
function of the row id (md5-derived uniform), so reruns, retries, and
different cluster sizes produce the SAME sample — and the whole
operator is oracle-expressible in any engine with md5. Contrast
``DataFrame.sample``, whose output depends on partitioning.

Scale posture: one tiny groupBy (|domains| rows) for the counts, a
1-row aggregate for the feasibility cap, two broadcast joins to pin
the per-domain rate on every row, and a codegen'd filter. No driver
collect anywhere; the wide scan is traversed exactly once.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 16^12: the md5-prefix uniform's denominator. 12 hex digits = 48 bits,
# exactly representable in a double (< 2^53), so u is uniform on a
# 2^48-point lattice in [0, 1) — identical in Spark and DuckDB.
_U_DENOM = float(16**12)


def uniform_hash(col: Column, salt: str = "") -> Column:
    """Deterministic uniform in [0, 1) from a key column: the first 12
    hex digits of md5(salt || key) scaled down. Engine-independent
    (md5 is bit-identical everywhere), partition-independent,
    rerun-stable. Distinct ``salt`` values give independent draws from
    the same key — sampling and train/test splitting must not reuse
    one draw or their decisions correlate."""
    keyed = F.concat(F.lit(salt), col.cast("string"))
    return (
        F.conv(F.substring(F.md5(keyed), 1, 12), 16, 10).cast("double")
        / F.lit(_U_DENOM)
    )


def mixture_sample(
    docs: DataFrame,
    domain_col: str,
    weights: Mapping[str, float],
    id_col: str,
) -> DataFrame:
    """Downsample ``docs`` so the surviving corpus matches the target
    mixture ``weights`` over ``domain_col`` as closely as possible
    without upsampling: the binding domain (the one that runs out
    first at the target mixture) is kept whole, every other domain is
    hash-thinned to its proportional share. Domains absent from
    ``weights`` are dropped (weight 0).

    With counts n_d and normalized weights w_d, the largest feasible
    corpus is N = min_d(n_d / w_d); each domain keeps rate
    r_d = w_d * N / n_d ≤ 1 of its rows, accepted where
    ``uniform_hash(id) < r_d``. Expected sampled size is N; the draw
    is Bernoulli per row, so realized counts concentrate around the
    target (exact-quota needs ``topn.stratified_sample_exact``).
    """
    total_w = float(sum(weights.values()))
    if total_w <= 0:
        raise ValueError("weights must sum to a positive value")
    spark = docs.sparkSession
    w = spark.createDataFrame(
        [(d, float(v) / total_w) for d, v in weights.items()],
        f"{domain_col} string, __w double",
    )
    counts = docs.groupBy(domain_col).agg(F.count(F.lit(1)).alias("__n"))
    feas = counts.join(F.broadcast(w), domain_col)
    cap = feas.agg(F.min(F.col("__n") / F.col("__w")).alias("__cap"))
    rates = (
        feas.crossJoin(F.broadcast(cap))
        .select(
            domain_col,
            (F.col("__w") * F.col("__cap") / F.col("__n")).alias("__rate"),
        )
    )
    return (
        docs.join(F.broadcast(rates), domain_col)
        .where(uniform_hash(F.col(id_col)) < F.col("__rate"))
        .drop("__rate")
    )


def hash_split(
    docs: DataFrame,
    id_col: str,
    fractions: Mapping[str, float],
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/validation/test assignment: each row gets
    the split whose cumulative-fraction interval contains its
    ``uniform_hash(id)``. A row's split never changes as the corpus
    grows (membership depends only on its own id), which is what keeps
    eval sets stable across dataset versions — the property random
    splits lose."""
    total = float(sum(fractions.values()))
    if total <= 0:
        raise ValueError("fractions must sum to a positive value")
    u = uniform_hash(F.col(id_col), salt="split:")
    expr = None
    acc = 0.0
    names = list(fractions)
    for name in names[:-1]:
        acc += float(fractions[name]) / total
        cond = u < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return docs.withColumn(split_col, expr)


def temporal_split(
    df: DataFrame,
    ts_col: str,
    cutoff: str,
    embargo_days: int = 1,
    label_col: str = "split",
) -> DataFrame:
    """Leakage-safe temporal train/test split: rows strictly before
    ``cutoff − embargo`` train, rows at/after ``cutoff`` test, and the
    embargo gap between them is QUARANTINED (labeled, not silently
    dropped — auditable row accounting). The time-series complement of
    the hash split above: random splits leak future information through
    temporally-correlated rows; the embargo also absorbs label lookahead
    windows (a model labeled with "next-24h outcome" must not train on
    rows whose label window crosses the cutoff).

    Pure projection — no shuffle; the split column composes with any
    downstream export/filter.
    """
    c = F.to_timestamp(F.lit(cutoff))
    lo = c - F.expr(f"INTERVAL {int(embargo_days)} DAYS")
    t = F.col(ts_col)
    return df.withColumn(
        label_col,
        F.when(t < lo, F.lit("train"))
        .when(t < c, F.lit("embargo"))
        .otherwise(F.lit("test")),
    )


def weighted_sample_es(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    strata: Sequence[str] = (),
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis
    A-ES): each row draws priority u^(1/w) for u uniform from its key's
    hash; the k largest priorities per stratum are exactly a weighted
    sample without replacement. Computed as ln(u)/w — the monotone
    transform that avoids cross-engine pow() — with u =
    (mix(str_hash(key))+1)/(P+1) from the portable family, so the
    SELECTION (not just its size) is deterministic, replayable, and
    oracle-checkable.

    Scale: no shuffle beyond one per-stratum top-k, which compiles to a
    pre-shuffle WindowGroupLimit — per-stratum reducer state is k rows.
    The classic use: quality-weighted corpus subsampling where simple
    Bernoulli over-represents junk."""
    from pyspark.sql import Window

    from movie_data_etl_pipeline_spark.functions import portable_hash as ph

    u = (ph.mix(ph.str_hash(F.col(key_col).cast("string"))) + F.lit(1)).cast(
        "double"
    ) / F.lit(float(ph.P + 1))
    pri = F.log(u) / F.col(weight_col).cast("double")
    ranked = df.withColumn("__pri", pri)
    w = Window.partitionBy(*strata).orderBy(
        F.desc("__pri"), F.asc(key_col)
    )
    return (
        ranked.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .drop("__pri")
    )
