"""Round-3 wave 9: the feature-engineering layer — equal-frequency
discretization, leave-one-out target encoding, hashing-trick feature
audit, funnel step-latency quantiles, and a fixed-seed power
iteration for the leading embedding eigenvector.

Determinism contract unchanged: exact integer state for every
cross-row reduction; where an iterative algorithm needs a norm
(power iteration), the norm is ONE left-associated double expression
over exactly-converted integers, written identically in Spark and
the DuckDB oracle, so both engines iterate in lockstep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.functions import portable_hash as ph
from movie_data_etl_pipeline_spark.functions import scalar as SC
from movie_data_etl_pipeline_spark.sources import load_table


# ---------------------------------------------------------------------------
# fe_quantile_bins — equal-frequency discretization
# ---------------------------------------------------------------------------

_QB_BINS = 8


def fe_quantile_bins(spark: SparkSession, sf: str) -> DataFrame:
    """Equal-frequency binning of ``o_totalprice`` into 8 buckets —
    the feature-engineering discretizer (and the histogram-equalized
    axis a drill-down UI wants). Boundary b_i = the smallest cents
    value whose cumulative count reaches i/8 of all rows (the lower
    quantile, read off the VALUE-GRAIN histogram exactly as
    `ap_exact_quantiles` does); bin(x) = #{i : x ≥ b_i}.

    Scale: one fact-grain aggregation to the price histogram; the
    cumulative window, the 7-boundary derivation, and the bin
    assignment all run at DISTINCT-VALUE grain (bounded by the price
    domain, not the row count); the boundary relation is a 7-row
    broadcast."""
    o = load_table(spark, sf, "orders").select(SC.cents("o_totalprice").alias("vc"))
    hist = o.groupBy("vc").agg(F.count(F.lit(1)).alias("c"))
    nn = hist.agg(F.sum("c").alias("nn"))
    wcum = Window.orderBy("vc").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select("vc", F.sum("c").over(wcum).alias("cc"))
    idx = spark.range(1, _QB_BINS).select(F.col("id").alias("i"))
    bounds = (
        cum.crossJoin(F.broadcast(nn))
        .crossJoin(F.broadcast(idx))
        .filter(F.col("cc") * _QB_BINS >= F.col("i") * F.col("nn"))
        .groupBy("i")
        .agg(F.min("vc").alias("b"))
    )
    binned = (
        hist.crossJoin(F.broadcast(bounds))
        .groupBy("vc", "c")
        .agg(F.sum((F.col("vc") >= F.col("b")).cast("bigint")).alias("bin"))
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.sum("c").alias("n_rows"),
            F.min("vc").alias("lo_c"),
            F.max("vc").alias("hi_c"),
            F.sum(F.col("vc").cast("decimal(28,0)") * F.col("c")).alias("s"),
        )
        .select(
            "bin",
            "n_rows",
            "lo_c",
            "hi_c",
            F.round(
                F.col("s").cast("double") / F.col("n_rows").cast("double"), 6
            ).alias("mean_c"),
        )
        .orderBy("bin")
    )


_FE_QB_SQL = f"""
WITH o AS (SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS vc FROM orders),
hist AS (SELECT vc, COUNT(*) AS c FROM o GROUP BY 1),
nq AS (SELECT CAST(SUM(c) AS BIGINT) AS nn FROM hist),
cum AS (SELECT vc, CAST(SUM(c) OVER (ORDER BY vc) AS BIGINT) AS cc FROM hist),
idx AS (SELECT i FROM (VALUES (1),(2),(3),(4),(5),(6),(7)) t(i)),
bounds AS (
  SELECT i, MIN(vc) AS b FROM cum, nq, idx
  WHERE cc * {_QB_BINS} >= i * nn GROUP BY i
),
binned AS (
  SELECT h.vc, h.c,
         CAST(SUM(CASE WHEN h.vc >= bo.b THEN 1 ELSE 0 END) AS BIGINT) AS bin
  FROM hist h CROSS JOIN bounds bo
  GROUP BY h.vc, h.c
)
SELECT bin,
       CAST(SUM(c) AS BIGINT) AS n_rows,
       MIN(vc) AS lo_c,
       MAX(vc) AS hi_c,
       ROUND(CAST(SUM(vc * c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 6) AS mean_c
FROM binned GROUP BY bin
"""


# ---------------------------------------------------------------------------
# fe_target_encode — leave-one-out target encoding
# ---------------------------------------------------------------------------


def fe_target_encode(spark: SparkSession, sf: str) -> DataFrame:
    """Leave-one-out target encoding of ``o_orderpriority`` against
    the cents order value: each row's feature is the mean target of
    the OTHER rows in its category, (S_cat − x) / (n_cat − 1) — the
    standard leakage-safe categorical encoder (plain mean encoding
    leaks the row's own label into its feature).

    Exactness: category sums are exact cents; the single division
    happens per row at render and is snapped back to WHOLE cents —
    a 6-decimal render of a ~1e7 mean needs 14 significant digits,
    where Spark's and DuckDB's ROUND diverge by an ulp. Scale: one
    category aggregation (category domain is a catalog constant)
    broadcast back into the fact scan — no fact-side shuffle at
    all."""
    o = load_table(spark, sf, "orders").select(
        "o_orderkey",
        F.col("o_orderpriority").alias("category"),
        SC.cents("o_totalprice").alias("vc"),
    )
    g = o.groupBy("category").agg(
        F.sum("vc").alias("s"), F.count(F.lit(1)).alias("n")
    )
    loo = F.when(
        F.col("n") > 1,
        F.round(
            (F.col("s") - F.col("vc")).cast("double")
            / (F.col("n") - 1).cast("double")
        ).cast("bigint"),
    )
    return (
        o.join(F.broadcast(g), "category")
        .select("o_orderkey", "category", loo.alias("loo_mean_c"))
        .orderBy("o_orderkey")
    )


_FE_TE_SQL = """
WITH o AS (
  SELECT o_orderkey, o_orderpriority AS category,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS vc
  FROM orders
),
g AS (
  SELECT category, CAST(SUM(vc) AS BIGINT) AS s, COUNT(*) AS n
  FROM o GROUP BY 1
)
SELECT o.o_orderkey, o.category,
       CASE WHEN g.n > 1
            THEN CAST(ROUND(CAST(g.s - o.vc AS DOUBLE)
                            / CAST(g.n - 1 AS DOUBLE)) AS BIGINT)
       END AS loo_mean_c
FROM o JOIN g USING (category)
"""


# ---------------------------------------------------------------------------
# fe_hashed_features — hashing-trick bucket audit
# ---------------------------------------------------------------------------

_FH_BUCKETS = 32


def fe_hashed_features(spark: SparkSession, sf: str) -> DataFrame:
    """Hashing-trick feature audit: categorical tokens (prefixed
    status and priority values) hashed into 32 feature buckets with
    the engine-portable ``mix(str_hash(·))``, then per-bucket row
    mass and DISTINCT token count — n_tokens > 1 is a collision, the
    quantity that decides whether the hash width is large enough
    before anyone trains on the features.

    Scale: token explosion is row-local; one aggregation at bucket
    grain (≤32 groups), countDistinct over a catalog-bounded token
    domain."""
    o = load_table(spark, sf, "orders").select(
        F.explode(
            F.array(
                F.concat(F.lit("st:"), F.col("o_orderstatus")),
                F.concat(F.lit("pr:"), F.col("o_orderpriority")),
            )
        ).alias("tok")
    )
    idx = ph.mix(ph.str_hash(F.col("tok"))) % F.lit(_FH_BUCKETS)
    return (
        o.select(idx.alias("feature_idx"), "tok")
        .groupBy("feature_idx")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("tok").alias("n_tokens"),
        )
        .orderBy("feature_idx")
    )


_FE_FH_SQL = f"""
WITH tok AS (
  SELECT unnest(['st:' || o_orderstatus, 'pr:' || o_orderpriority]) AS tok
  FROM orders
)
SELECT {ph.sql_mix(ph.sql_str_hash("tok"))} % {_FH_BUCKETS} AS feature_idx,
       COUNT(*) AS n_rows,
       COUNT(DISTINCT tok) AS n_tokens
FROM tok
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# ev_step_latency — funnel step-to-step latency quantiles
# ---------------------------------------------------------------------------

_FUNNEL_PAIRS = [("signup", "view"), ("view", "click"), ("click", "purchase")]


def ev_step_latency(spark: SparkSession, sf: str) -> DataFrame:
    """Per funnel edge (signup→view, view→click, click→purchase):
    exact min / p25 / p50 / p75 / max / mean of the per-user latency
    between FIRST occurrences of the two steps, in whole seconds —
    the companion measurement to `ev_funnel`'s conversion counts
    (how long conversion takes, not just whether it happens).

    The quantiles are read off the (edge, latency-second) HISTOGRAM
    with a cumulative window — the `ap_exact_quantiles` discipline;
    second-snapping bounds the histogram domain at any scale. One
    user-grain aggregation, two equi-joins on user_id."""
    firsts = (
        load_table(spark, sf, "events")
        .groupBy("user_id", "event_type")
        .agg(F.min("ts").alias("t"))
    )
    pairs = spark.createDataFrame(_FUNNEL_PAIRS, "step_a string, step_b string")
    a = firsts.select("user_id", F.col("event_type").alias("step_a"), F.col("t").alias("ta"))
    b = firsts.select("user_id", F.col("event_type").alias("step_b"), F.col("t").alias("tb"))
    lat = (
        a.join(F.broadcast(pairs), "step_a")
        .join(b, ["user_id", "step_b"])
        .filter(F.col("tb") >= F.col("ta"))
        .select(
            "step_a",
            "step_b",
            F.expr("(unix_micros(tb) - unix_micros(ta)) DIV 1000000").alias("lat_s"),
        )
    )
    hist = lat.groupBy("step_a", "step_b", "lat_s").agg(F.count(F.lit(1)).alias("c"))
    tot = hist.groupBy("step_a", "step_b").agg(
        F.sum("c").alias("n_users"),
        F.min("lat_s").alias("min_s"),
        F.max("lat_s").alias("max_s"),
        F.sum(F.col("lat_s") * F.col("c")).alias("s"),
    )
    wcum = (
        Window.partitionBy("step_a", "step_b")
        .orderBy("lat_s")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.select(
        "step_a", "step_b", "lat_s", F.sum("c").over(wcum).alias("cc")
    )
    q = (
        cum.join(F.broadcast(tot), ["step_a", "step_b"])
        .groupBy("step_a", "step_b")
        .agg(
            F.min(F.when(F.col("cc") * 4 >= F.col("n_users"), F.col("lat_s"))).alias("p25_s"),
            F.min(F.when(F.col("cc") * 2 >= F.col("n_users"), F.col("lat_s"))).alias("p50_s"),
            F.min(F.when(F.col("cc") * 4 >= 3 * F.col("n_users"), F.col("lat_s"))).alias("p75_s"),
        )
    )
    return (
        tot.join(q, ["step_a", "step_b"])
        .select(
            "step_a",
            "step_b",
            "n_users",
            "min_s",
            "p25_s",
            "p50_s",
            "p75_s",
            "max_s",
            F.round(
                F.col("s").cast("double") / F.col("n_users").cast("double"), 6
            ).alias("mean_s"),
        )
        .orderBy("step_a", "step_b")
    )


_EV_STEP_SQL = """
WITH firsts AS (
  SELECT user_id, event_type, MIN(ts) AS t FROM events GROUP BY 1, 2
),
pairs AS (
  SELECT step_a, step_b FROM (VALUES
    ('signup', 'view'), ('view', 'click'), ('click', 'purchase')
  ) t(step_a, step_b)
),
lat AS (
  SELECT p.step_a, p.step_b,
         (epoch_us(b.t) - epoch_us(a.t)) // 1000000 AS lat_s
  FROM firsts a
  JOIN pairs p ON a.event_type = p.step_a
  JOIN firsts b ON b.user_id = a.user_id AND b.event_type = p.step_b
  WHERE b.t >= a.t
),
hist AS (
  SELECT step_a, step_b, lat_s, COUNT(*) AS c FROM lat GROUP BY 1, 2, 3
),
tot AS (
  SELECT step_a, step_b,
         CAST(SUM(c) AS BIGINT) AS n_users,
         MIN(lat_s) AS min_s, MAX(lat_s) AS max_s,
         CAST(SUM(lat_s * c) AS BIGINT) AS s
  FROM hist GROUP BY 1, 2
),
cum AS (
  SELECT step_a, step_b, lat_s,
         CAST(SUM(c) OVER (PARTITION BY step_a, step_b ORDER BY lat_s
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cc
  FROM hist
),
q AS (
  SELECT cum.step_a, cum.step_b,
         MIN(CASE WHEN cc * 4 >= n_users THEN lat_s END) AS p25_s,
         MIN(CASE WHEN cc * 2 >= n_users THEN lat_s END) AS p50_s,
         MIN(CASE WHEN cc * 4 >= 3 * n_users THEN lat_s END) AS p75_s
  FROM cum JOIN tot USING (step_a, step_b)
  GROUP BY 1, 2
)
SELECT t.step_a, t.step_b, t.n_users, t.min_s, q.p25_s, q.p50_s, q.p75_s,
       t.max_s,
       ROUND(CAST(t.s AS DOUBLE) / CAST(t.n_users AS DOUBLE), 6) AS mean_s
FROM tot t JOIN q USING (step_a, step_b)
"""


# ---------------------------------------------------------------------------
# emb_pca_power — leading eigenvector by fixed-seed power iteration
# ---------------------------------------------------------------------------

_PCA_DIMS = 8
_PCA_ROUNDS = 3


def emb_pca_power(spark: SparkSession, sf: str) -> DataFrame:
    """Leading eigenvector of the 8×8 embedding covariance by THREE
    unrolled power-iteration rounds from the fixed all-ones start —
    the PCA direction `emb_cov_audit`'s matrix feeds, without any
    driver-side linear algebra.

    Engine lockstep for an iterative float algorithm: the covariance
    is nano-snapped to integers once; each round's matvec
    u = S_n·v_n is an EXACT decimal sum; the norm is one
    left-associated double expression over the 8 exactly-converted
    u components (no float aggregation whose order could differ);
    the renormalized vector is re-snapped to nano units. λ̂ falls
    out of the last norm. Everything after the one fact-grain
    cross-moment aggregation runs on ≤64-row relations."""
    emb = load_table(spark, sf, "embeddings").select(
        F.transform(
            F.col("embedding"),
            lambda x: F.round(x.cast("double") * 1e6).cast("bigint"),
        ).alias("e")
    )
    # r10 optimization (guide §2.5/§1.2 — idle capacity): the sf
    # fixture scans as ONE task (single row group), so the 64-cell
    # explode + hash aggregate — the dominant cost — ran on one core
    # with 31 idle. Fan the 1-column projection out to machine width
    # first (ensure_min_partitions is a no-op on a real cluster's
    # splits). A wide single-row 73-decimal-sum aggregate was also
    # A/B'd and REJECTED: 4.15 vs 2.88 s interleaved at sf0.1 — the
    # 73-buffer-field aggregate loses whole-stage codegen while the
    # grouped form keeps it (tools/ab_r10_opt.json).
    from movie_data_etl_pipeline_spark.sources.parquet import ensure_min_partitions

    emb = ensure_min_partitions(emb)
    # r11 (guide §1.1 empirical loop / §7.3 driver-side cost): the
    # 64-struct cell expression used to be built with ~320 chained
    # Column calls — every one a py4j round-trip — and the phase split
    # measured 2.6 s of DRIVER-SIDE DataFrame construction against
    # ~1-2 s of actual execution for this query. Rendering the same
    # expression as ONE SQL string (one py4j call, parsed JVM-side)
    # builds in ~0.1 s; the logical plan, schema, and values are
    # identical (asserted in the interleaved A/B). SQL `e[i]` is
    # 0-based ≡ element_at(e, i+1).
    cells_sql = "array(" + ",".join(
        f"struct({i} as i, {j} as j, (e[{i}] * e[{j}]) as xy, e[{i}] as x, e[{j}] as y)"
        for i in range(_PCA_DIMS)
        for j in range(_PCA_DIMS)
    ) + ")"
    ex = emb.select(F.explode(F.expr(cells_sql)).alias("c")).select(
        "c.i", "c.j", "c.xy", "c.x", "c.y"
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    nn = F.col("n").cast("double")
    cov = (
        (nn * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy").cast("double"))
        / (nn * nn)
        / F.lit(1e12)
    )
    m = (
        ex.groupBy("i", "j")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(dec("xy")).alias("sxy"),
            F.sum(dec("x")).alias("sx"),
            F.sum(dec("y")).alias("sy"),
        )
        .select("i", "j", F.round(cov * 1e9).cast("bigint").alias("cov_n"))
        # 64 rows; truncate so each round doesn't replay the scan
        .localCheckpoint(eager=True)
    )
    # r11 NOTE — fused iteration tail tested and REJECTED (guide
    # §1.1): pivoting the 64-row matrix into one wide row and
    # unrolling all three rounds as projections over it (zero joins /
    # shuffles / checkpoint after the moment agg) was implemented three
    # ways (chained wide selects; trimmed-column selects; one select
    # per round with the norm inlined) and measured 0.79× / 0.63× /
    # 0.44× interleaved vs this form, values equal every time: PySpark
    # runs the ANALYZER eagerly on every Dataset construction, so the
    # deep wide projections cost 4.8-7 s of driver-side plan building
    # against the ~1-2 s of execution they save (phase split in
    # OPTIMIZATION_r11.md; the r10 wide-agg rejection was the same
    # lesson one stage earlier). The per-round join/agg tail below
    # stays; the expr-string cell build above is where the real
    # driver-side win was.
    v = spark.range(_PCA_DIMS).select(
        F.col("id").alias("j"), F.lit(10**9).cast("bigint").alias("vn")
    )
    norm_expr = None
    for _ in range(_PCA_ROUNDS):
        u = (
            m.join(v, "j")
            .groupBy("i")
            .agg(F.sum(dec("cov_n") * F.col("vn")).alias("u"))
        )
        one = u.groupBy().agg(
            *[
                F.max(F.when(F.col("i") == k, F.col("u").cast("double"))).alias(f"u{k}")
                for k in range(_PCA_DIMS)
            ]
        )
        # left-associated sum of squares — identical association order
        # in the SQL twin, so the double norm is bit-identical
        sq = F.col("u0") * F.col("u0")
        for k in range(1, _PCA_DIMS):
            sq = sq + F.col(f"u{k}") * F.col(f"u{k}")
        one = one.withColumn("norm", F.sqrt(sq))
        norm_expr = one.select("norm")
        v = one.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(k).cast("bigint").alias("j"),
                            F.round(F.lit(1e9) * F.col(f"u{k}") / F.col("norm"))
                            .cast("bigint")
                            .alias("vn"),
                        )
                        for k in range(_PCA_DIMS)
                    ]
                )
            ).alias("s")
        ).select("s.j", "s.vn")
    # λ = ‖S_n·v_n‖ / 1e18 (cov in 1e-9 units × v in 1e-9 units)
    lam = norm_expr.select(F.round(F.col("norm") / 1e18, 6).alias("lambda1"))
    return (
        v.crossJoin(F.broadcast(lam))
        .select(
            F.col("j").alias("i"),
            F.round(F.col("vn") / 1e9, 6).alias("v"),
            "lambda1",
        )
        .orderBy("i")
    )


def _pca_round(r: int) -> str:
    us = " + ".join(f"u{r}_{k} * u{r}_{k}" for k in range(_PCA_DIMS))
    ucols = ", ".join(
        f"MAX(CASE WHEN i = {k} THEN CAST(u AS DOUBLE) END) AS u{r}_{k}"
        for k in range(_PCA_DIMS)
    )
    vrows = ", ".join(
        f"({k}, CAST(ROUND(1e9 * u{r}_{k} / norm{r}) AS BIGINT))"
        for k in range(_PCA_DIMS)
    )
    return f"""
u{r} AS (
  SELECT m.i, CAST(SUM(m.cov_n * v{r}.vn) AS HUGEINT) AS u
  FROM m JOIN v{r} ON m.j = v{r}.j GROUP BY m.i
),
one{r} AS (SELECT {ucols} FROM u{r}),
n{r} AS (SELECT *, SQRT({us}) AS norm{r} FROM one{r}),
v{r + 1} AS (
  SELECT j, vn FROM n{r},
  LATERAL (VALUES {vrows}) t(j, vn)
)"""


_EMB_PCA_SQL = (
    """
WITH e AS (
  SELECT [CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT) for x in embedding] AS e
  FROM embeddings
),
ex AS (
  SELECT i, j, e[i + 1] * e[j + 1] AS xy, e[i + 1] AS x, e[j + 1] AS y
  FROM e, (SELECT unnest(range(8)) AS i), (SELECT unnest(range(8)) AS j)
),
m AS (
  SELECT i, j,
         CAST(ROUND((
           (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(xy) AS DOUBLE)
            - CAST(SUM(x) AS DOUBLE) * CAST(SUM(y) AS DOUBLE))
           / (CAST(COUNT(*) AS DOUBLE) * CAST(COUNT(*) AS DOUBLE)) / 1e12
         ) * 1e9) AS BIGINT) AS cov_n
  FROM ex GROUP BY i, j
),
v0 AS (SELECT unnest(range(8))::BIGINT AS j, CAST(1000000000 AS BIGINT) AS vn),"""
    + ",".join(_pca_round(r) for r in range(_PCA_ROUNDS))
    + f"""
SELECT v{_PCA_ROUNDS}.j AS i,
       ROUND(v{_PCA_ROUNDS}.vn / 1e9, 6) AS v,
       ROUND(n{_PCA_ROUNDS - 1}.norm{_PCA_ROUNDS - 1} / 1e18, 6) AS lambda1
FROM v{_PCA_ROUNDS}, n{_PCA_ROUNDS - 1}
"""
)


QUERIES = {
    "fe_quantile_bins": fe_quantile_bins,
    "fe_target_encode": fe_target_encode,
    "fe_hashed_features": fe_hashed_features,
    "ev_step_latency": ev_step_latency,
    "emb_pca_power": emb_pca_power,
}

ORACLES = {
    "fe_quantile_bins": _FE_QB_SQL,
    "fe_target_encode": _FE_TE_SQL,
    "fe_hashed_features": _FE_FH_SQL,
    "ev_step_latency": _EV_STEP_SQL,
    "emb_pca_power": _EMB_PCA_SQL,
}
