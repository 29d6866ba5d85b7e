"""Round-3 wave 5: privacy depth (l-diversity), asymmetric
containment dedup, vector quantization (PQ codebook + Lloyd
assignment), a Simpson's-paradox screen, and a watermark lateness
audit — the second tranche of this session's monitoring/curation
layer (wave4.py holds the first).

Same determinism contract as every oracle-checked module: exact
integer state everywhere a cross-row sum exists; doubles only as
single final expressions or after both engines agree on the integer
inputs. Embedding distances ride on 1e6-snapped integer components,
whose squared-distance sums stay below 2^53 — integer-exact even
when an engine carries them as doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.functions import scalar as SC
from movie_data_etl_pipeline_spark.operators import stats
from movie_data_etl_pipeline_spark.sources import load_table


# ---------------------------------------------------------------------------
# ag_simpsons — Simpson's-paradox screen: per-segment vs pooled trend
# ---------------------------------------------------------------------------


def ag_simpsons(spark: SparkSession, sf: str) -> DataFrame:
    """Simpson's-paradox screen: the order-value time trend per
    customer market segment vs the pooled trend, flagging segments
    whose slope sign disagrees with the aggregate — the classic
    aggregation trap an analytics engine should surface, not hide.

    Both fits ride `stats.ols_by_group`'s exact integer moment sums
    (bit-identical at any parallelism); the reversal flag compares
    the ROUNDED slopes so both engines decide from identical doubles.
    """
    o = load_table(spark, sf, "orders").select(
        "o_custkey",
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("bigint")
        .alias("x"),
        SC.cents("o_totalprice").alias("y"),
    )
    c = load_table(spark, sf, "customer").select("c_custkey", "c_mktsegment")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        "c_mktsegment", "x", "y"
    )
    per = stats.ols_by_group(j, ["c_mktsegment"], "x", "y").select(
        "c_mktsegment", "n", F.col("slope").alias("slope_seg")
    )
    pooled = (
        stats.ols_by_group(j.withColumn("__all", F.lit(1)), ["__all"], "x", "y")
        .select(F.col("slope").alias("slope_all"))
    )
    return (
        per.crossJoin(F.broadcast(pooled))
        .select(
            F.col("c_mktsegment").alias("segment"),
            "n",
            "slope_seg",
            "slope_all",
            (F.col("slope_seg") * F.col("slope_all") < 0).alias("reversed"),
        )
        .orderBy("segment")
    )


_OLS_MOMENTS = """
  SELECT {key} AS k, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
         CAST(SUM(x * x) AS HUGEINT) AS sxx, CAST(SUM(x * y) AS HUGEINT) AS sxy
  FROM j GROUP BY 1
"""

_OLS_SLOPE = """
  CASE WHEN CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE) <> 0 THEN
    ROUND(CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS DOUBLE)
          / CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE), 6) END
"""

AG_SIMPSONS_SQL = f"""
WITH j AS (
  SELECT c_mktsegment,
         CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS y
  FROM orders JOIN customer ON o_custkey = c_custkey
),
per AS (SELECT k, n, {_OLS_SLOPE} AS slope_seg FROM ({_OLS_MOMENTS.format(key="c_mktsegment")}) t),
pooled AS (SELECT {_OLS_SLOPE} AS slope_all FROM ({_OLS_MOMENTS.format(key="1")}) t)
SELECT k AS segment, n, slope_seg, slope_all,
       slope_seg * slope_all < 0 AS reversed
FROM per CROSS JOIN pooled
ORDER BY segment
"""


# ---------------------------------------------------------------------------
# qa_l_diversity — sensitive-attribute diversity inside anonymity groups
# ---------------------------------------------------------------------------

_L_DIVERSITY_L = 3


def qa_l_diversity(spark: SparkSession, sf: str) -> DataFrame:
    """l-diversity release gate (companion to `qa_k_anonymity`): a
    group can be k-anonymous yet leak its sensitive attribute if all
    members share one value. Quasi-identifiers (nation, segment);
    sensitive attribute = account-balance band (1000-currency-unit
    buckets of exact cents). One summary row: groups, min distinct
    sensitive values, violating groups (< l=3), rows at risk.

    Two aggregates over one scan; group grain is quasi-identifier
    combinations — metadata-sized at any corpus scale."""
    c = load_table(spark, sf, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(SC.cents("c_acctbal").cast("double") / F.lit(100000.0))
        .cast("bigint")
        .alias("band"),
    )
    g = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("band").alias("l_val"),
    )
    return g.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.min("l_val").cast("bigint").alias("min_l"),
        F.sum((F.col("l_val") < _L_DIVERSITY_L).cast("int"))
        .cast("bigint")
        .alias("violating_groups"),
        F.sum(
            F.when(F.col("l_val") < _L_DIVERSITY_L, F.col("n_rows")).otherwise(0)
        )
        .cast("bigint")
        .alias("rows_at_risk"),
    )


QA_LDIV_SQL = f"""
WITH c AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(FLOOR(CAST(CAST(ROUND(c_acctbal * 100) AS BIGINT) AS DOUBLE) / 100000.0) AS BIGINT) AS band
  FROM customer
),
g AS (
  SELECT c_nationkey, c_mktsegment, COUNT(*) AS n_rows, COUNT(DISTINCT band) AS l_val
  FROM c GROUP BY 1, 2
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(MIN(l_val) AS BIGINT) AS min_l,
       CAST(SUM(CASE WHEN l_val < {_L_DIVERSITY_L} THEN 1 ELSE 0 END) AS BIGINT) AS violating_groups,
       CAST(SUM(CASE WHEN l_val < {_L_DIVERSITY_L} THEN n_rows ELSE 0 END) AS BIGINT) AS rows_at_risk
FROM g
"""


# ---------------------------------------------------------------------------
# dd_containment — asymmetric shingle containment (subset-duplicate detector)
# ---------------------------------------------------------------------------

_CONT_THRESHOLD = 0.6


def dd_containment(spark: SparkSession, sf: str) -> DataFrame:
    """Asymmetric containment |A∩B|/|A| over 3-shingle sets — the
    subset-duplicate detector Jaccard misses (a chunk quoted inside a
    longer doc scores low Jaccard but high containment; the
    deduplicating-training-data literature treats these as dups).

    Candidate discipline (round 7 — VERDICT-r6 ask #4): PPJoin-style
    prefix + positional filtering adapted to the containment
    predicate, ``operators.dedup.containment_pairs`` — "containment ≥
    t in either direction" is overlap ≥ t·min(|A|,|B|), which admits
    a prefix filter on the min side (rare-first order), so the
    candidate join is prefix × postings instead of the full posting
    self-join; candidates then verify exactly. Output is bit-identical
    to the naive all-shared-shingles join (the prefix bound guarantees
    no false negatives), so the oracle below is unchanged.

    The shingle sets come from the family-shared cached build
    (``plans/doc_pairs.xxh_shingle_sets``) — hashed shingles, so the
    posting join runs on fixed-width longs; shared counts (and
    therefore every containment ratio) are unchanged (the same
    ~1e-13-collision argument as ``dedup._shingle_sets``)."""
    from movie_data_etl_pipeline_spark.operators.dedup import containment_pairs
    from movie_data_etl_pipeline_spark.plans.doc_pairs import xxh_shingle_sets

    pairs = containment_pairs(
        None, threshold=_CONT_THRESHOLD, sh=xxh_shingle_sets(spark, sf)
    )
    return pairs.select(
        "a_id",
        "b_id",
        "n_shared",
        F.round(F.col("n_shared").cast("double") / F.col("na").cast("double"), 6).alias(
            "cont_a_in_b"
        ),
        F.round(F.col("n_shared").cast("double") / F.col("nb").cast("double"), 6).alias(
            "cont_b_in_a"
        ),
    ).orderBy("a_id", "b_id")


DD_CONTAINMENT_SQL = """
WITH toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
  FROM documents
),
sh AS (
  SELECT doc_id,
         list_distinct([array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]) AS shingles
  FROM toks WHERE len(t) >= 3
),
sizes AS (SELECT doc_id, len(shingles) AS n_sh FROM sh),
ex AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
shared AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS n_shared
  FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT a_id, b_id, CAST(n_shared AS BIGINT) AS n_shared,
       ROUND(CAST(n_shared AS DOUBLE) / CAST(sa.n_sh AS DOUBLE), 6) AS cont_a_in_b,
       ROUND(CAST(n_shared AS DOUBLE) / CAST(sb.n_sh AS DOUBLE), 6) AS cont_b_in_a
FROM shared
JOIN sizes sa ON sa.doc_id = a_id
JOIN sizes sb ON sb.doc_id = b_id
WHERE n_shared * 10 >= sa.n_sh * 6 OR n_shared * 10 >= sb.n_sh * 6
ORDER BY a_id, b_id
"""


# ---------------------------------------------------------------------------
# vector quantization: shared integer-snapped distance machinery
# ---------------------------------------------------------------------------


def _snap(col) -> F.Column:  # embedding -> array<bigint> in 1e-6 units
    return F.transform(col, lambda x: F.round(x.cast("double") * 1e6).cast("bigint"))


def _d2(a, b) -> F.Column:  # exact squared L2 between snapped arrays
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )


# ---------------------------------------------------------------------------
# emb_pq_codebook — product-quantization assignment audit (2 × 4 codebook)
# ---------------------------------------------------------------------------


def emb_pq_codebook(spark: SparkSession, sf: str) -> DataFrame:
    """Product-quantization audit: embeddings split into two 32-dim
    subspaces, each assigned to its nearest of 4 seed centroids
    (vectors vec_id 0–3 — a deterministic stand-in for a trained
    codebook, as the IVF operator uses sampled seeds). Output is the
    code-cell histogram with the exact quantization error — the
    codebook-balance / reconstruction-loss readout an ANN index build
    emits.

    Components are snapped to 1e-6 integer units BEFORE any distance;
    squared-distance sums stay < 2^53, so both engines carry exact
    integers end-to-end. Assignment is a broadcast join against the
    4-row codebook — no shuffle of the corpus."""
    emb = load_table(spark, sf, "embeddings").select(
        "vec_id", _snap(F.col("embedding")).alias("e")
    )
    lo = F.slice(F.col("e"), 1, 32)
    hi = F.slice(F.col("e"), 33, 32)
    vecs = emb.select("vec_id", lo.alias("lo"), hi.alias("hi"))
    seeds = (
        emb.filter(F.col("vec_id") < 4)
        .select(
            F.col("vec_id").alias("seed_id"),
            lo.alias("slo"),
            hi.alias("shi"),
        )
    )
    cand = vecs.crossJoin(F.broadcast(seeds)).select(
        "vec_id",
        "seed_id",
        _d2(F.col("lo"), F.col("slo")).alias("d2_lo"),
        _d2(F.col("hi"), F.col("shi")).alias("d2_hi"),
    )
    w_lo = Window.partitionBy("vec_id").orderBy("d2_lo", "seed_id")
    w_hi = Window.partitionBy("vec_id").orderBy("d2_hi", "seed_id")
    best = (
        cand.withColumn("r_lo", F.row_number().over(w_lo))
        .withColumn("r_hi", F.row_number().over(w_hi))
    )
    lo_pick = best.filter(F.col("r_lo") == 1).select(
        "vec_id", F.col("seed_id").alias("code_lo"), F.col("d2_lo").alias("err_lo")
    )
    hi_pick = best.filter(F.col("r_hi") == 1).select(
        "vec_id", F.col("seed_id").alias("code_hi"), F.col("d2_hi").alias("err_hi")
    )
    assigned = lo_pick.join(hi_pick, "vec_id")
    return (
        assigned.groupBy("code_lo", "code_hi")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
            F.sum(F.col("err_lo") + F.col("err_hi")).cast("bigint").alias("sq_err_int"),
        )
        .orderBy("code_lo", "code_hi")
    )


_SNAP_SQL = "list_transform({col}, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1e6) AS BIGINT))"
# d2 via the dot identity on integer-exact doubles (< 2^53): list_dot_product
# of BIGINT lists is computed in doubles but every value is integer-exact.
_D2_SQL = (
    "CAST(list_dot_product({a}, {a}) - 2 * list_dot_product({a}, {b})"
    " + list_dot_product({b}, {b}) AS BIGINT)"
)

EMB_PQ_SQL = f"""
WITH e AS (
  SELECT vec_id, {_SNAP_SQL.format(col="embedding")} AS s FROM embeddings
),
v AS (SELECT vec_id, s[1:32] AS lo, s[33:64] AS hi FROM e),
seeds AS (SELECT vec_id AS seed_id, lo AS slo, hi AS shi FROM v WHERE vec_id < 4),
cand AS (
  SELECT v.vec_id, seed_id,
         {_D2_SQL.format(a="lo", b="slo")} AS d2_lo,
         {_D2_SQL.format(a="hi", b="shi")} AS d2_hi
  FROM v CROSS JOIN seeds
),
best AS (
  SELECT vec_id, seed_id, d2_lo, d2_hi,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2_lo, seed_id) AS r_lo,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2_hi, seed_id) AS r_hi
  FROM cand
),
lo_pick AS (SELECT vec_id, seed_id AS code_lo, d2_lo AS err_lo FROM best WHERE r_lo = 1),
hi_pick AS (SELECT vec_id, seed_id AS code_hi, d2_hi AS err_hi FROM best WHERE r_hi = 1)
SELECT code_lo, code_hi, CAST(COUNT(*) AS BIGINT) AS n_vectors,
       CAST(SUM(err_lo + err_hi) AS BIGINT) AS sq_err_int
FROM lo_pick JOIN hi_pick USING (vec_id)
GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# sim_kmeans_assign — one Lloyd assignment step with the exact SSE objective
# ---------------------------------------------------------------------------


def sim_kmeans_assign(spark: SparkSession, sf: str) -> DataFrame:
    """One k-means (Lloyd) ASSIGNMENT step, hash-checked: every vector
    to its nearest of 8 seed centroids (vec_id 0–7) with the exact SSE
    objective per cluster — the per-iteration readout of the IVF
    quantizer fit (`similarity.py` trains the same loop with sampled
    seeds; this pins one iteration's semantics to an oracle).

    Distances on 1e-6-snapped integer components (< 2^53, engine-
    exact); broadcast 8-row codebook, one corpus scan, cluster-grain
    output."""
    emb = load_table(spark, sf, "embeddings").select(
        "vec_id", _snap(F.col("embedding")).alias("e")
    )
    seeds = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("seed_id"), F.col("e").alias("se")
    )
    cand = emb.crossJoin(F.broadcast(seeds)).select(
        "vec_id", "seed_id", _d2(F.col("e"), F.col("se")).alias("d2")
    )
    w = Window.partitionBy("vec_id").orderBy("d2", "seed_id")
    best = cand.withColumn("r", F.row_number().over(w)).filter(F.col("r") == 1)
    return (
        best.groupBy(F.col("seed_id").alias("cluster"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_assigned"),
            F.sum("d2").cast("bigint").alias("sse_int"),
        )
        .withColumn(
            "mean_err",
            F.round(
                F.col("sse_int").cast("double")
                / F.col("n_assigned").cast("double")
                / F.lit(1e12),
                6,
            ),
        )
        .orderBy("cluster")
    )


SIM_KMEANS_SQL = f"""
WITH e AS (
  SELECT vec_id, {_SNAP_SQL.format(col="embedding")} AS s FROM embeddings
),
seeds AS (SELECT vec_id AS seed_id, s AS se FROM e WHERE vec_id < 8),
cand AS (
  SELECT e.vec_id, seed_id, {_D2_SQL.format(a="s", b="se")} AS d2
  FROM e CROSS JOIN seeds
),
best AS (
  SELECT vec_id, seed_id, d2,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, seed_id) AS r
  FROM cand
)
SELECT seed_id AS cluster, CAST(COUNT(*) AS BIGINT) AS n_assigned,
       CAST(SUM(d2) AS BIGINT) AS sse_int,
       ROUND(CAST(SUM(d2) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 1e12, 6) AS mean_err
FROM best WHERE r = 1
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# st_late_audit — watermark lateness accounting over the event stream
# ---------------------------------------------------------------------------


def st_late_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Watermark sizing audit: how late does each event arrive behind
    the per-user event-time high-water mark (arrival order =
    event_id, the table's ingest sequence)? Buckets: on-time, within
    a 1-hour watermark, and would-be-dropped (>1h late) — the
    empirical basis for choosing `withWatermark` before turning on
    the streaming pipeline.

    Lateness is an integer epoch-second difference under one per-user
    running max — key-partitioned window, no global sort."""
    ev = load_table(spark, sf, "events").select(
        "user_id", "event_id", "event_type", F.col("ts").cast("long").alias("sec")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    late = ev.withColumn("hwm", F.max("sec").over(w)).withColumn(
        "late_s", F.col("hwm") - F.col("sec")
    )
    bucket = (
        F.when(F.col("late_s") == 0, "0_on_time")
        .when(F.col("late_s") <= 3600, "1_within_1h")
        .otherwise("2_dropped")
    )
    return (
        late.groupBy("event_type", bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.max("late_s").cast("bigint").alias("max_late_s"),
        )
        .orderBy("event_type", "bucket")
    )


ST_LATE_SQL = """
WITH ev AS (
  SELECT user_id, event_id, event_type, CAST(epoch(ts) AS BIGINT) AS sec FROM events
),
late AS (
  SELECT event_type,
         MAX(sec) OVER (PARTITION BY user_id ORDER BY event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - sec AS late_s
  FROM ev
)
SELECT event_type,
       CASE WHEN late_s = 0 THEN '0_on_time'
            WHEN late_s <= 3600 THEN '1_within_1h'
            ELSE '2_dropped' END AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MAX(late_s) AS BIGINT) AS max_late_s
FROM late GROUP BY 1, 2 ORDER BY 1, 2
"""


QUERIES = {
    "ag_simpsons": ag_simpsons,
    "qa_l_diversity": qa_l_diversity,
    "dd_containment": dd_containment,
    "emb_pq_codebook": emb_pq_codebook,
    "sim_kmeans_assign": sim_kmeans_assign,
    "st_late_audit": st_late_audit,
}

ORACLES = {
    "ag_simpsons": AG_SIMPSONS_SQL,
    "qa_l_diversity": QA_LDIV_SQL,
    "dd_containment": DD_CONTAINMENT_SQL,
    "emb_pq_codebook": EMB_PQ_SQL,
    "sim_kmeans_assign": SIM_KMEANS_SQL,
    "st_late_audit": ST_LATE_SQL,
}
