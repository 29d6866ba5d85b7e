"""Round-4 wave 23: winnowing fingerprints (the MOSS document-match
primitive), MATCH_RECOGNIZE-lite event-sequence patterns, community
modularity scoring, and deterministic differential-privacy noised
counts.

Determinism contract unchanged: integers end-to-end where possible,
one double expression written with identical association in both
engines otherwise, every hash from ``functions.portable_hash``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.functions import portable_hash as ph
from movie_data_etl_pipeline_spark.operators import graph
from movie_data_etl_pipeline_spark.plans import _hints
from movie_data_etl_pipeline_spark.sources import load_table


# ---------------------------------------------------------------------------
# tx_winnowing — MOSS winnowing fingerprint matches
# ---------------------------------------------------------------------------


def tx_winnowing(spark: SparkSession, sf: str) -> DataFrame:
    """Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken, the
    MOSS algorithm): hash every token 3-gram POSITIONALLY, slide a
    window of 4 consecutive hashes, keep each window's minimum — the
    guarantee is that any shared run of ≥ 6 tokens between two
    documents shares at least one selected fingerprint, at ~1/4 the
    posting volume of full shingling. Distinct from ``tx_fingerprints``
    (one whole-doc hash) and MinHash (set-similarity estimate): this
    finds LOCAL matching regions, the plagiarism/citation-detection
    primitive.

    All per-doc work is row-local array arithmetic (zip_with window
    minima — no HOF-outer-reference re-evaluation, see
    ``functions.text.shingles``); cross-doc matching is a posting-list
    equi-join with a document-frequency cut (df ≤ 50) exactly like
    ``dd_containment``, so candidate volume is bounded by posting-list
    sizes, never all-pairs. Output: document pairs sharing ≥ 2
    winnowed fingerprints.

    The positional shingle-hash base comes from the family-shared
    cached build (``plans/doc_pairs.portable_shingle_arrays``); its
    eager localCheckpoint doubles as the materialization barrier that
    stops CollapseProject inlining the O(chars)-per-shingle hash
    transform into every downstream reference of ``h`` (4 slices + 2
    sizes — measured 23 s vs 3 s at sf0.1 before the barrier)."""
    from movie_data_etl_pipeline_spark.plans.doc_pairs import portable_shingle_arrays

    d = portable_shingle_arrays(spark, sf).filter(F.size("h") >= 4)
    # window-of-4 minima via 3 zip_with folds over shifted slices
    # (each shift drops the trailing incomplete windows as nulls)
    m = F.col("h")
    for i in range(1, 4):
        shifted = F.slice(
            F.col("h"), i + 1, F.greatest(F.size("h") - i, F.lit(0))
        )
        m = F.zip_with(
            m,
            shifted,
            lambda a, b: F.when(
                a.isNull() | b.isNull(), F.lit(None).cast("bigint")
            ).otherwise(F.least(a, b)),
        )
    fps = d.select(
        "id", F.array_distinct(F.filter(m, lambda x: x.isNotNull())).alias("fp")
    )
    posting = fps.select("id", F.explode("fp").alias("f"))
    df_ok = (
        posting.groupBy("f")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= 50)
        .select("f")
    )
    p = posting.join(df_ok, "f")
    return (
        p.alias("a")
        .join(
            p.alias("b"),
            (F.col("a.f") == F.col("b.f")) & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
        .orderBy("a_id", "b_id")
    )


_TX_WINNOW_SQL = rf"""
WITH toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
  FROM documents
),
hs AS (
  SELECT doc_id AS id,
         [{ph.sql_str_hash("array_to_string(t[i:i+2], ' ')")} for i in range(1, len(t) - 1)] AS h
  FROM toks WHERE len(t) >= 6
),
fps AS (
  SELECT id,
         list_distinct([list_min(h[i:i+3]) for i in range(1, len(h) - 2)]) AS fp
  FROM hs WHERE len(h) >= 4
),
posting AS (SELECT id, unnest(fp) AS f FROM fps),
df_ok AS (SELECT f FROM posting GROUP BY f HAVING COUNT(*) <= 50),
p AS (SELECT posting.id, posting.f FROM posting JOIN df_ok USING (f))
SELECT a.id AS a_id, b.id AS b_id, COUNT(*)::BIGINT AS n_shared
FROM p a JOIN p b ON a.f = b.f AND a.id < b.id
GROUP BY 1, 2 HAVING COUNT(*) >= 2
ORDER BY a_id, b_id
"""


# ---------------------------------------------------------------------------
# ev_pattern_match — MATCH_RECOGNIZE-lite sequence patterns
# ---------------------------------------------------------------------------

_EV_PATTERNS = [
    ("view_to_purchase", "V+P"),
    ("error_burst", "EE+"),
    ("signup_then_buy", "SV*P"),
]


def ev_pattern_match(spark: SparkSession, sf: str) -> DataFrame:
    """Regex over per-user event-type sequences — the
    ``MATCH_RECOGNIZE`` capability Spark SQL lacks, expressed as
    (sort-within-group → opcode string → ``regexp_count``): each
    user's events collapse to one string of single-char opcodes
    (Click/Error/Purchase/Signup/View initials are distinct in this
    corpus), ordered by (ts, event_id) for a deterministic sequence,
    and each pattern counts its non-overlapping matches. One shuffle
    to the user grain; the regex scan is row-local JVM codegen.
    Output per pattern: users with ≥1 match and total match count."""
    ev = load_table(spark, sf, "events").select(
        "user_id",
        F.struct("ts", "event_id", F.upper(F.substring("event_type", 1, 1)).alias("op")).alias("e"),
    )
    seqs = ev.groupBy("user_id").agg(
        F.concat_ws(
            "", F.transform(F.array_sort(F.collect_list("e")), lambda x: x["op"])
        ).alias("s")
    )
    per_pat = F.array(
        *[
            F.struct(
                F.lit(name).alias("pattern"),
                F.regexp_count("s", F.lit(rx)).alias("n"),
            )
            for name, rx in _EV_PATTERNS
        ]
    )
    return (
        seqs.select(F.explode(per_pat).alias("x"))
        .select("x.pattern", "x.n")
        .groupBy("pattern")
        .agg(
            F.sum((F.col("n") > 0).cast("bigint")).cast("bigint").alias("n_users"),
            F.sum("n").cast("bigint").alias("n_matches"),
        )
        .orderBy("pattern")
    )


_EV_PATTERN_SQL = """
WITH seqs AS (
  SELECT user_id,
         string_agg(upper(substr(event_type, 1, 1)), '' ORDER BY ts, event_id) AS s
  FROM events GROUP BY user_id
),
counts AS (
  SELECT 'view_to_purchase' AS pattern, len(regexp_extract_all(s, 'V+P')) AS n FROM seqs
  UNION ALL
  SELECT 'error_burst', len(regexp_extract_all(s, 'EE+')) FROM seqs
  UNION ALL
  SELECT 'signup_then_buy', len(regexp_extract_all(s, 'SV*P')) FROM seqs
)
SELECT pattern,
       CAST(SUM(CASE WHEN n > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_users,
       CAST(SUM(n) AS BIGINT) AS n_matches
FROM counts GROUP BY pattern ORDER BY pattern
"""


# ---------------------------------------------------------------------------
# gr_modularity — community quality of the label-prop partition
# ---------------------------------------------------------------------------


def gr_modularity(spark: SparkSession, sf: str) -> DataFrame:
    """Newman modularity of the ``gr_label_prop`` partition on the
    customer↔supplier co-transaction graph — the quality score that
    says whether the propagated communities are real structure or
    noise: per community ``c``, contribution ``e_c/m − (d_c/2m)²``
    (fraction of edges inside ``c`` minus the fraction a random
    degree-preserving graph would put there). Everything is integer
    (edge counts, degree sums) until one final double expression per
    row, written with identical association in both engines. The
    total modularity is Σ of the per-community rows."""
    from movie_data_etl_pipeline_spark.plans.graph_edges import (
        cotx_labels,
        cotx_node_pairs,
    )

    edges_cs = cotx_node_pairs(spark, sf)
    # family-shared cached label-propagation fixed point (also feeds
    # gr_label_prop and gr_conductance)
    lab = cotx_labels(spark, sf).filter(F.col("label").isNotNull())
    # node/dimension-grain bound: `lab` is one row per labeled graph
    # node (customers+suppliers — dimension keys, not fact rows), the
    # same size class as the engine's static dimension broadcasts.
    # Pins the broadcast the r8 AQE flip-off removed (VERDICT-r8 #5).
    e = (
        edges_cs.join(
            _hints.bounded_broadcast(
                lab.select(F.col("node").alias("c_node"), F.col("label").alias("la"))
            ),
            "c_node",
        )
        .join(
            _hints.bounded_broadcast(
                lab.select(F.col("node").alias("s_node"), F.col("label").alias("lb"))
            ),
            "s_node",
        )
        .select("la", "lb")
    )
    m = e.agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    e_within = (
        e.filter(F.col("la") == F.col("lb"))
        .groupBy(F.col("la").alias("label"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("e_c"))
    )
    deg = (
        e.select(F.col("la").alias("label"))
        .unionAll(e.select(F.col("lb").alias("label")))
        .groupBy("label")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d_c"))
    )
    n_nodes = lab.groupBy("label").agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    return (
        n_nodes.join(deg, "label", "left")
        .join(e_within, "label", "left")
        .crossJoin(F.broadcast(m))
        .select(
            "label",
            "n_nodes",
            F.coalesce("e_c", F.lit(0)).cast("bigint").alias("e_c"),
            F.coalesce("d_c", F.lit(0)).cast("bigint").alias("d_c"),
            F.round(
                F.coalesce("e_c", F.lit(0)).cast("double") / F.col("m")
                - (F.coalesce("d_c", F.lit(0)).cast("double") / (F.lit(2) * F.col("m")))
                * (F.coalesce("d_c", F.lit(0)).cast("double") / (F.lit(2) * F.col("m"))),
                6,
            ).alias("q_contrib"),
        )
        .orderBy("label")
    )


def _lp_round_sql(prev: str, out: str) -> str:
    # identical round construction to fixture_queries._lp_round_sql;
    # duplicated here to keep the wave self-contained
    return f"""
v_{out} AS (
  SELECT sym.src, l.label AS nl, COUNT(*)::BIGINT AS cnt
  FROM sym JOIN {prev} l ON l.node = sym.dst AND l.label IS NOT NULL
  GROUP BY 1, 2
),
b_{out} AS (
  SELECT src AS node, nl AS best FROM (
    SELECT src, nl, row_number() OVER (PARTITION BY src ORDER BY cnt DESC, nl ASC) AS rn
    FROM v_{out}
  ) WHERE rn = 1
),
{out} AS (
  SELECT n.node, COALESCE(s.label, b.best, p.label) AS label
  FROM nodes n
  LEFT JOIN seeds s USING (node)
  LEFT JOIN b_{out} b USING (node)
  LEFT JOIN {prev} p USING (node)
)"""


_GR_MODULARITY_SQL = f"""
WITH pairs AS (
  SELECT DISTINCT o_custkey * 2 AS c_node, l_suppkey * 2 + 1 AS s_node
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
sym AS (
  SELECT c_node AS src, s_node AS dst FROM pairs
  UNION ALL
  SELECT s_node AS src, c_node AS dst FROM pairs
),
nodes AS (SELECT DISTINCT src AS node FROM sym),
seeds AS (
  SELECT c_custkey * 2 AS node, c_mktsegment AS label
  FROM customer WHERE c_custkey % 4 = 0
),
l0 AS (SELECT n.node, s.label FROM nodes n LEFT JOIN seeds s USING (node)),
{_lp_round_sql('l0', 'l1')},
{_lp_round_sql('l1', 'l2')},
{_lp_round_sql('l2', 'l3')},
lab AS (SELECT node, label FROM l3 WHERE label IS NOT NULL),
e AS (
  SELECT ca.label AS la, sa.label AS lb
  FROM pairs
  JOIN lab ca ON ca.node = pairs.c_node
  JOIN lab sa ON sa.node = pairs.s_node
),
mm AS (SELECT COUNT(*)::BIGINT AS m FROM e),
ew AS (SELECT la AS label, COUNT(*)::BIGINT AS e_c FROM e WHERE la = lb GROUP BY 1),
deg AS (
  SELECT label, COUNT(*)::BIGINT AS d_c FROM (
    SELECT la AS label FROM e UNION ALL SELECT lb AS label FROM e
  ) GROUP BY 1
),
nn AS (SELECT label, COUNT(*)::BIGINT AS n_nodes FROM lab GROUP BY 1)
SELECT nn.label, nn.n_nodes,
       COALESCE(ew.e_c, 0)::BIGINT AS e_c,
       COALESCE(deg.d_c, 0)::BIGINT AS d_c,
       ROUND(CAST(COALESCE(ew.e_c, 0) AS DOUBLE) / mm.m
             - (CAST(COALESCE(deg.d_c, 0) AS DOUBLE) / (2 * mm.m))
             * (CAST(COALESCE(deg.d_c, 0) AS DOUBLE) / (2 * mm.m)), 6) AS q_contrib
FROM nn LEFT JOIN deg USING (label) LEFT JOIN ew USING (label) CROSS JOIN mm
ORDER BY label
"""


# ---------------------------------------------------------------------------
# qa_dp_counts — deterministic differential-privacy noised counts
# ---------------------------------------------------------------------------

_DP_SEED = 42
_DP_B = 1.0  # Laplace scale = sensitivity/epsilon = 1/1.0


def qa_dp_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Differentially-private release of the customers-per-nation
    histogram via the Laplace mechanism (sensitivity 1, ε = 1 ⇒ scale
    b = 1), with the noise drawn DETERMINISTICALLY from the
    engine-portable hash: u = (mix(key·1000003 + seed) + 0.5)/P is
    uniform on (0,1), and −b·sign(u−½)·ln(1−2|u−½|) is the exact
    inverse-CDF Laplace draw. Seeded noise is how a production DP
    release makes the mechanism auditable/replayable (the seed is the
    secret); here it also makes the mechanism ORACLE-CHECKABLE — both
    engines compute the identical draw. The one ln() is computed on a
    small-magnitude argument and rounded at 3 decimals, far inside
    cross-libm agreement."""
    cust = load_table(spark, sf, "customer")
    g = cust.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    mx = ph.mix(F.col("nationkey") * F.lit(1_000_003) + F.lit(_DP_SEED))
    u = (mx.cast("double") + F.lit(0.5)) / F.lit(float(ph.P))
    uc = u - F.lit(0.5)
    noise = F.lit(-_DP_B) * F.signum(uc) * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(uc))
    return (
        g.select(
            F.col("nationkey").cast("bigint").alias("nationkey"),
            F.round(F.col("n").cast("double") + noise, 3).alias("noisy_n"),
        )
        .orderBy("nationkey")
    )


_QA_DP_SQL = f"""
WITH g AS (
  SELECT c_nationkey AS nationkey, COUNT(*)::BIGINT AS n
  FROM customer GROUP BY 1
),
h AS (
  SELECT nationkey, n,
         (CAST({ph.sql_mix(f"nationkey * 1000003 + {_DP_SEED}")} AS DOUBLE) + 0.5)
           / {float(ph.P)} - 0.5 AS uc
  FROM g
)
SELECT CAST(nationkey AS BIGINT) AS nationkey,
       ROUND(CAST(n AS DOUBLE)
             + (-{_DP_B}) * sign(uc) * ln(1.0 - 2.0 * abs(uc)), 3) AS noisy_n
FROM h ORDER BY nationkey
"""


QUERIES = {
    "tx_winnowing": tx_winnowing,
    "ev_pattern_match": ev_pattern_match,
    "gr_modularity": gr_modularity,
    "qa_dp_counts": qa_dp_counts,
}

ORACLES = {
    "tx_winnowing": _TX_WINNOW_SQL,
    "ev_pattern_match": _EV_PATTERN_SQL,
    "gr_modularity": _GR_MODULARITY_SQL,
    "qa_dp_counts": _QA_DP_SQL,
}
