"""Round-4 wave 35: retrieval ranking metrics (NDCG@10 + reciprocal
rank), HITS hubs/authorities, and per-node local clustering
coefficients — the ranking-eval and graph-centrality operators.

Determinism contract: NDCG discounts are Python-built integer constants
embedded in both engines; HITS is the pagerank-style integer fixed
point; clustering coefficients are ratios of exact int64 counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.operators import graph, ml_eval
from movie_data_etl_pipeline_spark.sources import load_table


def ir_ndcg_mrr(spark: SparkSession, sf: str) -> DataFrame:
    """NDCG@10 + scaled reciprocal rank per query over the embedding
    retrieval protocol (``ml_eval.retrieval_ndcg_mrr``): exact integer
    dot-product ranking, integer discount table, one double division
    per metric."""
    emb = load_table(spark, sf, "embeddings")
    return ml_eval.retrieval_ndcg_mrr(emb, n_queries=50, k=10, dim=64)


def _disc_values() -> str:
    rows = []
    for i in range(ml_eval.NDCG_K):
        rows.append(
            f"({i + 1}, {ml_eval.NDCG_DISC[i]}::BIGINT,"
            f" {ml_eval.NDCG_IDCG_PREF[i]}::BIGINT, {ml_eval.RR_2520[i]}::BIGINT)"
        )
    return ",\n         ".join(rows)


_IR_NDCG_SQL = f"""
WITH disc(i, d, pref, rr) AS (
  VALUES {_disc_values()}
),
base AS (
  SELECT vec_id AS id, label,
         [CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT) for x in embedding] AS v
  FROM embeddings
),
q AS (SELECT id AS qid, label AS qlab, v AS qv FROM base WHERE id < 50),
c AS (SELECT id AS cid, label AS clab, v AS cv FROM base WHERE id >= 50),
lab AS (SELECT clab AS qlab, COUNT(*)::BIGINT AS n_lab FROM c GROUP BY 1),
scored AS (
  SELECT qid, qlab, cid, clab,
         CAST(list_sum([qv[i] * cv[i] for i in range(1, 65)]) AS BIGINT) AS qdot
  FROM q, c
),
top AS (
  SELECT qid, qlab, rnk, CASE WHEN qlab = clab THEN 1 ELSE 0 END AS rel
  FROM (
    SELECT *, row_number() OVER (PARTITION BY qid ORDER BY qdot DESC, cid) AS rnk
    FROM scored
  )
  WHERE rnk <= 10
),
agg AS (
  SELECT qid, qlab,
         CAST(SUM(rel) AS BIGINT) AS n_rel_topk,
         CAST(SUM(rel * d) AS BIGINT) AS dcg,
         MIN(CASE WHEN rel = 1 THEN rnk END) AS frank
  FROM top JOIN disc ON disc.i = rnk
  GROUP BY 1, 2
)
SELECT qid AS query_id, n_rel_topk,
       COALESCE(n_lab, 0) AS total_rel,
       dcg,
       di.pref AS idcg,
       CAST(dcg AS DOUBLE) / CAST(di.pref AS DOUBLE) AS ndcg,
       COALESCE(dr.rr, 0) AS rr2520
FROM agg
LEFT JOIN lab USING (qlab)
LEFT JOIN disc di ON di.i = LEAST(COALESCE(n_lab, 0), 10)
LEFT JOIN disc dr ON dr.i = frank
ORDER BY query_id
"""


def gr_hits(spark: SparkSession, sf: str) -> DataFrame:
    """HITS over the customer→supplier order graph
    (``graph.hits_fixed_point``): 2 unrolled rounds of int64 key-sums
    with max-normalization by integer floor division — top-20 of each
    role, engine-exact.

    Node state here is dimension-grain (one row per customer /
    supplier key), so the per-round edge⋈state build sides get the
    explicit bounded-side broadcast the r8 AQE flip-off removed
    (VERDICT-r8 #5) via ``_hints.bounded_broadcast``."""
    from movie_data_etl_pipeline_spark.plans import _hints
    from movie_data_etl_pipeline_spark.plans.graph_edges import cotx_pairs

    return graph.hits_fixed_point(
        cotx_pairs(spark, sf), iters=2, state_hint=_hints.bounded_broadcast
    )


def _hits_round_sql(h_prev: str, a_out: str, h_out: str) -> str:
    return f"""
ar_{a_out} AS (
  SELECT s, CAST(SUM(h) AS BIGINT) AS ar FROM pairs JOIN {h_prev} USING (c) GROUP BY 1
),
{a_out} AS (
  SELECT s, CAST((ar * 1048576) // (SELECT MAX(ar) FROM ar_{a_out}) AS BIGINT) AS a
  FROM ar_{a_out}
),
hr_{h_out} AS (
  SELECT c, CAST(SUM(a) AS BIGINT) AS hr FROM pairs JOIN {a_out} USING (s) GROUP BY 1
),
{h_out} AS (
  SELECT c, CAST((hr * 1048576) // (SELECT MAX(hr) FROM hr_{h_out}) AS BIGINT) AS h
  FROM hr_{h_out}
)"""


_GR_HITS_SQL = f"""
WITH pairs AS (
  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
h0 AS (SELECT DISTINCT c, 1048576::BIGINT AS h FROM pairs),
{_hits_round_sql('h0', 'a1', 'h1')},
{_hits_round_sql('h1', 'a2', 'h2')}
SELECT * FROM (
  SELECT 'authority' AS role, s AS node, a AS score FROM a2
  ORDER BY score DESC, node LIMIT 20
)
UNION ALL
SELECT * FROM (
  SELECT 'hub' AS role, c AS node, h AS score FROM h2
  ORDER BY score DESC, node LIMIT 20
)
"""


def gr_local_clustering(spark: SparkSession, sf: str) -> DataFrame:
    """Per-node clustering coefficients (``graph.local_clustering``)
    over the exact 3-shingle Jaccard near-dup graph — the node-grain
    companion to ``gr_triangles``' global census: which documents sit
    in tightly-knit duplicate clusters vs on loose chains. Shared
    cached pair relation (``plans/doc_pairs``)."""
    from movie_data_etl_pipeline_spark.plans.doc_pairs import jaccard_pairs

    pairs = jaccard_pairs(spark, sf, 0.5).select(
        F.col("a_id").alias("a"), F.col("b_id").alias("b")
    )
    return graph.local_clustering(pairs)


_GR_LOCAL_SQL = """
WITH toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t FROM documents
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
),
e AS (
  SELECT a_id AS a, b_id AS b
  FROM shared JOIN sizes sa ON sa.doc_id = a_id JOIN sizes sb ON sb.doc_id = b_id
  WHERE n_shared / (sa.n_sh + sb.n_sh - n_shared) >= 0.5
),
und AS (SELECT a AS u FROM e UNION ALL SELECT b FROM e),
deg AS (SELECT u, COUNT(*)::BIGINT AS d FROM und GROUP BY 1),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e e1 JOIN e e2 ON e1.b = e2.a JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
),
corners AS (
  SELECT x AS u FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri
),
tc AS (SELECT u, COUNT(*)::BIGINT AS n_tri FROM corners GROUP BY 1)
SELECT deg.u AS node, d AS degree,
       COALESCE(n_tri, 0)::BIGINT AS n_tri,
       CAST(2 * COALESCE(n_tri, 0) AS DOUBLE) / CAST(d * (d - 1) AS DOUBLE) AS coef
FROM deg LEFT JOIN tc USING (u)
WHERE d >= 2
ORDER BY node
"""


QUERIES = {
    "ir_ndcg_mrr": ir_ndcg_mrr,
    "gr_hits": gr_hits,
    "gr_local_clustering": gr_local_clustering,
}

ORACLES = {
    "ir_ndcg_mrr": _IR_NDCG_SQL,
    "gr_hits": _GR_HITS_SQL,
    "gr_local_clustering": _GR_LOCAL_SQL,
}
