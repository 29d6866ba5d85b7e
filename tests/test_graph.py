"""Fixed-point PageRank (`operators/graph.py`): exactness, invariants,
and partitioning-independence of the iterative integer computation."""

from __future__ import annotations

from movie_data_etl_pipeline_spark.operators import graph


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src LONG, dst LONG")


def test_two_cycle_is_exact_fixed_point(spark):
    """A↔B: each node's contribution equals its full rank, so
    rank' = 0.15·S + 0.85·S = S exactly (S divisible by 20) — the
    iteration must be a no-op, bit-for-bit."""
    e = _edges(spark, [(1, 2), (2, 1)])
    out = {r["node"]: r["rank"] for r in graph.pagerank_fixed_point(e, iters=4).collect()}
    assert out == {1: graph.SCALE, 2: graph.SCALE}


def test_star_center_dominates(spark):
    leaves = list(range(2, 12))
    pairs = [(1, l) for l in leaves] + [(l, 1) for l in leaves]
    out = {r["node"]: r["rank"] for r in graph.pagerank_fixed_point(_edges(spark, pairs)).collect()}
    center = out[1]
    assert all(center > out[l] for l in leaves)
    # all leaves are symmetric → identical ranks
    assert len({out[l] for l in leaves}) == 1


def test_mass_nearly_conserved_without_danglers(spark):
    """Every node has out-edges → only integer-division floors leak
    mass: bounded by (outdeg+1) per node per round, invisible at
    SCALE=1e12."""
    pairs = [(i, (i + 1) % 20) for i in range(20)] + [(i, (i + 7) % 20) for i in range(20)]
    rows = graph.pagerank_fixed_point(_edges(spark, pairs), iters=5).collect()
    total = sum(r["rank"] for r in rows)
    assert abs(total - 20 * graph.SCALE) < 20 * 5 * 100  # floors only

def test_partitioning_independence(spark):
    pairs = [(i % 13, (i * 7) % 13) for i in range(60) if i % 13 != (i * 7) % 13]
    a = sorted(map(tuple, graph.pagerank_fixed_point(_edges(spark, pairs).repartition(1)).collect()))
    b = sorted(map(tuple, graph.pagerank_fixed_point(_edges(spark, pairs).repartition(16)).collect()))
    assert a == b


def test_dangling_node_receives_only_teleport(spark):
    """1→2 with no out-edge from 2 (except none): node 2's inbound mass
    decays each round; node 1 (no inbound) must sit at exactly the
    teleport base after round 1."""
    e = _edges(spark, [(1, 2)])
    out = {r["node"]: r["rank"] for r in graph.pagerank_fixed_point(e, iters=3).collect()}
    base = (20 - 17) * graph.SCALE // 20
    assert out[1] == base
    assert out[2] > base


def test_cotransaction_edges_bidirectional_and_disjoint_ids(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    e = graph.cotransaction_edges(orders, li)
    n = e.count()
    assert n > 0 and n % 2 == 0
    # even ids only on the customer side, odd only on the supplier side
    from pyspark.sql import functions as F

    bad = e.filter(
        ((F.col("src") % 2 == 0) & (F.col("dst") % 2 == 0))
        | ((F.col("src") % 2 == 1) & (F.col("dst") % 2 == 1))
    ).count()
    assert bad == 0
