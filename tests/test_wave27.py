"""Semantic invariants of the wave-27 operators (plans/wave27.py):
exact Python references on the sf0.001 fixtures."""

from __future__ import annotations

import math
from collections import defaultdict

from movie_data_etl_pipeline_spark.plans import wave27
from movie_data_etl_pipeline_spark.sources import load_table


def test_kmeans_matches_python_lloyd(spark, sf_dir):
    rows = {r["cluster"]: r for r in wave27.emb_kmeans_iterate(spark, sf_dir).collect()}
    emb = load_table(spark, sf_dir, "embeddings").collect()
    q = {
        r["vec_id"]: [math.floor(float(v) * 1048576.0) for v in r["embedding"]]
        for r in emb
    }
    seeds = sorted(q)[: wave27._KM_K]
    cents = {i: list(q[s]) for i, s in enumerate(seeds)}
    assign = {}
    for _ in range(wave27._KM_ROUNDS):
        assign = {}
        for vid, v in q.items():
            best = min(
                (sum((a - b) * (a - b) for a, b in zip(v, c)), k)
                for k, c in cents.items()
            )
            assign[vid] = best[1]
        sums = defaultdict(lambda: [0] * wave27._KM_DIM)
        counts = defaultdict(int)
        for vid, k in assign.items():
            counts[k] += 1
            for j, v in enumerate(q[vid]):
                sums[k][j] += v
        for k in cents:
            if counts[k]:
                cents[k] = [s // counts[k] for s in sums[k]]  # floor div
    member_counts = defaultdict(int)
    for k in assign.values():
        member_counts[k] += 1
    assert set(rows) == set(range(wave27._KM_K))
    for k in range(wave27._KM_K):
        r = rows[k]
        assert r["n_members"] == member_counts.get(k, 0)
        assert [r["c0"], r["c1"], r["c2"], r["c3"]] == cents[k][:4]


def test_kmeans_python_floor_div_matches_sql_semantics():
    # Python // floors like DuckDB // and Spark floor(double/...) —
    # including on negatives (the embedding sums go negative)
    assert -7 // 2 == -4 == math.floor(-7 / 2)


def test_fd_mining_matches_python(spark, sf_dir):
    rows = {(r["lhs"], r["rhs"]): r for r in wave27.qa_fd_mining(spark, sf_dir).collect()}
    assert len(rows) == len(wave27._FD_PAIRS)
    for table, lhs, rhs in wave27._FD_PAIRS:
        data = load_table(spark, sf_dir, table).select(lhs, rhs).collect()
        groups = defaultdict(lambda: (set(), 0))
        for r in data:
            s, n = groups[str(r[lhs])]
            s.add(r[rhs])
            groups[str(r[lhs])] = (s, n + 1)
        n_groups = len(groups)
        n_violating = sum(1 for s, _ in groups.values() if len(s) > 1)
        max_fanout = max(len(s) for s, _ in groups.values())
        rows_in_violation = sum(n for s, n in groups.values() if len(s) > 1)
        r = rows[(f"{table}.{lhs}", f"{table}.{rhs}")]
        assert r["n_groups"] == n_groups
        assert r["n_violating"] == n_violating
        assert r["max_fanout"] == max_fanout
        assert r["rows_in_violation"] == rows_in_violation
        assert r["holds"] == int(max_fanout == 1)
    # the declared key dependencies really hold on the fixture
    assert rows[("nation.n_nationkey", "nation.n_regionkey")]["holds"] == 1
    assert rows[("orders.o_orderkey", "orders.o_custkey")]["holds"] == 1
    assert rows[("supplier.s_suppkey", "supplier.s_nationkey")]["holds"] == 1
