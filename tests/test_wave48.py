"""Wave-48 invariants: HLL set operations vs exact Python set algebra
on sf0.001 (list-mode sketches are exact at fixture cardinality)."""

from __future__ import annotations

from collections import defaultdict

from movie_data_etl_pipeline_spark.plans import wave48
from movie_data_etl_pipeline_spark.sources import load_table


def test_hll_setops_matches_exact_sets(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id").collect()
    users = defaultdict(set)
    for r in ev:
        users[r["event_type"]].add(r["user_id"])
    types = sorted(users)
    got = wave48.ap_hll_setops(spark, sf_dir).collect()
    pairs = [(a, b) for i, a in enumerate(types) for b in types[i + 1 :]]
    assert [(r["type_a"], r["type_b"]) for r in got] == sorted(pairs)
    for r in got:
        A, B = users[r["type_a"]], users[r["type_b"]]
        assert r["n_a"] == len(A)
        assert r["n_b"] == len(B)
        assert r["n_union"] == len(A | B)
        assert r["n_inter"] == len(A & B)
        assert r["jaccard"] == len(A & B) / float(len(A | B))
        # inclusion-exclusion consistency
        assert r["n_inter"] == r["n_a"] + r["n_b"] - r["n_union"]
