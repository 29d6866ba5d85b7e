"""The driver contract itself: entry smoke + registry invariants
(every oracle key has a query; every query runs at sf0.001)."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"s_suppkey", "s_name", "movie_count"} == set(df.columns)


def test_registry_invariants():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 30


def test_all_queries_run_and_are_nonempty(spark, sf_dir):
    empties_allowed = {"sim_embedding_near_dup"}  # no planted embedding dups
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        n = df.count()
        assert n >= 0
        if name not in empties_allowed:
            assert n > 0, f"{name} returned 0 rows"
