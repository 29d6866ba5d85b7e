"""Semantic invariants of the wave-28 operators (plans/wave28.py):
exact Python references on the sf0.001 fixtures."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.plans import wave28
from movie_data_etl_pipeline_spark.sources import load_table


def _daily(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.sum(F.round("o_totalprice").cast("bigint")).alias("y"))
        .collect()
    )
    import datetime

    epoch = datetime.date(1992, 1, 1)
    return [((r["d"] - epoch).days, r["y"]) for r in rows]


def test_periodogram_matches_python(spark, sf_dir):
    rows = {r["period"]: r for r in wave28.ts_periodogram(spark, sf_dir).collect()}
    assert set(rows) == set(wave28._PERIODS)
    table = {(p, k): (c, s) for p, k, c, s in wave28._cos_sin_tables()}
    pts = _daily(spark, sf_dir)
    for p in wave28._PERIODS:
        a = sum(y * table[(p, x % p)][0] for x, y in pts)
        b = sum(y * table[(p, x % p)][1] for x, y in pts)
        r = rows[p]
        assert r["n"] == len(pts)
        assert r["a_micro"] == a
        assert r["b_micro"] == b
        assert abs(
            r["log10_power"] - round(math.log10(float(a) * a + float(b) * b + 1.0), 6)
        ) < 1e-9
    # weekly rhythm should carry real power on a retail series
    assert rows[7]["log10_power"] > 0


def test_bitmap_and_equals_direct_predicate_count(spark, sf_dir):
    rows = {r["query"]: r for r in wave28.ix_bitmap_and(spark, sf_dir).collect()}
    orders = load_table(spark, sf_dir, "orders").collect()

    def preds(r):
        return {
            "urgent": r["o_orderpriority"] == "1-URGENT",
            "finished": r["o_orderstatus"] == "F",
            "q1": r["o_orderdate"].month <= 3,
        }

    counts = defaultdict(int)
    for r in orders:
        p = preds(r)
        for a, b in wave28._BM_PAIRS:
            if p[a] and p[b]:
                counts[f"{a} AND {b}"] += 1
    assert set(rows) == {f"{a} AND {b}" for a, b in wave28._BM_PAIRS}
    for q, r in rows.items():
        assert r["n_match"] == counts[q], q
        assert r["n_words"] >= 0
