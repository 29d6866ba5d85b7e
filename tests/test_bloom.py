"""Broadcast Bloom pre-filtered anti-join (``operators/bloom``): exact
result equivalence, the no-false-negative guarantee, the
shuffle-reduction claim (the maybe-seen sliver is small), and the
empty-seen degenerate case."""

from __future__ import annotations

from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.operators import bloom


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_bloom_anti_join_equals_plain_anti_join(spark):
    big = spark.createDataFrame([(i, f"v{i}") for i in range(5000)], "k long, v string")
    seen = spark.createDataFrame([(i,) for i in range(0, 5000, 7)], "k long")
    got = bloom.bloom_anti_join(big, seen, "k", m_bits=1 << 14, k=5)
    want = big.join(seen, "k", "left_anti")
    assert _rows(got) == _rows(want)


def test_bloom_no_false_negatives_and_small_sliver(spark):
    n, seen_n = 20000, 500
    big = spark.createDataFrame([(i,) for i in range(n)], "k long")
    seen = spark.createDataFrame([(i,) for i in range(seen_n)], "k long")
    m_bits, k = 1 << 14, 5  # ~32 bits/key at 500 keys: FP well under 5%
    filt = bloom.build_bloom(seen, "k", m_bits, k)
    tagged = big.crossJoin(F.broadcast(filt))
    maybe = tagged.where(bloom.might_contain("k", m_bits, k))
    maybe_keys = {r["k"] for r in maybe.select("k").collect()}
    # every truly-seen key MUST test positive (no false negatives —
    # this is what makes the pre-filter semantics-preserving)
    assert set(range(seen_n)) <= maybe_keys
    # and the sliver that would reach the shuffle is a small fraction
    fp = len(maybe_keys) - seen_n
    assert fp / (n - seen_n) < 0.05, fp


def test_bloom_empty_seen_passes_everything(spark):
    big = spark.createDataFrame([(i,) for i in range(100)], "k long")
    seen = spark.createDataFrame([], "k long")
    out = bloom.bloom_anti_join(big, seen, "k", m_bits=1 << 10, k=3)
    assert out.count() == 100
