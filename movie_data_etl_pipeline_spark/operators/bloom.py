"""Distributed Bloom filter build + broadcast pre-filtered anti-join.

The exact anti-join behind incremental dedup / decontamination
(``operators/dedup.incremental_dedup``,
``/root/reference/02_etl.py:123-128`` rerun-safe ON CONFLICT DO
NOTHING) shuffles the ENTIRE probe side on the key — even though at
100 TB almost every probe row is brand-new and matches nothing. When
the seen-key set is too large to broadcast exactly but its Bloom
filter fits comfortably (1 M bits ≈ 125 KB per ~100k keys at ~3% FP),
the classic fix is: broadcast the Bloom, let every probe row test
membership locally, and send ONLY the "might be seen" sliver through
the shuffle. Result semantics stay EXACT — the Bloom admits false
positives, never false negatives, and the maybe-sliver still goes
through the real anti-join — so the operator is oracle-checkable as a
plain NOT EXISTS while moving a fraction of the bytes.

Everything is JVM expression arithmetic:

* build: k positions per key via seeded ``xxhash64`` → one narrow
  shuffle of (word, bit) pairs collapsed map-side by partial
  ``bit_or`` to at most ``m/64`` rows per partition → dense
  ``array<long>`` assembled in a 1-row aggregate (the only "collect"
  is Spark's own broadcast of that row);
* probe: ``element_at`` + shift + mask per hash inside one codegen
  span; no Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BLOOM_COL = "__bloom"


def _position(key_col: str, seed: int, m_bits: int) -> str:
    """SQL for hash #seed of the key, as a bit position in [0, m)."""
    return f"pmod(xxhash64(`{key_col}`, {seed}), {m_bits}L)"


def build_bloom(keys: DataFrame, key_col: str, m_bits: int = 1 << 20, k: int = 5) -> DataFrame:
    """One-row DataFrame holding the Bloom filter of ``keys.key_col``
    as a dense ``array<long>`` of ``m_bits/64`` words (column
    ``__bloom``) — sized for broadcast. ``m_bits`` must be a multiple
    of 64. An empty key set yields the all-zero filter (every probe is
    then a definite miss), so the degenerate case needs no branch."""
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    nwords = m_bits // 64
    pos = keys.select(
        F.explode(F.array(*[F.expr(_position(key_col, i, m_bits)) for i in range(k)])).alias("p")
    )
    words = pos.select(
        F.expr("p div 64").alias("w"),
        F.expr("shiftleft(1L, cast(p % 64 as int))").alias("bit"),
    )
    sparse = words.groupBy("w").agg(F.bit_or("bit").alias("bits"))
    return sparse.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "bits"))).alias("__m")
    ).select(
        F.transform(
            F.sequence(F.lit(0).cast("long"), F.lit(nwords - 1).cast("long")),
            lambda i: F.coalesce(F.element_at(F.col("__m"), i), F.lit(0).cast("long")),
        ).alias(BLOOM_COL)
    )


def might_contain(key_col: str, m_bits: int, k: int) -> Column:
    """Membership test against the broadcast ``__bloom`` column: ALL k
    bits set → maybe seen; ANY bit clear → definitely new."""
    checks = []
    for i in range(k):
        p = _position(key_col, i, m_bits)
        checks.append(
            f"(element_at({BLOOM_COL}, cast(({p}) div 64 as int) + 1)"
            f" & shiftleft(1L, cast(({p}) % 64 as int))) != 0"
        )
    return F.expr(" AND ".join(checks))


def bloom_anti_join(
    big: DataFrame,
    seen: DataFrame,
    key_col: str,
    m_bits: int = 1 << 20,
    k: int = 5,
) -> DataFrame:
    """EXACT ``big LEFT ANTI JOIN seen ON key_col`` with a broadcast
    Bloom pre-filter: rows the filter proves unseen bypass the shuffle
    entirely; only the maybe-seen sliver (true matches + ~FP-rate of
    the rest) is verified by the real anti-join. Same rows out as the
    plain anti-join, a fraction of the bytes through the exchange —
    size ``m_bits`` at ~10 bits/key for ~1% false positives."""
    bloom = build_bloom(seen.select(key_col), key_col, m_bits, k)
    tagged = big.crossJoin(F.broadcast(bloom))
    maybe_seen = might_contain(key_col, m_bits, k)
    definite_new = tagged.where(~maybe_seen).drop(BLOOM_COL)
    sliver = tagged.where(maybe_seen).drop(BLOOM_COL)
    verified = sliver.join(seen.select(key_col).distinct(), key_col, "left_anti")
    return definite_new.unionByName(verified.select(*definite_new.columns))


def bloom_semi_join(
    big: DataFrame,
    keys: DataFrame,
    key_col: str,
    m_bits: int = 1 << 20,
    k: int = 5,
) -> DataFrame:
    """EXACT ``big LEFT SEMI JOIN keys ON key_col`` with a broadcast
    Bloom pre-filter — the classic semi-join reduction: rows whose key
    fails ``might_contain`` are definitely absent and never reach the
    exchange; the surviving sliver (true matches + ~FP-rate of the
    rest) is verified by the real semi-join, so false positives never
    change the result. At 100 TB this is the pattern that turns a
    full fact shuffle into a shuffle of the matching fraction."""
    bloom = build_bloom(keys.select(key_col), key_col, m_bits, k)
    tagged = big.crossJoin(F.broadcast(bloom))
    sliver = tagged.where(might_contain(key_col, m_bits, k)).drop(BLOOM_COL)
    return sliver.join(keys.select(key_col).distinct(), key_col, "left_semi")
