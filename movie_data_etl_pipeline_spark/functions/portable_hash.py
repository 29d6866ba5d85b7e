"""Engine-portable hashing: the same hash values computable in Spark SQL
expressions AND in ANSI-ish SQL (DuckDB), so hash-DEPENDENT operators
(MinHash banding, SimHash, hyperplane LSH) can be value-checked against
an independent oracle instead of settling for rows-only evidence.

Why this exists: the production dedup/ANN paths hash with ``xxhash64``
(the right choice at scale — one JVM intrinsic per value). But xxhash64
is not reproducible in other engines, so any query whose OUTPUT depends
on hash values (which pairs collide into an LSH bucket, which bits a
SimHash sets) could previously only be checked by row count. This module
trades the hash for arithmetic both engines evaluate identically on
int64 — a polynomial string fold and an LCG permutation family over the
Mersenne prime 2^31-1 — and emits the matching DuckDB SQL fragment next
to each Spark expression so the two can never drift apart.

All arithmetic stays strictly inside int64: operands are < 2^31, so
products are < 2^62. Both engines use exact two's-complement BIGINT
semantics for `*`, `+`, `%` on non-negative operands.

Portability preconditions (verified live against both engines):
- Spark's `ascii()` and DuckDB's `unicode()` both return the full
  Unicode CODE POINT of the first character — they agree beyond ASCII
  (probed: 'é'→233, '中'→20013, NBSP→160), so the fold is Unicode-safe,
  not merely ASCII-safe.
- Spark's `split(s, '')` and DuckDB's `string_split(s, '')` both yield
  the character sequence; empties are filtered on both sides.

The reference has no hashing surface at all (its dedup is an exact
GROUP BY, ``02_etl.py:233-244``); this is part of the training-data
extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

P = 2_147_483_647  # Mersenne prime 2^31 - 1: the hash codomain
BASE = 131  # polynomial fold base (classic BKDR constant)
MULT = 2_654_435_761  # Knuth's 32-bit multiplicative-hash constant
B_MULT = 40_503  # LCG offset stride (Fibonacci-hash 16-bit constant)
B_ADD = 97_531


def perm_coeffs(i: int) -> tuple[int, int]:
    """(a, b) of the i-th LCG permutation h_i(x) = (a*x + b) mod P.

    a = (MULT * (i+1)) mod P is nonzero for every i < P-1 (MULT mod P
    and (i+1) are both nonzero mod the prime), so each h_i is a
    bijection on [0, P).
    """
    a = (MULT * (i + 1)) % P
    b = (B_MULT * i + B_ADD) % P
    assert a != 0
    return a, b


# ---------------------------------------------------------------------------
# Spark expressions
# ---------------------------------------------------------------------------


def str_hash(col: Column | str) -> Column:
    """Polynomial fold of a string's code points: h = fold(h*131 + cp) mod P.

    Whole-stage-codegen arithmetic only — no Python. O(len) per value,
    heavier than the one-intrinsic xxhash64; use for oracle-provable
    variants, not the 100 TB hot path.
    """
    c = F.col(col) if isinstance(col, str) else col
    chars = F.filter(F.split(c, ""), lambda ch: ch != F.lit(""))
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda h, ch: (h * F.lit(BASE) + F.ascii(ch)) % F.lit(P),
    )


def lcg_perm(i: Column, x: Column) -> Column:
    """h_i(x) for a COLUMN-valued permutation index i (e.g. a lambda
    variable ranging over signature slots): coefficients are computed
    inline with the same formula as :func:`perm_coeffs`."""
    a = (F.lit(MULT) * (i + F.lit(1))) % F.lit(P)
    b = (F.lit(B_MULT) * i + F.lit(B_ADD)) % F.lit(P)
    return (a * x + b) % F.lit(P)


M2 = 2_246_822_519  # xxhash32 prime #2, the second-round mix multiplier


def py_rademacher_sign(i: int) -> int:
    """Pure-Python reference for :func:`rademacher_sign` — the single
    source of truth the Spark and DuckDB renderings (and the tests)
    must agree with."""
    h = (MULT * (i + 1)) % P
    h ^= h >> 16
    h = (h * M2) % P
    h ^= h >> 13
    return 1 if h & 1 else -1


def rademacher_sign(i: Column) -> Column:
    """±1 pseudo-random sign for index column ``i``.

    The raw parity of ``(MULT*(i+1)) mod P`` is affine in i — sign ROWS
    built from consecutive indices came out ~0.97-correlated, capping JL
    projection quality (adding rows added no information; measured
    distance-correlation stuck at 0.18 from k=16 to k=64). Two
    xor-fold + multiply rounds (a murmur/xxhash-style finalizer, all
    int64 and engine-portable) break the linear structure: row
    correlation drops to ≤0.41 and projection quality scales with k
    again (0.34 → 0.59 from k=16 to k=64 on the fixture, Gaussian-like).
    """
    h1 = (F.lit(MULT) * (i + F.lit(1))) % F.lit(P)
    h2 = h1.bitwiseXOR(F.shiftright(h1, 16))
    h3 = (h2 * F.lit(M2)) % F.lit(P)
    h4 = h3.bitwiseXOR(F.shiftright(h3, 13))
    return F.when(h4 % 2 == 1, F.lit(1)).otherwise(F.lit(-1))


def sql_rademacher_sign(i_expr: str) -> str:
    """DuckDB rendering of :func:`rademacher_sign` (textually expanded —
    the repeated subexpressions are CSE'd by the engine)."""
    h1 = f"(({MULT} * (({i_expr}) + 1)) % {P})"
    h2 = f"xor({h1}, ({h1} >> 16))"
    h3 = f"(({h2} * {M2}) % {P})"
    h4 = f"xor({h3}, ({h3} >> 13))"
    return f"(CASE WHEN ({h4} & 1) = 1 THEN 1 ELSE -1 END)"


def fold_longs(arr: Column) -> Column:
    """Order-sensitive fold of an int64 array into one bucket id mod P
    (used to hash a signature band slice into its LSH bucket)."""
    return F.aggregate(
        arr,
        F.lit(0).cast("long"),
        lambda h, s: (h * F.lit(BASE) + s) % F.lit(P),
    )


# ---------------------------------------------------------------------------
# Matching DuckDB SQL fragments (oracle side)
# ---------------------------------------------------------------------------


def sql_str_hash(expr: str) -> str:
    """DuckDB rendering of :func:`str_hash` over the SQL expression ``expr``."""
    return (
        "list_reduce(list_prepend(0::BIGINT, "
        f"[unicode(c)::BIGINT for c in list_filter(string_split({expr}, ''), x -> x <> '')]), "
        f"(h, c) -> (h * {BASE} + c) % {P})"
    )


def sql_lcg_perm(i_expr: str, x_expr: str) -> str:
    """DuckDB rendering of :func:`lcg_perm`."""
    return (
        f"((((({MULT} * ({i_expr} + 1)) % {P}) * {x_expr}) "
        f"+ (({B_MULT} * {i_expr} + {B_ADD}) % {P})) % {P})"
    )


def sql_fold_longs(expr: str) -> str:
    """DuckDB rendering of :func:`fold_longs`."""
    return (
        f"list_reduce(list_prepend(0::BIGINT, {expr}), "
        f"(h, s) -> (h * {BASE} + s) % {P})"
    )


def py_mix(x: int) -> int:
    """Pure-Python reference for :func:`mix` — single source of truth
    for the Spark and DuckDB renderings and the tests."""
    h1 = (x * MULT) % P
    h2 = h1 ^ (h1 >> 16)
    h3 = (h2 * M2) % P
    h4 = h3 ^ (h3 >> 13)
    return h4 % P


def mix(x: Column) -> Column:
    """Avalanche finalizer over [0, P): multiply + two xor-fold rounds
    (the same murmur/xxhash-style construction as
    :func:`rademacher_sign`).

    Why it exists: the raw polynomial fold is an EXCELLENT equality
    hash (distinct strings → distinct values, which is all MinHash
    banding or CMS bucketing need) but a TERRIBLE uniform hash — short
    strings never wrap the modulus, so their values cluster near 0
    (measured: 40 "tokN" strings put the 16th-smallest at 0.025·P
    instead of ≈0.4·P, biasing a KMV estimate 15×). Order statistics
    (KMV bottom-k), range-based sampling, or anything reading hash
    MAGNITUDE rather than hash EQUALITY must go through this
    finalizer. All int64, engine-portable (xor of values ≤ P stays
    ≤ P; the final mod folds the single P edge case to 0)."""
    h1 = (x * F.lit(MULT)) % F.lit(P)
    h2 = h1.bitwiseXOR(F.shiftright(h1, 16))
    h3 = (h2 * F.lit(M2)) % F.lit(P)
    h4 = h3.bitwiseXOR(F.shiftright(h3, 13))
    return h4 % F.lit(P)


def sql_mix(expr: str) -> str:
    """DuckDB rendering of :func:`mix` (textually expanded; the engine
    CSEs the repeated fragments)."""
    h1 = f"((({expr}) * {MULT}) % {P})"
    h2 = f"xor({h1}, ({h1} >> 16))"
    h3 = f"(({h2} * {M2}) % {P})"
    h4 = f"xor({h3}, ({h3} >> 13))"
    return f"(({h4}) % {P})"
