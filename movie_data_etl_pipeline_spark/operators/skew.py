"""Skew-mitigated equi-join (salting) — the manual escape hatch for the
one shuffle pathology AQE can't always fix.

AQE's skew-join splitting (enabled in ``session.get_spark``) handles
skewed *sort-merge* joins by splitting oversized partitions, but it
cannot split a skewed *aggregation* key, and it only kicks in past
size thresholds. Salting is the explicit version: append a salt in
``[0, n_salts)`` to the fact side's key, replicate the other side once
per salt value, and join on ``(key, salt)`` — a single hot key now
lands on ``n_salts`` reducers instead of one.

Cost model: replicates the build side ``n_salts``× (so use it when the
build side is small-to-medium but too big to broadcast) and leaves
non-skewed keys untouched. At 100 TB this is the difference between a
1000-executor join finishing with 999 idle executors or none.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact ⋈ dim`` on ``on`` with ``n_salts``-way salting.

    The fact side gets a deterministic salt from a hash of its full row
    (any assignment is correct — the salt only spreads rows; a hash
    keeps it reproducible run-to-run, unlike ``rand()``). The dim side
    is replicated once per salt via an ``explode(sequence(...))`` —
    no Python, no extra shuffle beyond the join's own exchange on the
    widened key. Output columns = fact's, then dim's non-key columns
    (standard join projection).
    """
    key = list(on)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n_salts))
    salted_fact = fact.withColumn("__salt", salt)
    replicated_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<long>"))
    )
    out = salted_fact.join(replicated_dim, [*key, "__salt"], how)
    return out.select(
        *fact.columns, *[c for c in dim.columns if c not in key]
    )
