"""Space-filling-curve data layout (north-star 100 TB extension).

The reference expresses its access-path intent as four btree indexes
(``/root/reference/sql/01_schema.sql:62-65``) — two DESC value indexes
and two FK-side join indexes. Spark has no indexes; the equivalent lever
is *data layout*: sorting the parquet files so row-group min/max
statistics prune reads. A plain sort optimizes one column only; a
Z-order (Morton) curve interleaves the bits of two keys so row groups
are tight ranges in BOTH dimensions, giving balanced data skipping for
predicates on either key — the layout analogue of having both
``idx_movie_actor_person`` and ``idx_movie_genre_genre`` at once.

Everything is JVM-side expression arithmetic (shift/and/or inside one
whole-stage-codegen span — no Python, no UDF), so computing the curve
costs one projection over the scan. At 100 TB the pattern is: compute
``zvalue16`` → ``repartitionByRange`` on it (range exchange ≈ the
cluster-wide sort) → ``sortWithinPartitions`` → write; readers then hit
a small fraction of row groups for selective predicates on either key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Magic-mask bit spreading (public-domain "interleave by binary magic
# numbers" technique): spread a 16-bit value so its bits occupy even
# positions of a 32-bit lane.
_SPREAD_STEPS = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread16(v: Column) -> Column:
    """Spread the low 16 bits of ``v`` to even bit positions (bigint)."""
    out = v.cast("bigint").bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD_STEPS:
        out = out.bitwiseOR(F.shiftleft(out, shift)).bitwiseAND(F.lit(mask))
    return out


def zvalue16(x: Column, y: Column) -> Column:
    """32-bit Morton code interleaving the low 16 bits of ``x`` (even
    bits) and ``y`` (odd bits). Pure codegen'd integer arithmetic."""
    return _spread16(x).bitwiseOR(F.shiftleft(_spread16(y), 1))


def zorder_layout(
    df: DataFrame, col_x: str, col_y: str, num_partitions: int | None = None
) -> DataFrame:
    """Return ``df`` clustered along the Z-curve of ``(col_x, col_y)``:
    range-partitioned then sorted within partitions by the interleaved
    key, ready to write. The ``_zvalue`` column is kept so callers can
    inspect/verify the curve; drop it before writing if undesired.

    ``repartitionByRange`` samples the z-distribution to build balanced
    range bounds — at cluster scale this is one exchange, after which
    every output file covers a tight (x, y) rectangle and parquet
    min/max stats prune on either column.
    """
    out = df.withColumn("_zvalue", zvalue16(F.col(col_x), F.col(col_y)))
    if num_partitions:
        out = out.repartitionByRange(num_partitions, "_zvalue")
    else:
        out = out.repartitionByRange("_zvalue")
    return out.sortWithinPartitions("_zvalue")
