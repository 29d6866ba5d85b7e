"""Exact closed-form grouped regression (north-star analytics
extension; SURVEY.md §2.9).

The reference's analytics stop at AVG/COUNT views
(``/root/reference/sql/03_views.sql``); a curation pipeline also asks
*relationship* questions — does price scale with quantity, does
quality drift with length — per segment, over the full data. Spark's
built-in ``regr_slope`` (like DuckDB's) accumulates doubles, so the
answer depends on partition count and merge order: useless for a
hash-checked gate. This module computes the same closed form from
EXACT integer moment sums, so the result is bit-identical at any
parallelism and reproducible across engines.

slope      = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
intercept  = (Σy·Σx² − Σx·Σxy) / (n·Σx² − (Σx)²)

with x, y pre-scaled to integers (cents, unit counts). The moment
sums are int64-exact per group; the cross terms are formed in
``decimal(38,0)`` (n·Σxy overflows int64 past ~2M rows·10⁹-scale
values, decimal38 holds ~10³⁸), and ONE double division at the end
renders each coefficient — no accumulation-order dependence anywhere.

Scale shape: a single map-side-combining groupBy over one scan; the
decimal arithmetic happens on the GROUPED relation (group-count rows,
not data rows). This is the textbook "sufficient statistics beat raw
data movement" pattern — the same five sums also give r² for free.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_D38 = "decimal(38,0)"


def ols_by_group(
    df: DataFrame,
    keys: Sequence[str],
    x: Column | str,
    y: Column | str,
    decimals: int = 6,
) -> DataFrame:
    """Per-group least-squares fit of ``y ~ x``. ``x`` and ``y`` must
    already be integer-valued columns/expressions (cast upstream —
    e.g. money in cents); groups with zero x-variance return NULL
    coefficients (the SQL convention) rather than failing.

    Output: keys, n, slope, intercept, r2 — each coefficient rounded
    to ``decimals`` from one exact-integer-ratio division.
    """
    xc = (F.col(x) if isinstance(x, str) else x).cast("bigint")
    yc = (F.col(y) if isinstance(y, str) else y).cast("bigint")
    # Per-row products go to decimal(38,0) BEFORE the sum: y² on
    # cent-scaled money is ~10¹⁴ per row, so an int64 sum overflows
    # past ~10⁵ rows per group — exactly the scale this targets.
    g = df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(xc.cast(_D38)).alias("sx"),
        F.sum(yc.cast(_D38)).alias("sy"),
        F.sum((xc * xc).cast(_D38)).alias("sxx"),
        F.sum((xc * yc).cast(_D38)).alias("sxy"),
        F.sum((yc * yc).cast(_D38)).alias("syy"),
    )
    n = F.col("n").cast(_D38)
    sx = F.col("sx").cast(_D38)
    sy = F.col("sy").cast(_D38)
    sxx = F.col("sxx").cast(_D38)
    sxy = F.col("sxy").cast(_D38)
    syy = F.col("syy").cast(_D38)
    den_x = (n * sxx - sx * sx).cast("double")
    den_y = (n * syy - sy * sy).cast("double")
    cov_n = (n * sxy - sx * sy).cast("double")
    slope = F.when(den_x != 0, F.round(cov_n / den_x, decimals))
    intercept = F.when(
        den_x != 0,
        F.round((sy * sxx - sx * sxy).cast("double") / den_x, decimals),
    )
    r2 = F.when(
        (den_x != 0) & (den_y != 0),
        F.round(cov_n * cov_n / (den_x * den_y), decimals),
    )
    return g.select(
        *keys,
        "n",
        slope.alias("slope"),
        intercept.alias("intercept"),
        r2.alias("r2"),
    )
