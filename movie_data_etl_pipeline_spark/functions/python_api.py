"""The Python extension-function surface: pandas UDAF + Python UDTF.

The reference has no user-function mechanism at all (SURVEY.md §2.9 —
its Python transforms become native Column expressions here). This
module completes the extension matrix for the cases built-ins cannot
express, with the same stance as the rest of the repo: Python only
where it wins, always Arrow-vectorized, never row-at-a-time in a hot
path.

* ``weighted_median`` — a GROUPED_AGG pandas UDF (vectorized UDAF):
  per group, the smallest value whose cumulative weight reaches half
  the total weight (lower weighted median — deterministic, no
  interpolation, so results are engine- and partition-exact for
  integer inputs). Built-in ``percentile_approx``/``median`` cannot
  weight; the UDAF receives each group's columns as pandas Series via
  Arrow. Note the scale trade explicitly: GROUPED_AGG materializes
  each group in one worker — fine for bounded groups (dimension
  grain), wrong for unbounded ones (then: the exact SQL rendering via
  cumulative-weight window, see the ``ag_weighted_median`` oracle,
  which IS shuffle-linear).

* ``sentences`` — a Python UDTF (table function): one input row →
  N output rows with position. UDTFs are the lateral-view escape
  hatch when the row expansion logic doesn't fit ``explode(expr)``;
  this one is deliberately simple (sentence split on .!? runs) and
  exists to pin the API shape + tests, mirroring how multimodal
  decode pins ``mapInPandas``.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# DataType OBJECTS, not DDL strings: string schemas are parsed through
# the active SparkContext at decoration time, which breaks plain
# `import` before a session exists.


@pandas_udf(DoubleType())
def weighted_median(values: pd.Series, weights: pd.Series) -> float:
    """Lower weighted median: min v with cumweight(v) >= total/2."""
    df = pd.DataFrame({"v": values, "w": weights}).dropna()
    if df.empty:
        return None
    df = df.sort_values("v", kind="mergesort")  # stable -> deterministic
    cum = df["w"].cumsum()
    half = df["w"].sum() / 2.0
    return float(df.loc[cum >= half, "v"].iloc[0])


@udtf(
    returnType=StructType(
        [StructField("pos", IntegerType()), StructField("sentence", StringType())]
    )
)
class sentences:
    """Split text into trimmed sentences on runs of .!? — one output
    row per non-empty sentence with its 0-based position."""

    def eval(self, text: str):  # noqa: ANN201 (UDTF protocol)
        if text is None:
            return
        import re

        parts = [p.strip() for p in re.split(r"[.!?]+", text)]
        for i, p in enumerate(x for x in parts if x):
            yield i, p


def trimmed_mean_grouped(df, keys, col, trim: float = 0.1):
    """10%-trimmed mean per group via ``applyInPandas`` (grouped-map —
    the third Python API surface next to the GROUPED_AGG UDAF and the
    UDTF): sort the group's integer values, drop ⌊trim·n⌋ from each
    tail, mean the middle. Deterministic: values are exact ints, the
    trim count is a pure function of n, equal values at a trim
    boundary are interchangeable for a mean, and the single division
    happens once per group. Arrow-batched; per-group state must fit a
    worker (same bounded-group trade as ``weighted_median``, with the
    window-rank rendering as the unbounded alternative — used by the
    oracle)."""
    from pyspark.sql import functions as F  # noqa: F401 (parity import)

    klist = list(keys)
    out_schema = ", ".join(f"{k} string" for k in klist) + ", trimmed_mean double, n_kept long"

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[col].sort_values(kind="mergesort").to_numpy()
        k = int(len(v) * trim)
        kept = v[k : len(v) - k] if len(v) > 2 * k else v
        return pd.DataFrame(
            [
                [*(pdf[c].iloc[0] for c in klist),
                 float(kept.sum()) / len(kept),
                 len(kept)]
            ],
            columns=[*klist, "trimmed_mean", "n_kept"],
        )

    return df.groupBy(*klist).applyInPandas(fit, out_schema)
