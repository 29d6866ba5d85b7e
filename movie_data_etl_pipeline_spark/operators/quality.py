"""Declarative data-quality audit (north-star pipeline extension).

The reference enforces integrity with PostgreSQL constraints — PK/UNIQUE
(``/root/reference/sql/01_schema.sql:10-11,26-27,33-34``), NOT NULL
(``sql/01_schema.sql:12,28,35``), cascading FKs
(``sql/01_schema.sql:46-47,57-58``) — and a printed duplicate report
(``02_etl.py:233-244``). Spark tables have no enforced constraints, so
at pipeline scale the equivalent is an *audit operator*: declare the
rules, get back one row per rule with its violation count, gate the
load on the result.

Scale posture: every row-level rule (not-null, range, custom predicate)
and every uniqueness rule is folded into ONE conditional aggregation
over a single scan — `count(*) - count(distinct keys)` gives duplicate
cardinality without a second pass (Catalyst plans the distincts via
Expand, still one shuffle). Referential rules each add one left-anti
probe against the (broadcast) parent key set; no driver-side collects
anywhere.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def audit(
    df: DataFrame,
    *,
    not_null: Sequence[str] = (),
    unique: Sequence[Sequence[str]] = (),
    ranges: dict[str, tuple[float, float]] | None = None,
    checks: dict[str, Column] | None = None,
    foreign_keys: Sequence[tuple[str, DataFrame, str]] = (),
) -> DataFrame:
    """Evaluate declared rules over ``df``; one output row per rule:
    ``(check STRING, n_violations BIGINT)``, ordered by check name.

    - ``not_null``: columns that must not contain NULL.
    - ``unique``: key-column groups that must be duplicate-free; the
      count reported is the number of EXTRA rows (total - distinct), the
      same number a dedup pass would remove. Rows where ANY key column
      is NULL are excluded from the check entirely (SQL semantics: NULL
      never equals NULL, so such rows cannot be confident duplicates —
      policing them is ``not_null``'s job).
    - ``ranges``: ``col -> (lo, hi)`` inclusive bounds; NULLs are not
      range violations (they are ``not_null``'s job).
    - ``checks``: named boolean Columns that must hold per row (the
      escape hatch for arbitrary predicates).
    - ``foreign_keys``: ``(child_col, parent_df, parent_col)`` — child
      values (non-null) that have no match in the parent key set.
    """
    aggs: list[Column] = []
    for c in not_null:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"not_null:{c}")
        )
    for keys in unique:
        keys = list(keys)
        label = "unique:" + ",".join(keys)
        aggs.append(
            (
                F.count(F.lit(1))
                - F.countDistinct(*[F.col(k) for k in keys])
                - F.sum(  # count(distinct k1..kn) skips rows where ANY
                    # key is NULL; subtract exactly those rows so they
                    # don't inflate the duplicate count
                    F.when(
                        F.lit(True)
                        & F.expr(
                            " OR ".join(f"{k} IS NULL" for k in keys)
                        ),
                        1,
                    ).otherwise(0)
                )
            ).alias(label)
        )
    for c, (lo, hi) in (ranges or {}).items():
        bad = F.col(c).isNotNull() & (~F.col(c).between(F.lit(lo), F.lit(hi)))
        aggs.append(F.sum(F.when(bad, 1).otherwise(0)).alias(f"range:{c}"))
    for name, cond in (checks or {}).items():
        aggs.append(
            F.sum(F.when(~F.coalesce(cond, F.lit(False)), 1).otherwise(0)).alias(
                f"check:{name}"
            )
        )

    parts: list[DataFrame] = []
    if aggs:
        wide = df.agg(*aggs)
        stack = ", ".join(
            f"'{c}', `{c}`" for c in wide.columns
        )
        parts.append(
            wide.selectExpr(
                f"stack({len(wide.columns)}, {stack}) as (check, n_violations)"
            )
        )
    for child_col, parent, parent_col in foreign_keys:
        orphans = (
            df.select(F.col(child_col))
            .where(F.col(child_col).isNotNull())
            .join(
                F.broadcast(parent.select(F.col(parent_col).alias(child_col)).distinct()),
                child_col,
                "left_anti",
            )
            .agg(F.count(F.lit(1)).alias("n_violations"))
            .select(
                F.lit(f"fk:{child_col}").alias("check"), F.col("n_violations")
            )
        )
        parts.append(orphans)

    if not parts:
        raise ValueError("audit() called with no rules")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "check", F.col("n_violations").cast("bigint").alias("n_violations")
    ).orderBy("check")


def volume_anomaly(
    df: DataFrame,
    ts_col: str = "ts",
    z_threshold: float = 2.0,
) -> DataFrame:
    """Daily-volume anomaly report: each day's row count z-scored
    against the mean/std of all days — the load-gate that catches a
    silently-dropped upstream partition (volume crater) or a
    double-delivery (spike) before a bad day poisons a training run.

    Exact cross-engine arithmetic: variance is derived from the three
    integer power sums (n, Σc, Σc²) — order-independent BIGINT
    aggregates — in ONE fixed IEEE expression,
    ``(Σc² − (Σc)²/n) / (n−1)``, rather than a streaming/Welford
    aggregate whose rounding depends on partition order. sqrt is
    correctly rounded by IEEE 754, so identical inputs give an
    identical z on any engine at any parallelism.

    Plan shape: one map-side-combining count per day (shuffle domain =
    distinct days), a 1-row power-sum aggregate broadcast back over the
    daily relation. Nothing scales with raw event rows past the first
    aggregate."""
    daily = df.groupBy(F.to_date(F.col(ts_col)).alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events")
    )
    stats = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("n_events").alias("sum_c"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("sum_c2"),
    )
    mean = F.col("sum_c").cast("double") / F.col("n_days")
    var = (
        F.col("sum_c2").cast("double")
        - F.col("sum_c").cast("double") * F.col("sum_c").cast("double") / F.col("n_days")
    ) / (F.col("n_days") - F.lit(1))
    z = (F.col("n_events").cast("double") - mean) / F.sqrt(var)
    return (
        daily.crossJoin(F.broadcast(stats))
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_events",
            F.round(z, 6).alias("z"),
            (F.abs(z) > F.lit(z_threshold)).alias("is_anomaly"),
        )
        .orderBy("day")
    )


def dlq_split(
    df: DataFrame,
    json_col: str,
    schema: str,
    corrupt_col: str = "_corrupt_record",
) -> tuple[DataFrame, DataFrame]:
    """Dead-letter routing for embedded JSON: parse ``json_col`` with
    ``schema`` and split the relation into (ok, quarantine).

    The reference aborts the whole load on one bad payload
    (``/root/reference/02_etl.py:26-28`` raises on any non-200 /
    unparseable body); at pipeline scale a poison record must cost one
    row, not the job. Spark's PERMISSIVE parser captures the raw text
    of any malformed payload into the corrupt-record column when the
    schema declares it — so ``ok`` rows carry the typed struct and
    ``quarantine`` rows carry the original bytes for replay, the DLQ
    contract.

    Semantics: a payload is quarantined iff it is not well-formed JSON.
    A well-formed object MISSING declared fields stays on the ok side
    with typed NULLs (schema drift is data, not poison — the additive
    evolution stance of ``operators/cow``). Both outputs are lazy
    row-filters over one shared parse projection: two consumers of one
    scan, no shuffle, trivially codegen'd; at 100 TB the quarantine
    side is ~empty and costs nothing to carry.
    """
    parsed = dlq_parse(df, json_col, schema, corrupt_col)
    bad_flag = F.col(f"__parsed.{corrupt_col}").isNotNull() | F.col("__parsed").isNull()
    ok = (
        parsed.where(~bad_flag)
        .withColumn("__parsed", F.col("__parsed").dropFields(corrupt_col))
        .withColumnRenamed("__parsed", "parsed")
    )
    quarantine = parsed.where(bad_flag).drop("__parsed")
    return ok, quarantine


def dlq_parse(
    df: DataFrame,
    json_col: str,
    schema: str,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """The shared parse projection under ``dlq_split``: one
    ``from_json`` with the corrupt-record column declared, emitted as
    ``__parsed``. Exposed separately so single-pass consumers (e.g. a
    routing REPORT, which needs counts of both sides) can fold the
    ok/bad distinction into one conditional aggregation over one scan
    instead of re-scanning per side."""
    return df.withColumn(
        "__parsed",
        F.from_json(
            F.col(json_col),
            f"{schema}, {corrupt_col} STRING",
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": corrupt_col},
        ),
    )


def mad_outlier_report(
    df: DataFrame, keys: Sequence[str], col: str, k: int = 5
) -> DataFrame:
    """Robust per-group outlier gate: flag rows more than ``k`` median-
    absolute-deviations from their group median — the load-screening
    rule that, unlike mean/stddev gates, a few extreme rows cannot drag
    (50% breakdown point vs 0%).

    Exactness: ``col`` must be integer-valued (cents discipline). The
    median of int64s is x.0 or x.5 — exact in binary double; deviations
    are then halves, their median is quarters — still exact binary, so
    every comparison (`dev > k·mad`) is engine- and partition-exact and
    the whole report is oracle-checkable. No approx_percentile drift.

    Plan: one (keys) median pass, one join back + deviation median pass,
    one conditional count — the per-key stats relation is broadcast for
    the flagging join.
    """
    klist = list(keys)
    med = df.groupBy(*klist).agg(
        F.median(F.col(col)).alias("__med"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
    )
    with_dev = df.join(F.broadcast(med), klist).withColumn(
        "__dev", F.abs(F.col(col) - F.col("__med"))
    )
    mad = with_dev.groupBy(*klist).agg(F.median("__dev").alias("__mad"))
    flagged = (
        with_dev.join(F.broadcast(mad), klist)
        .groupBy(*klist)
        .agg(
            F.max("__med").alias("median_val"),
            F.max("__mad").alias("mad_val"),
            F.max("n_rows").alias("n_rows"),
            F.sum(
                F.when(F.col("__dev") > F.lit(k) * F.col("__mad"), 1).otherwise(0)
            ).cast("bigint").alias("n_outliers"),
        )
    )
    return flagged.select(*klist, "n_rows", "median_val", "mad_val", "n_outliers").orderBy(
        *klist
    )


def k_anonymity_report(
    df: DataFrame, quasi_cols: Sequence[str], k: int = 5
) -> DataFrame:
    """Privacy audit before a data release: group rows by the quasi-
    identifier combination and report how re-identifiable the table is —
    the k-anonymity check (Sweeney): any group smaller than ``k`` means
    those rows are isolatable by joining public attributes.

    Returns one row: group count, minimum group size (the table's
    actual k), number of violating groups (< k), and rows at risk.
    One two-phase groupBy on the quasi columns + a global aggregate of
    the (small) group-size relation — no row-level second pass.
    NULL quasi values form their own group (NULL-safe grouping), the
    conservative choice: "unknown" is itself a linkable value.
    """
    groups = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("n"))
    return groups.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.min("n").cast("bigint").alias("min_group_size"),
        F.sum(F.when(F.col("n") < k, 1).otherwise(0)).cast("bigint").alias("violating_groups"),
        F.sum(F.when(F.col("n") < k, F.col("n")).otherwise(0)).cast("bigint").alias("rows_at_risk"),
    )
