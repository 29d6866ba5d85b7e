"""Round-4 wave 47: SCD2 validity-interval integrity audit.

Determinism contract: interval comparisons are string-date equality /
ordering on exact literals; all outputs are exact integer counts and
id checksums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.operators import merge
from movie_data_etl_pipeline_spark.sources import load_table


def qa_scd2_integrity(spark: SparkSession, sf: str) -> DataFrame:
    """Integrity audit of a versioned (SCD2) dimension — the invariant
    check a warehouse runs after every history merge: per key, sorted
    versions must tile time with NO overlap (next valid_from <
    current valid_to), NO gap (next valid_from > current valid_to),
    and EXACTLY ONE open version (valid_to IS NULL, and only in last
    position). Input is the same `merge.scd2_apply` history as
    `o10_scd2_history`, so the audit doubles as a machine-checked
    post-condition of the merge operator; a healthy corpus reports
    zero violation keys. One per-key window pass + one rollup."""
    customer = load_table(spark, sf, "customer").select("c_custkey", "c_acctbal")
    current = customer.withColumn("valid_from", F.lit("2020-01-01")).withColumn(
        "valid_to", F.lit(None).cast("string")
    )
    changes = customer.filter(
        (F.col("c_custkey") % 3 == 0) | (F.col("c_custkey") % 5 == 1)
    ).withColumn(
        "c_acctbal",
        F.when(F.col("c_custkey") % 3 == 0, F.col("c_acctbal") + 100).otherwise(
            F.col("c_acctbal")
        ),
    )
    hist = merge.scd2_apply(
        current, changes, ["c_custkey"], ["c_acctbal"], F.lit("2021-01-01")
    )
    w = Window.partitionBy("c_custkey").orderBy(
        "valid_from", F.col("valid_to").asc_nulls_last()
    )
    flagged = hist.select(
        "c_custkey",
        "valid_from",
        "valid_to",
        F.lead("valid_from").over(w).alias("next_from"),
    ).select(
        "c_custkey",
        F.when(
            F.col("next_from").isNotNull()
            & (F.col("valid_to").isNull() | (F.col("next_from") < F.col("valid_to"))),
            1,
        )
        .otherwise(0)
        .alias("overlap"),
        F.when(
            F.col("next_from").isNotNull()
            & F.col("valid_to").isNotNull()
            & (F.col("next_from") > F.col("valid_to")),
            1,
        )
        .otherwise(0)
        .alias("gap"),
        F.col("valid_to").isNull().cast("int").alias("open_v"),
    )
    per_key = flagged.groupBy("c_custkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_versions"),
        F.sum("overlap").cast("bigint").alias("n_overlap"),
        F.sum("gap").cast("bigint").alias("n_gap"),
        F.sum("open_v").cast("bigint").alias("n_open"),
    )
    return per_key.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum("n_versions").cast("bigint").alias("n_versions"),
        F.sum((F.col("n_overlap") > 0).cast("bigint")).cast("bigint").alias("keys_overlap"),
        F.sum((F.col("n_gap") > 0).cast("bigint")).cast("bigint").alias("keys_gap"),
        F.sum((F.col("n_open") != 1).cast("bigint")).cast("bigint").alias("keys_bad_open"),
        F.sum(F.when(F.col("n_versions") > 1, F.col("c_custkey")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("multiversion_checksum"),
    )


_QA_SCD2_SQL = """
WITH hist AS (
  SELECT c_custkey, '2020-01-01' AS valid_from,
         CASE WHEN c_custkey % 3 = 0 THEN '2021-01-01' ELSE NULL END AS valid_to
  FROM customer
  UNION ALL
  SELECT c_custkey, '2021-01-01', NULL FROM customer WHERE c_custkey % 3 = 0
),
flagged AS (
  SELECT c_custkey,
         CASE WHEN next_from IS NOT NULL
                AND (valid_to IS NULL OR next_from < valid_to)
              THEN 1 ELSE 0 END AS overlap,
         CASE WHEN next_from IS NOT NULL AND valid_to IS NOT NULL
                AND next_from > valid_to
              THEN 1 ELSE 0 END AS gap,
         CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS open_v
  FROM (
    SELECT c_custkey, valid_from, valid_to,
           lead(valid_from) OVER (PARTITION BY c_custkey
             ORDER BY valid_from, valid_to NULLS LAST) AS next_from
    FROM hist
  )
),
per_key AS (
  SELECT c_custkey,
         COUNT(*)::BIGINT AS n_versions,
         CAST(SUM(overlap) AS BIGINT) AS n_overlap,
         CAST(SUM(gap) AS BIGINT) AS n_gap,
         CAST(SUM(open_v) AS BIGINT) AS n_open
  FROM flagged GROUP BY 1
)
SELECT COUNT(*)::BIGINT AS n_keys,
       CAST(SUM(n_versions) AS BIGINT) AS n_versions,
       CAST(SUM(CASE WHEN n_overlap > 0 THEN 1 ELSE 0 END) AS BIGINT) AS keys_overlap,
       CAST(SUM(CASE WHEN n_gap > 0 THEN 1 ELSE 0 END) AS BIGINT) AS keys_gap,
       CAST(SUM(CASE WHEN n_open <> 1 THEN 1 ELSE 0 END) AS BIGINT) AS keys_bad_open,
       CAST(SUM(CASE WHEN n_versions > 1 THEN c_custkey ELSE 0 END) AS BIGINT)
         AS multiversion_checksum
FROM per_key
"""


QUERIES = {
    "qa_scd2_integrity": qa_scd2_integrity,
}

ORACLES = {
    "qa_scd2_integrity": _QA_SCD2_SQL,
}
