"""Round-4 wave 33: out-of-fold target encoding and the grouped-split
leakage audit — the two cross-validation hygiene operators.

Determinism contract unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.functions import portable_hash as ph
from movie_data_etl_pipeline_spark.functions import scalar as SC
from movie_data_etl_pipeline_spark.sources import load_table

_OOF_K = 5


def fe_oof_target_encode(spark: SparkSession, sf: str) -> DataFrame:
    """OUT-OF-FOLD target encoding — the K-fold generalization of
    `fe_target_encode`'s leave-one-out: each (category, fold) cell is
    encoded with the mean target computed over the category's rows in
    the OTHER folds, (S_cat − S_cat,fold)/(n_cat − n_cat,fold). This
    is the encoder real CV pipelines use: leave-one-out still leaks
    fold-level statistics into validation rows; out-of-fold leaks
    nothing from a row's own fold. Folds come from the portable hash
    (`sa_kfold_assign`'s assignment), sums are exact cents, one
    division per cell snapped back to whole cents. The cell relation
    (|categories| × K) is metadata-sized: computing it is one fact
    aggregation, applying it a broadcast join — no fact shuffle."""
    o = load_table(spark, sf, "orders").select(
        F.col("o_orderpriority").alias("category"),
        (ph.mix(F.col("o_orderkey") % F.lit(ph.P)) % F.lit(_OOF_K)).alias("fold"),
        SC.cents("o_totalprice").alias("vc"),
    )
    cell = o.groupBy("category", "fold").agg(
        F.sum("vc").cast("bigint").alias("s_cf"),
        F.count(F.lit(1)).cast("bigint").alias("n_cf"),
    )
    cat = cell.groupBy("category").agg(
        F.sum("s_cf").cast("bigint").alias("s_c"),
        F.sum("n_cf").cast("bigint").alias("n_c"),
    )
    return (
        cell.join(cat, "category")
        .select(
            "category",
            F.col("fold").cast("bigint").alias("fold"),
            "n_cf",
            F.when(
                F.col("n_c") > F.col("n_cf"),
                F.round(
                    (F.col("s_c") - F.col("s_cf")).cast("double")
                    / (F.col("n_c") - F.col("n_cf")).cast("double")
                ).cast("bigint"),
            ).alias("oof_mean_c"),
        )
        .orderBy("category", "fold")
    )


_FE_OOF_SQL = f"""
WITH o AS (
  SELECT o_orderpriority AS category,
         {ph.sql_mix(f"o_orderkey % {ph.P}")} % {_OOF_K} AS fold,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS vc
  FROM orders
),
cell AS (
  SELECT category, fold, CAST(SUM(vc) AS BIGINT) AS s_cf,
         COUNT(*)::BIGINT AS n_cf
  FROM o GROUP BY 1, 2
),
cat AS (
  SELECT category, CAST(SUM(s_cf) AS BIGINT) AS s_c,
         CAST(SUM(n_cf) AS BIGINT) AS n_c
  FROM cell GROUP BY 1
)
SELECT cell.category, CAST(cell.fold AS BIGINT) AS fold, cell.n_cf,
       CASE WHEN cat.n_c > cell.n_cf
            THEN CAST(ROUND(CAST(cat.s_c - cell.s_cf AS DOUBLE)
                            / CAST(cat.n_c - cell.n_cf AS DOUBLE)) AS BIGINT)
       END AS oof_mean_c
FROM cell JOIN cat USING (category)
ORDER BY category, fold
"""


def sa_group_kfold_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Grouped-split leakage audit: fold orders two ways — naively by
    order key, and GROUPED by customer (every order of a customer in
    one fold, the GroupKFold contract) — and count, for each scheme,
    the customers whose orders SPAN multiple folds. Row-level splits
    of grouped data are the classic silent CV leak (a customer's
    behavior sits in both train and validation); the grouped scheme
    must audit to exactly zero spanning groups, and the naive number
    says how bad the leak would have been. Both assignments are pure
    row-local portable-hash functions; the audit is one two-key
    aggregation per scheme."""
    o = load_table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    naive = o.select(
        "o_custkey",
        (ph.mix(F.col("o_orderkey") % F.lit(ph.P)) % F.lit(_OOF_K)).alias("fold"),
    )
    grouped = o.select(
        "o_custkey",
        (ph.mix(F.col("o_custkey") % F.lit(ph.P)) % F.lit(_OOF_K)).alias("fold"),
    )
    outs = []
    for tag, df in (("naive_by_order", naive), ("grouped_by_customer", grouped)):
        spans = (
            df.groupBy("o_custkey")
            .agg(F.countDistinct("fold").alias("nf"))
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_groups"),
                F.sum((F.col("nf") > 1).cast("bigint")).cast("bigint").alias("n_spanning"),
            )
            .select(
                F.lit(tag).alias("scheme"),
                "n_groups",
                F.coalesce("n_spanning", F.lit(0)).cast("bigint").alias("n_spanning"),
            )
        )
        outs.append(spans)
    return outs[0].unionAll(outs[1]).orderBy("scheme")


_SA_GROUP_SQL = f"""
WITH naive AS (
  SELECT o_custkey, {ph.sql_mix(f"o_orderkey % {ph.P}")} % {_OOF_K} AS fold
  FROM orders
),
grouped AS (
  SELECT o_custkey, {ph.sql_mix(f"o_custkey % {ph.P}")} % {_OOF_K} AS fold
  FROM orders
),
a AS (
  SELECT 'naive_by_order' AS scheme, COUNT(*)::BIGINT AS n_groups,
         CAST(SUM(CASE WHEN nf > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_spanning
  FROM (SELECT o_custkey, COUNT(DISTINCT fold) AS nf FROM naive GROUP BY 1)
),
b AS (
  SELECT 'grouped_by_customer' AS scheme, COUNT(*)::BIGINT AS n_groups,
         CAST(SUM(CASE WHEN nf > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_spanning
  FROM (SELECT o_custkey, COUNT(DISTINCT fold) AS nf FROM grouped GROUP BY 1)
)
SELECT * FROM a UNION ALL SELECT * FROM b ORDER BY scheme
"""


QUERIES = {
    "fe_oof_target_encode": fe_oof_target_encode,
    "sa_group_kfold_audit": sa_group_kfold_audit,
}

ORACLES = {
    "fe_oof_target_encode": _FE_OOF_SQL,
    "sa_group_kfold_audit": _SA_GROUP_SQL,
}
