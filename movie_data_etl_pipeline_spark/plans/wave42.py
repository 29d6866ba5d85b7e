"""Round-4 wave 42: JSON-function surface and the conditional /
null-handling scalar surface.

Determinism contract: both engines render the SAME compact JSON text
for identically-ordered structs (probed before authoring); every
extraction result is a scalar pinned value-for-value; conditionals
are pure integer/string expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.sources import load_table


def fn_json_surface(spark: SparkSession, sf: str) -> DataFrame:
    """JSON-function surface: build a compact JSON document per row
    from typed columns (to_json over an ordered struct — byte-identical
    in both engines), then probe path extraction (scalar, string,
    array index, nested field), array length, and round-tripping,
    pinned value-for-value on the key-pruned part scan. Map-only."""
    p = load_table(spark, sf, "part").filter(F.col("p_partkey") < 200)
    k = F.col("p_partkey").cast("bigint")
    doc = F.to_json(
        F.struct(
            k.alias("k"),
            F.col("p_brand").alias("brand"),
            F.array(k % 3, k % 5, k % 7).alias("mods"),
            F.struct(
                F.col("p_size").cast("bigint").alias("size"),
                F.substring("p_type", 1, 6).alias("ty"),
            ).alias("sub"),
        )
    )
    j = p.select(k.alias("k"), doc.alias("j"))
    return j.select(
        "k",
        "j",
        F.get_json_object("j", "$.brand").alias("brand"),
        F.get_json_object("j", "$.k").cast("bigint").alias("k_back"),
        F.get_json_object("j", "$.mods[1]").cast("bigint").alias("mod1"),
        F.json_array_length(F.get_json_object("j", "$.mods"))
        .cast("bigint")
        .alias("n_mods"),
        F.get_json_object("j", "$.sub.size").cast("bigint").alias("sub_size"),
        F.get_json_object("j", "$.sub.ty").alias("sub_ty"),
        F.get_json_object("j", "$.missing").alias("missing_field"),
        F.length("j").cast("bigint").alias("j_len"),
    ).orderBy("k")


_FN_JSON_SQL = """
WITH j AS (
  SELECT CAST(p_partkey AS BIGINT) AS k,
         to_json(struct_pack(
           k := CAST(p_partkey AS BIGINT),
           brand := p_brand,
           mods := [CAST(p_partkey AS BIGINT) % 3,
                    CAST(p_partkey AS BIGINT) % 5,
                    CAST(p_partkey AS BIGINT) % 7],
           sub := struct_pack(
             size := CAST(p_size AS BIGINT),
             ty := substring(p_type, 1, 6))
         ))::VARCHAR AS j
  FROM part WHERE p_partkey < 200
)
SELECT k, j,
       json_extract_string(j, '$.brand') AS brand,
       CAST(json_extract(j, '$.k') AS BIGINT) AS k_back,
       CAST(json_extract(j, '$.mods[1]') AS BIGINT) AS mod1,
       CAST(json_array_length(j, '$.mods') AS BIGINT) AS n_mods,
       CAST(json_extract(j, '$.sub.size') AS BIGINT) AS sub_size,
       json_extract_string(j, '$.sub.ty') AS sub_ty,
       json_extract_string(j, '$.missing') AS missing_field,
       CAST(length(j) AS BIGINT) AS j_len
FROM j
ORDER BY k
"""


def _tvl(b) -> F.Column:
    """Render a three-valued boolean as 'true'/'false'/'unknown'."""
    return F.when(b.isNull(), "unknown").when(b, "true").otherwise("false")


def fn_conditional_surface(spark: SparkSession, sf: str) -> DataFrame:
    """Conditional / null-handling surface: CASE (simple + searched),
    COALESCE over synthesized NULLs, NULLIF, IFNULL, LEAST/GREATEST
    (including their null-skipping behavior), and boolean algebra
    under three-valued logic — pinned value-for-value. The NULLs are
    data-derived (NULLIF), so the probe exercises real null paths, not
    literals the optimizer folds away. Map-only."""
    p = load_table(spark, sf, "part").filter(F.col("p_partkey") < 300)
    k = F.col("p_partkey").cast("bigint")
    sz = F.col("p_size").cast("bigint")
    # data-derived NULL: size 25 -> NULL
    nsz = F.nullif(sz, F.lit(25))
    return p.select(
        k.alias("k"),
        sz.alias("sz"),
        nsz.alias("nullable_sz"),
        F.coalesce(nsz, k % 10).alias("coal"),
        F.ifnull(nsz, F.lit(-1)).alias("ifn"),
        F.when(sz < 10, "small")
        .when(sz < 30, "medium")
        .otherwise("large")
        .alias("size_class"),
        F.least(k % 13, sz, F.lit(9).cast("bigint")).alias("least3"),
        F.greatest(k % 13, sz, F.lit(9).cast("bigint")).alias("greatest3"),
        F.least(nsz, sz).alias("least_nullskip"),
        # three-valued logic rendered to explicit strings (a NULL
        # boolean's textual rendering differs across engines)
        _tvl(nsz > 20).alias("tvl_gt"),
        _tvl((nsz > 20) | (sz > 20)).alias("tvl_or"),
        _tvl((nsz > 20) & (sz > 20)).alias("tvl_and"),
        F.nvl2(nsz, F.lit("has"), F.lit("null")).alias("nvl2_tag"),
    ).orderBy("k")


_FN_COND_SQL = """
SELECT CAST(p_partkey AS BIGINT) AS k,
       CAST(p_size AS BIGINT) AS sz,
       nullif(CAST(p_size AS BIGINT), 25) AS nullable_sz,
       COALESCE(nullif(CAST(p_size AS BIGINT), 25),
                CAST(p_partkey AS BIGINT) % 10) AS coal,
       ifnull(nullif(CAST(p_size AS BIGINT), 25), -1) AS ifn,
       CASE WHEN p_size < 10 THEN 'small'
            WHEN p_size < 30 THEN 'medium'
            ELSE 'large' END AS size_class,
       LEAST(CAST(p_partkey AS BIGINT) % 13, CAST(p_size AS BIGINT),
             CAST(9 AS BIGINT)) AS least3,
       GREATEST(CAST(p_partkey AS BIGINT) % 13, CAST(p_size AS BIGINT),
                CAST(9 AS BIGINT)) AS greatest3,
       LEAST(nullif(CAST(p_size AS BIGINT), 25),
             CAST(p_size AS BIGINT)) AS least_nullskip,
       CASE WHEN (nullif(CAST(p_size AS BIGINT), 25) > 20) IS NULL THEN 'unknown'
            WHEN nullif(CAST(p_size AS BIGINT), 25) > 20 THEN 'true'
            ELSE 'false' END AS tvl_gt,
       CASE WHEN (nullif(CAST(p_size AS BIGINT), 25) > 20 OR p_size > 20) IS NULL
              THEN 'unknown'
            WHEN (nullif(CAST(p_size AS BIGINT), 25) > 20 OR p_size > 20)
              THEN 'true'
            ELSE 'false' END AS tvl_or,
       CASE WHEN (nullif(CAST(p_size AS BIGINT), 25) > 20 AND p_size > 20) IS NULL
              THEN 'unknown'
            WHEN (nullif(CAST(p_size AS BIGINT), 25) > 20 AND p_size > 20)
              THEN 'true'
            ELSE 'false' END AS tvl_and,
       CASE WHEN nullif(CAST(p_size AS BIGINT), 25) IS NOT NULL
            THEN 'has' ELSE 'null' END AS nvl2_tag
FROM part
WHERE p_partkey < 300
ORDER BY k
"""


QUERIES = {
    "fn_json_surface": fn_json_surface,
    "fn_conditional_surface": fn_conditional_surface,
}

ORACLES = {
    "fn_json_surface": _FN_JSON_SQL,
    "fn_conditional_surface": _FN_COND_SQL,
}
