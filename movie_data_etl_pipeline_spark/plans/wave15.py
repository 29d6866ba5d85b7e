"""Round-3 wave 15: classifier evaluation (confusion metrics),
FP&A decomposition (price/volume/mix), and credit-scoring encoding
(weight of evidence + information value).

Determinism contract unchanged: integer counts until one final IEEE
expression per value; the IV sum crosses rows only as nano-snapped
integers (the session-entropy discipline for ln-valued terms).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.functions import scalar as SC
from movie_data_etl_pipeline_spark.operators import text_analysis
from movie_data_etl_pipeline_spark.sources import load_table


# ---------------------------------------------------------------------------
# tx_langid_confusion — language-ID quality metrics
# ---------------------------------------------------------------------------


def tx_langid_confusion(spark: SparkSession, sf: str) -> DataFrame:
    """Per-class precision / recall / F1 of the marker-heuristic
    language identifier against the declared label — the evaluation
    table that turns `tx_language_id`'s raw predictions into a
    model-quality readout (and the template for scoring ANY
    classifier column against a label column at scale).

    All three metrics are ratios of exact integer counts; F1 uses the
    2·tp/(n_true+n_pred) form so it is ONE division too. Count grain
    is the language-pair matrix (catalog-bounded)."""
    pred = text_analysis.language_id(load_table(spark, sf, "documents"))
    cm = pred.groupBy("declared_lang", "predicted_lang").agg(
        F.count(F.lit(1)).alias("n")
    )
    truth = cm.groupBy("declared_lang").agg(F.sum("n").alias("n_true"))
    guessed = cm.groupBy(F.col("predicted_lang").alias("declared_lang")).agg(
        F.sum("n").alias("n_pred")
    )
    tp = cm.filter(F.col("declared_lang") == F.col("predicted_lang")).select(
        "declared_lang", F.col("n").alias("tp")
    )
    return (
        truth.join(guessed, "declared_lang", "full_outer")
        .join(tp, "declared_lang", "left")
        .select(
            F.col("declared_lang").alias("lang"),
            F.coalesce("n_true", F.lit(0)).alias("n_true"),
            F.coalesce("n_pred", F.lit(0)).alias("n_pred"),
            F.coalesce("tp", F.lit(0)).alias("tp"),
        )
        .select(
            "lang",
            "n_true",
            "n_pred",
            "tp",
            F.when(
                F.col("n_pred") > 0,
                F.round(F.col("tp") / F.col("n_pred").cast("double"), 6),
            ).alias("precision"),
            F.when(
                F.col("n_true") > 0,
                F.round(F.col("tp") / F.col("n_true").cast("double"), 6),
            ).alias("recall"),
            F.when(
                F.col("n_true") + F.col("n_pred") > 0,
                F.round(
                    2 * F.col("tp") / (F.col("n_true") + F.col("n_pred")).cast("double"),
                    6,
                ),
            ).alias("f1"),
        )
        .orderBy("lang")
    )


_TX_CONF_SQL = """
WITH pred AS (
  SELECT lang AS declared_lang,
         CASE WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
              WHEN regexp_matches(text, '[äöüßÄÖÜ]|\\b(der|die|das|und|nicht|ist)\\b') THEN 'de'
              WHEN regexp_matches(text, '[àâçéèêëîïôùûœ]|\\b(le|la|les|est|dans|pour)\\b') THEN 'fr'
              WHEN regexp_matches(text, '[áéíóúñ¿¡]|\\b(el|los|las|es|para|como)\\b') THEN 'es'
              ELSE 'en' END AS predicted_lang
  FROM documents
),
cm AS (
  SELECT declared_lang, predicted_lang, COUNT(*) AS n FROM pred GROUP BY 1, 2
),
truth AS (SELECT declared_lang, CAST(SUM(n) AS BIGINT) AS n_true FROM cm GROUP BY 1),
guessed AS (SELECT predicted_lang AS declared_lang, CAST(SUM(n) AS BIGINT) AS n_pred
            FROM cm GROUP BY 1),
tp AS (SELECT declared_lang, CAST(n AS BIGINT) AS tp FROM cm
       WHERE declared_lang = predicted_lang)
SELECT COALESCE(t.declared_lang, g.declared_lang) AS lang,
       COALESCE(t.n_true, 0) AS n_true,
       COALESCE(g.n_pred, 0) AS n_pred,
       COALESCE(p.tp, 0) AS tp,
       CASE WHEN COALESCE(g.n_pred, 0) > 0
            THEN ROUND(CAST(COALESCE(p.tp, 0) AS DOUBLE) / g.n_pred, 6) END
         AS precision,
       CASE WHEN COALESCE(t.n_true, 0) > 0
            THEN ROUND(CAST(COALESCE(p.tp, 0) AS DOUBLE) / t.n_true, 6) END
         AS recall,
       CASE WHEN COALESCE(t.n_true, 0) + COALESCE(g.n_pred, 0) > 0
            THEN ROUND(2.0 * COALESCE(p.tp, 0)
                       / (COALESCE(t.n_true, 0) + COALESCE(g.n_pred, 0)), 6) END
         AS f1
FROM truth t
FULL OUTER JOIN guessed g ON t.declared_lang = g.declared_lang
LEFT JOIN tp p ON COALESCE(t.declared_lang, g.declared_lang) = p.declared_lang
"""


# ---------------------------------------------------------------------------
# ag_price_volume_mix — revenue-change decomposition
# ---------------------------------------------------------------------------

_PVM_Y1, _PVM_Y2 = 1996, 1997


def ag_price_volume_mix(spark: SparkSession, sf: str) -> DataFrame:
    """FP&A revenue-bridge decomposition per order priority: the
    1996→1997 revenue change split into a VOLUME effect
    ((n₂−n₁)·m₁) and a PRICE effect (n₂·(m₂−m₁)), with the rounding
    residue reported rather than hidden — the 'why did revenue move'
    answer a plain YoY delta (`w9_yoy_change`) cannot give.

    Means are snapped to whole cents before the effects, so every
    effect is exact integer arithmetic and volume + price + residue
    = Δrevenue holds EXACTLY. One conditional aggregation per
    priority."""
    o = load_table(spark, sf, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        F.year("o_orderdate").alias("y"),
        SC.cents("o_totalprice").alias("vc"),
    ).filter(F.col("y").isin(_PVM_Y1, _PVM_Y2))
    g = o.groupBy("priority").agg(
        F.sum(F.when(F.col("y") == _PVM_Y1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("y") == _PVM_Y1, F.col("vc")).otherwise(0)).alias("s1"),
        F.sum(F.when(F.col("y") == _PVM_Y2, 1).otherwise(0)).alias("n2"),
        F.sum(F.when(F.col("y") == _PVM_Y2, F.col("vc")).otherwise(0)).alias("s2"),
    )
    m1 = F.round(F.col("s1") / F.col("n1").cast("double")).cast("bigint")
    m2 = F.round(F.col("s2") / F.col("n2").cast("double")).cast("bigint")
    withm = g.withColumn("m1", m1).withColumn("m2", m2)
    vol = (F.col("n2") - F.col("n1")) * F.col("m1")
    price = F.col("n2") * (F.col("m2") - F.col("m1"))
    delta = F.col("s2") - F.col("s1")
    return withm.select(
        "priority",
        "n1",
        "n2",
        delta.alias("delta_c"),
        vol.alias("volume_effect_c"),
        price.alias("price_effect_c"),
        (delta - vol - price).alias("residual_c"),
    ).orderBy("priority")


_AG_PVM_SQL = f"""
WITH g AS (
  SELECT o_orderpriority AS priority,
         CAST(SUM(CASE WHEN YEAR(o_orderdate) = {_PVM_Y1} THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN YEAR(o_orderdate) = {_PVM_Y1}
                       THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS s1,
         CAST(SUM(CASE WHEN YEAR(o_orderdate) = {_PVM_Y2} THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         CAST(SUM(CASE WHEN YEAR(o_orderdate) = {_PVM_Y2}
                       THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS s2
  FROM orders
  WHERE YEAR(o_orderdate) IN ({_PVM_Y1}, {_PVM_Y2})
  GROUP BY 1
),
m AS (
  SELECT *,
         CAST(ROUND(CAST(s1 AS DOUBLE) / n1) AS BIGINT) AS m1,
         CAST(ROUND(CAST(s2 AS DOUBLE) / n2) AS BIGINT) AS m2
  FROM g
)
SELECT priority, n1, n2,
       s2 - s1 AS delta_c,
       (n2 - n1) * m1 AS volume_effect_c,
       n2 * (m2 - m1) AS price_effect_c,
       (s2 - s1) - (n2 - n1) * m1 - n2 * (m2 - m1) AS residual_c
FROM m
"""


# ---------------------------------------------------------------------------
# fe_woe_iv — weight of evidence + information value
# ---------------------------------------------------------------------------

_WOE_EVENT_CENTS = 15_000_000  # "high-value order" label threshold


def fe_woe_iv(spark: SparkSession, sf: str) -> DataFrame:
    """Weight-of-evidence encoding of order priority against the
    high-value-order label, plus the feature's information value —
    the credit-scoring standard for judging whether a categorical
    predictor carries signal (IV < 0.02 ≈ useless, > 0.3 ≈ strong).

    WoE_cat = ln((good_cat·B)/(bad_cat·G)) as ONE ln over exact
    integers; each category's IV term is nano-snapped BEFORE the
    cross-category sum, so the total is an integer sum (no float
    aggregation). Category grain throughout after one conditional
    aggregation."""
    o = load_table(spark, sf, "orders").select(
        F.col("o_orderpriority").alias("category"),
        (SC.cents("o_totalprice") > _WOE_EVENT_CENTS).alias("ev"),
    )
    g = o.groupBy("category").agg(
        F.sum(F.col("ev").cast("bigint")).alias("good"),
        F.sum((~F.col("ev")).cast("bigint")).alias("bad"),
    )
    tot = g.agg(F.sum("good").alias("gg"), F.sum("bad").alias("bb"))
    woe = F.log(
        (F.col("good") * F.col("bb")).cast("double")
        / (F.col("bad") * F.col("gg")).cast("double")
    )
    terms = (
        g.crossJoin(F.broadcast(tot))
        .withColumn("woe", woe)
        .withColumn(
            "iv_term_n",
            F.round(
                F.lit(1e9)
                * (
                    F.col("good") / F.col("gg").cast("double")
                    - F.col("bad") / F.col("bb").cast("double")
                )
                * F.col("woe")
            ).cast("bigint"),
        )
    )
    iv = terms.agg(F.sum("iv_term_n").alias("ivn"))
    return (
        terms.crossJoin(F.broadcast(iv))
        .select(
            "category",
            "good",
            "bad",
            F.round("woe", 6).alias("woe"),
            F.round(F.col("ivn") / 1e9, 6).alias("iv"),
        )
        .orderBy("category")
    )


_FE_WOE_SQL = f"""
WITH o AS (
  SELECT o_orderpriority AS category,
         (CAST(ROUND(o_totalprice * 100) AS BIGINT) > {_WOE_EVENT_CENTS}) AS ev
  FROM orders
),
g AS (
  SELECT category,
         CAST(SUM(CASE WHEN ev THEN 1 ELSE 0 END) AS BIGINT) AS good,
         CAST(SUM(CASE WHEN ev THEN 0 ELSE 1 END) AS BIGINT) AS bad
  FROM o GROUP BY 1
),
tot AS (SELECT CAST(SUM(good) AS BIGINT) AS gg, CAST(SUM(bad) AS BIGINT) AS bb FROM g),
terms AS (
  SELECT g.*, tot.gg, tot.bb,
         LN(CAST(g.good * tot.bb AS DOUBLE) / CAST(g.bad * tot.gg AS DOUBLE)) AS woe,
         CAST(ROUND(1e9 * (CAST(g.good AS DOUBLE) / tot.gg
                           - CAST(g.bad AS DOUBLE) / tot.bb)
                    * LN(CAST(g.good * tot.bb AS DOUBLE)
                         / CAST(g.bad * tot.gg AS DOUBLE))) AS BIGINT) AS iv_term_n
  FROM g, tot
),
iv AS (SELECT CAST(SUM(iv_term_n) AS BIGINT) AS ivn FROM terms)
SELECT category, good, bad,
       ROUND(woe, 6) AS woe,
       ROUND(ivn / 1e9, 6) AS iv
FROM terms, iv
"""


QUERIES = {
    "tx_langid_confusion": tx_langid_confusion,
    "ag_price_volume_mix": ag_price_volume_mix,
    "fe_woe_iv": fe_woe_iv,
}

ORACLES = {
    "tx_langid_confusion": _TX_CONF_SQL,
    "ag_price_volume_mix": _AG_PVM_SQL,
    "fe_woe_iv": _FE_WOE_SQL,
}
