"""Interleaved A/B of the round-11 optimization rewrites: each
rewritten query's OLD implementation (frozen verbatim below from git
f28674f, i.e. post-rotation / pre-rewrite HEAD) vs the NEW registry
implementation, alternated in ONE session (drift-immune — both
variants see the same box state), best-of-N with untimed warmup, and
VALUE EQUALITY asserted on every rep pair (sorted row tuples must
match exactly — these are the same outputs the DuckDB oracle hashes).

    python tools/ab_r11_opt.py [--sf SF_DIR] [--reps N] [--out OUT]
    python tools/ab_r11_opt.py --only ev_rfm
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.functions import scalar as SC
from movie_data_etl_pipeline_spark.operators import indexing
from movie_data_etl_pipeline_spark.plans import fixture_queries as FQ
from movie_data_etl_pipeline_spark.session import get_spark
from movie_data_etl_pipeline_spark.sources import load_table


# ---------------------------------------------------------------- old impls


def ev_rfm_old(spark: SparkSession, sf: str) -> DataFrame:
    """git f28674f form: three chained per-metric quartile rank passes."""
    o = load_table(spark, sf, "orders").select(
        "o_custkey", "o_orderdate", SC.cents("o_totalprice").alias("price_c")
    )
    ref = o.agg(F.max(F.col("o_orderdate").cast("date")).alias("ref_d"))
    agg = (
        o.groupBy("o_custkey")
        .agg(
            F.max(F.col("o_orderdate").cast("date")).alias("last_d"),
            F.count(F.lit(1)).cast("bigint").alias("frequency"),
            F.sum("price_c").cast("bigint").alias("monetary_c"),
        )
        .crossJoin(F.broadcast(ref))
        .select(
            "o_custkey",
            F.datediff("ref_d", "last_d").cast("bigint").alias("recency_days"),
            "frequency",
            "monetary_c",
        )
        .localCheckpoint(eager=True)
    )
    n = agg.count()

    def quart(df: DataFrame, order_cols: list[str], out: str) -> DataFrame:
        d = indexing.global_row_number(df, order_cols, out_col="__rn")
        return d.withColumn(
            out, ((F.col("__rn") - 1) * 4 / F.lit(n)).cast("bigint") + 1
        ).drop("__rn")

    agg = agg.withColumn("neg_f", -F.col("frequency")).withColumn(
        "neg_m", -F.col("monetary_c")
    )
    agg = quart(agg, ["recency_days", "o_custkey"], "r_q")
    agg = quart(agg, ["neg_f", "o_custkey"], "f_q")
    agg = quart(agg, ["neg_m", "o_custkey"], "m_q")
    return agg.select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary_c",
        "r_q",
        "f_q",
        "m_q",
        F.concat(
            F.col("r_q").cast("string"),
            F.col("f_q").cast("string"),
            F.col("m_q").cast("string"),
        ).alias("segment"),
    ).orderBy("o_custkey")


_PCA_DIMS = 8
_PCA_ROUNDS = 3


def emb_pca_power_old(spark: SparkSession, sf: str) -> DataFrame:
    """git f28674f form: fan-out + checkpointed m + per-round join/agg."""
    from movie_data_etl_pipeline_spark.sources.parquet import ensure_min_partitions

    emb = load_table(spark, sf, "embeddings").select(
        F.transform(
            F.col("embedding"),
            lambda x: F.round(x.cast("double") * 1e6).cast("bigint"),
        ).alias("e")
    )
    emb = ensure_min_partitions(emb)
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                F.lit(j).alias("j"),
                (F.element_at("e", i + 1) * F.element_at("e", j + 1)).alias("xy"),
                F.element_at("e", i + 1).alias("x"),
                F.element_at("e", j + 1).alias("y"),
            )
            for i in range(_PCA_DIMS)
            for j in range(_PCA_DIMS)
        ]
    )
    ex = emb.select(F.explode(cells).alias("c")).select(
        "c.i", "c.j", "c.xy", "c.x", "c.y"
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    nn = F.col("n").cast("double")
    cov = (
        (
            nn * F.col("sxy").cast("double")
            - F.col("sx").cast("double") * F.col("sy").cast("double")
        )
        / (nn * nn)
        / F.lit(1e12)
    )
    m = (
        ex.groupBy("i", "j")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(dec("xy")).alias("sxy"),
            F.sum(dec("x")).alias("sx"),
            F.sum(dec("y")).alias("sy"),
        )
        .select("i", "j", F.round(cov * 1e9).cast("bigint").alias("cov_n"))
        .localCheckpoint(eager=True)
    )
    v = spark.range(_PCA_DIMS).select(
        F.col("id").alias("j"), F.lit(10**9).cast("bigint").alias("vn")
    )
    norm_expr = None
    for _ in range(_PCA_ROUNDS):
        u = (
            m.join(v, "j")
            .groupBy("i")
            .agg(F.sum(dec("cov_n") * F.col("vn")).alias("u"))
        )
        one = u.groupBy().agg(
            *[
                F.max(F.when(F.col("i") == k, F.col("u").cast("double"))).alias(
                    f"u{k}"
                )
                for k in range(_PCA_DIMS)
            ]
        )
        sq = F.col("u0") * F.col("u0")
        for k in range(1, _PCA_DIMS):
            sq = sq + F.col(f"u{k}") * F.col(f"u{k}")
        one = one.withColumn("norm", F.sqrt(sq))
        norm_expr = one.select("norm")
        v = one.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(k).cast("bigint").alias("j"),
                            F.round(F.lit(1e9) * F.col(f"u{k}") / F.col("norm"))
                            .cast("bigint")
                            .alias("vn"),
                        )
                        for k in range(_PCA_DIMS)
                    ]
                )
            ).alias("s")
        ).select("s.j", "s.vn")
    lam = norm_expr.select(F.round(F.col("norm") / 1e18, 6).alias("lambda1"))
    return (
        v.crossJoin(F.broadcast(lam))
        .select(
            F.col("j").alias("i"),
            F.round(F.col("vn") / 1e9, 6).alias("v"),
            "lambda1",
        )
        .orderBy("i")
    )


def qa_release_gate_old(spark: SparkSession, sf: str) -> DataFrame:
    """git f28674f form: the four gates composed verbatim (five orders
    scans); the component gate queries are themselves unchanged in the
    registry, so they are called directly."""
    audit = FQ.QUERIES["qa_audit"](spark, sf).agg(
        F.sum("n_violations").cast("bigint").alias("metric")
    ).select(
        F.lit("audit_violations").alias("gate"),
        "metric",
        F.lit(0).cast("bigint").alias("threshold"),
    )
    anom = FQ.QUERIES["qa_volume_anomaly"](spark, sf).agg(
        F.sum(F.col("is_anomaly").cast("int")).cast("bigint").alias("metric")
    ).select(
        F.lit("anomalous_days").alias("gate"),
        "metric",
        F.lit(2).cast("bigint").alias("threshold"),
    )
    kanon = FQ.QUERIES["qa_k_anonymity"](spark, sf).select(
        F.lit("k_anonymity_rows_at_risk").alias("gate"),
        F.col("rows_at_risk").cast("bigint").alias("metric"),
        F.lit(0).cast("bigint").alias("threshold"),
    )
    mad = FQ.QUERIES["qa_mad_outliers"](spark, sf).agg(
        F.sum("n_outliers").cast("bigint").alias("metric"),
        F.floor(F.sum("n_rows") / F.lit(100.0)).cast("bigint").alias("threshold"),
    ).select(F.lit("mad_outlier_rows").alias("gate"), "metric", "threshold")
    return (
        audit.unionByName(anom)
        .unionByName(kanon)
        .unionByName(mad)
        .withColumn("pass", F.col("metric") <= F.col("threshold"))
        .orderBy("gate")
    )


_COV_DIMS = 8


def emb_cov_audit_old(spark: SparkSession, sf: str) -> DataFrame:
    """git f28674f form: 36-struct cells via chained Column calls."""
    emb = load_table(spark, sf, "embeddings").select(
        F.transform(
            F.col("embedding"),
            lambda x: F.round(x.cast("double") * 1e6).cast("bigint"),
        ).alias("e")
    )
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                F.lit(j).alias("j"),
                (F.element_at("e", i + 1) * F.element_at("e", j + 1)).alias("xy"),
                F.element_at("e", i + 1).alias("x"),
                F.element_at("e", j + 1).alias("y"),
            )
            for i in range(_COV_DIMS)
            for j in range(i, _COV_DIMS)
        ]
    )
    ex = emb.select(F.explode(cells).alias("c")).select(
        F.col("c.i").alias("i"),
        F.col("c.j").alias("j"),
        F.col("c.xy").alias("xy"),
        F.col("c.x").alias("x"),
        F.col("c.y").alias("y"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = ex.groupBy("i", "j").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(dec("xy")).alias("sxy"),
        F.sum(dec("x")).alias("sx"),
        F.sum(dec("y")).alias("sy"),
    )
    nn = F.col("n").cast("double")
    cov = (
        (nn * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy").cast("double"))
        / (nn * nn)
        / F.lit(1e12)
    )
    return m.select(
        F.col("i").cast("bigint").alias("i"),
        F.col("j").cast("bigint").alias("j"),
        F.round(cov, 9).alias("cov"),
    ).orderBy("i", "j")


_CORR_VARS = [
    ("qty", "CAST(l_quantity AS BIGINT)"),
    ("price_usd", "CAST(FLOOR(l_extendedprice) AS BIGINT)"),
    ("disc_pct", "CAST(ROUND(l_discount * 100) AS BIGINT)"),
    ("tax_pct", "CAST(ROUND(l_tax * 100) AS BIGINT)"),
]


def ag_corr_matrix_old(spark: SparkSession, sf: str) -> DataFrame:
    """git f28674f form: correlation structs via chained Column calls."""
    li = load_table(spark, sf, "lineitem")
    vals = li.select(*[F.expr(expr).alias(name) for name, expr in _CORR_VARS])
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n")]
    for name, _ in _CORR_VARS:
        aggs.append(F.sum(name).cast("bigint").alias(f"s_{name}"))
        aggs.append(
            F.sum(F.col(name) * F.col(name)).cast("bigint").alias(f"ss_{name}")
        )
    pairs = [
        (a, b)
        for i, (a, _) in enumerate(_CORR_VARS)
        for b, _ in [v for v in _CORR_VARS[i + 1 :]]
    ]
    for a, b in pairs:
        aggs.append(F.sum(F.col(a) * F.col(b)).cast("bigint").alias(f"sp_{a}_{b}"))
    m = vals.agg(*aggs)

    def corr_expr(a: str, b: str):
        n = F.col("n").cast("double")
        sx, sy = F.col(f"s_{a}").cast("double"), F.col(f"s_{b}").cast("double")
        sxx, syy = F.col(f"ss_{a}").cast("double"), F.col(f"ss_{b}").cast("double")
        sxy = F.col(f"sp_{a}_{b}").cast("double")
        cov = sxy / n - (sx / n) * (sy / n)
        vx = sxx / n - (sx / n) * (sx / n)
        vy = syy / n - (sy / n) * (sy / n)
        return cov / (F.sqrt(vx) * F.sqrt(vy))

    rows = F.array(
        *[
            F.struct(
                F.lit(a).alias("var_x"),
                F.lit(b).alias("var_y"),
                F.col("n").alias("n"),
                corr_expr(a, b).alias("corr"),
            )
            for a, b in pairs
        ]
    )
    return (
        m.select(F.explode(rows).alias("r"))
        .select("r.var_x", "r.var_y", "r.n", "r.corr")
        .orderBy("var_x", "var_y")
    )


def tx_perplexity_old(spark: SparkSession, sf: str) -> DataFrame:
    """git f28674f form: vocab size via a driver-side count() action."""
    from movie_data_etl_pipeline_spark.functions.text import tokens

    docs = load_table(spark, sf, "documents").select(
        "doc_id", tokens(F.col("text")).alias("t")
    ).filter(F.size("t") >= 2)
    big = docs.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.col("t"),
                F.slice(F.col("t"), 2, F.greatest(F.size("t") - 1, F.lit(0))),
                lambda a, b: F.when(b.isNull(), F.lit(None)).otherwise(
                    F.struct(a.alias("w1"), b.alias("w2"))
                ),
            )
        ).alias("bg"),
    ).filter(F.col("bg").isNotNull()).select("doc_id", "bg.w1", "bg.w2")
    train = big.filter(F.col("doc_id") % 5 != 0)
    held = big.filter(F.col("doc_id") % 5 == 0)
    c12 = train.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("bigint").alias("c12"))
    c1 = train.groupBy("w1").agg(F.count(F.lit(1)).cast("bigint").alias("c1"))
    vocab_v = (
        train.select("w1").union(train.select(F.col("w2").alias("w1"))).distinct().count()
    )
    v = int(vocab_v) + 1
    scored = (
        held.join(c12, ["w1", "w2"], "left")
        .join(c1, ["w1"], "left")
        .select(
            "doc_id",
            F.round(
                F.log(
                    (F.coalesce("c12", F.lit(0)).cast("double") + F.lit(1.0))
                    / (F.coalesce("c1", F.lit(0)).cast("double") + F.lit(float(v)))
                )
                * F.lit(1000000.0)
            )
            .cast("bigint")
            .alias("mu"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            (-F.sum("mu")).cast("bigint").alias("nll_micro"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "nll_micro",
            F.round(
                F.exp(
                    F.col("nll_micro").cast("double")
                    / (F.lit(1000000.0) * F.col("n_bigrams").cast("double"))
                ),
                3,
            ).alias("ppl"),
        )
        .orderBy("doc_id")
    )


def sim_tfidf_cosine_old(spark: SparkSession, sf: str) -> DataFrame:
    """git f28674f form of similarity.tfidf_cosine_pairs: tf per
    (id, tok) via explode + groupBy (a full posting-relation shuffle),
    frozen with the fixture query's arguments."""
    from movie_data_etl_pipeline_spark.plans.doc_pairs import xxh_shingle_arrays

    max_df, threshold, idf_unit = 50, 0.2, 1024.0
    docs = load_table(spark, sf, "documents")
    terms_rel = xxh_shingle_arrays(spark, sf)
    base = terms_rel.select(
        F.col(terms_rel.columns[0]).alias("id"), F.col(terms_rel.columns[1]).alias("t")
    )
    dt = (
        base.select("id", F.explode("t").alias("tok"))
        .groupBy("id", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    n_docs = docs.select(F.countDistinct(F.col("doc_id")).cast("double").alias("n_docs"))
    df_rel = dt.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    idf = (
        df_rel.filter(F.col("df") <= max_df)
        .crossJoin(F.broadcast(n_docs))
        .select(
            "tok",
            "df",
            F.floor(
                F.log(F.col("n_docs") / F.col("df").cast("double")) * F.lit(idf_unit)
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("idf_q"),
        )
        .filter(F.col("idf_q") > 0)
    )
    w = dt.join(idf, "tok").select(
        "tok", "id", "df", (F.col("tf") * F.col("idf_q")).alias("w")
    )
    w = w.persist()
    norms = w.groupBy("id").agg(F.sum(F.col("w") * F.col("w")).alias("n2"))
    shared = w.filter(F.col("df") >= 2)
    a = shared.select(F.col("id").alias("id_a"), "tok", F.col("w").alias("wa"))
    b = shared.select(F.col("id").alias("id_b"), "tok", F.col("w").alias("wb"))
    dots = (
        a.join(b, "tok")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dp"))
    )
    na = norms.select(F.col("id").alias("id_a"), F.col("n2").alias("na2"))
    nb = norms.select(F.col("id").alias("id_b"), F.col("n2").alias("nb2"))
    return (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("dp").cast("double")
                / (
                    F.sqrt(F.col("na2").cast("double"))
                    * F.sqrt(F.col("nb2").cast("double"))
                ),
                6,
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        .orderBy("id_a", "id_b")
    )


def gr_link_prediction_old(spark: SparkSession, sf: str) -> DataFrame:
    """git f28674f form: deg as a separate relation SMJ-attached to the
    pair aggregate twice."""
    from movie_data_etl_pipeline_spark.plans.graph_edges import copurchase_pairs

    cs = copurchase_pairs(spark, sf).select("c", F.col("p").alias("s"))
    deg = cs.groupBy("c").agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    hubs = (
        cs.groupBy("s")
        .agg(F.count(F.lit(1)).alias("fan"))
        .filter(F.col("fan") > 200)
        .select("s")
    )
    groups = (
        cs.join(F.broadcast(hubs), "s", "left_anti")
        .groupBy("s")
        .agg(F.array_sort(F.collect_list("c")).alias("cu"))
        .filter(F.size("cu") >= 2)
    )
    pairs = groups.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("cu"),
                    lambda x, i: F.transform(
                        F.slice(
                            F.col("cu"), i + 2,
                            F.greatest(F.size("cu") - i - 1, F.lit(0)),
                        ),
                        lambda y: F.struct(x.alias("c_a"), y.alias("c_b")),
                    ),
                )
            )
        ).alias("pr")
    ).select("pr.c_a", "pr.c_b")
    shared = (
        pairs.groupBy("c_a", "c_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
    )
    return (
        shared.join(deg.select(F.col("c").alias("c_a"), F.col("deg").alias("deg_a")), "c_a")
        .join(deg.select(F.col("c").alias("c_b"), F.col("deg").alias("deg_b")), "c_b")
        .select(
            "c_a",
            "c_b",
            "n_shared",
            F.round(
                F.col("n_shared").cast("double")
                / (F.col("deg_a") + F.col("deg_b") - F.col("n_shared")).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), "c_a", "c_b")
        .limit(100)
    )


OLD = {
    "ev_rfm": ev_rfm_old,
    "emb_pca_power": emb_pca_power_old,
    "qa_release_gate": qa_release_gate_old,
    "emb_cov_audit": emb_cov_audit_old,
    "ag_corr_matrix": ag_corr_matrix_old,
    "tx_perplexity": tx_perplexity_old,
    "sim_tfidf_cosine": sim_tfidf_cosine_old,
    "gr_link_prediction": gr_link_prediction_old,
}


# ------------------------------------------------------------------- driver


def _rows(df: DataFrame) -> list[tuple]:
    return sorted(tuple(r) for r in df.collect())


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default=str(Path(__file__).parent / "ab_r11_opt.json"))
    ap.add_argument("--only", nargs="*", default=None)
    ns = ap.parse_args()

    names = ns.only or list(OLD)
    unknown = [n for n in names if n not in OLD]
    if unknown:
        sys.exit(f"ab_r11_opt: no frozen old impl for {unknown}")

    spark = get_spark("ab-r11-opt")
    # JVM/codegen warmup + per-query untimed warmup of BOTH variants
    # (pays shared builds and parquet footer caches outside the timing)
    FQ.QUERIES["q1_pricing_summary"](spark, ns.sf).write.format("noop").mode(
        "overwrite"
    ).save()
    for name in names:
        OLD[name](spark, ns.sf).write.format("noop").mode("overwrite").save()
        FQ.QUERIES[name](spark, ns.sf).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()

    record: dict[str, dict] = {}
    for name in names:
        old_eq = _rows(OLD[name](spark, ns.sf))
        new_eq = _rows(FQ.QUERIES[name](spark, ns.sf))
        assert old_eq == new_eq, f"{name}: VALUE MISMATCH old vs new"
        best = {"old": float("inf"), "new": float("inf")}
        runs = {"old": [], "new": []}
        for _ in range(ns.reps):
            for tag, fn in (("old", OLD[name]), ("new", FQ.QUERIES[name])):
                t0 = time.perf_counter()
                fn(spark, ns.sf).write.format("noop").mode("overwrite").save()
                dt = round(time.perf_counter() - t0, 3)
                runs[tag].append(dt)
                best[tag] = min(best[tag], dt)
                spark.catalog.clearCache()
        record[name] = {
            "old_best": best["old"],
            "new_best": best["new"],
            "speedup": round(best["old"] / best["new"], 3),
            "old_runs": runs["old"],
            "new_runs": runs["new"],
            "values_equal": True,
            "n_rows": len(new_eq),
        }
        print(
            f"{name}: old {best['old']} -> new {best['new']} "
            f"({record[name]['speedup']}x), values equal on {len(new_eq)} rows",
            file=sys.stderr,
            flush=True,
        )

    out_path = Path(ns.out)
    prior: dict = {}
    if out_path.exists():
        try:
            prior = json.loads(out_path.read_text()).get("results", {})
        except json.JSONDecodeError:
            prior = {}
    prior.update(record)
    line = json.dumps(
        {"metric": "ab_r11_opt", "sf": ns.sf, "reps": ns.reps, "results": prior}
    )
    out_path.write_text(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
