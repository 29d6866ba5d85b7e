"""Interleaved A/B of the round-10 optimization rewrites: each
rewritten query's OLD implementation (frozen verbatim below from git
5f73cca) vs the NEW registry implementation, alternated in ONE session
(drift-immune — both variants see the same box state), best-of-N with
untimed warmup, and VALUE EQUALITY asserted on every rep pair (sorted
row tuples must match exactly — these are the same outputs the DuckDB
oracle hashes).

    python tools/ab_r10_opt.py [--sf SF_DIR] [--reps N] [--out OUT]
    python tools/ab_r10_opt.py --only qa_replica_diff emb_pca_power
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.functions import portable_hash as ph
from movie_data_etl_pipeline_spark.functions import scalar as SC
from movie_data_etl_pipeline_spark.functions import text as TX
from movie_data_etl_pipeline_spark.operators import ml_eval, text_analysis
from movie_data_etl_pipeline_spark.plans import fixture_queries as FQ
from movie_data_etl_pipeline_spark.session import get_spark
from movie_data_etl_pipeline_spark.sources import load_table

_PCA_DIMS = 8
_PCA_ROUNDS = 3


# ---------------------------------------------------------------- old impls


def qa_replica_diff_old(spark: SparkSession, sf: str) -> DataFrame:
    """git 5f73cca form: two full digest scans + full-outer join."""
    li = load_table(spark, sf, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("bigint").alias("qty"),
        SC.cents("l_extendedprice").alias("price_c"),
    )
    replica_b = li.filter(F.col("l_orderkey") % 4999 != 7).withColumn(
        "price_c",
        F.when(F.col("l_orderkey") % 4999 == 11, F.col("price_c") + 1).otherwise(
            F.col("price_c")
        ),
    )

    def digest(df: DataFrame) -> DataFrame:
        row = F.concat_ws("|", "l_orderkey", "l_linenumber", "qty", "price_c")
        h = ph.str_hash(row)
        return (
            df.select(
                F.pmod(F.col("l_orderkey"), F.lit(256)).alias("bucket"),
                h.alias("h"),
            )
            .groupBy("bucket")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.sum("h").cast("bigint").alias("checksum"),
            )
        )

    a = digest(li).select(
        "bucket", F.col("n").alias("n_a"), F.col("checksum").alias("sum_a")
    )
    b = digest(replica_b).select(
        "bucket", F.col("n").alias("n_b"), F.col("checksum").alias("sum_b")
    )
    return (
        a.join(b, "bucket", "full_outer")
        .filter(
            ~(
                F.col("sum_a").eqNullSafe(F.col("sum_b"))
                & F.col("n_a").eqNullSafe(F.col("n_b"))
            )
        )
        .select(
            "bucket",
            F.coalesce("n_a", F.lit(0)).cast("bigint").alias("n_a"),
            F.coalesce("n_b", F.lit(0)).cast("bigint").alias("n_b"),
        )
        .orderBy("bucket")
    )


def emb_pca_power_old(spark: SparkSession, sf: str) -> DataFrame:
    """git 5f73cca form: 64-cell explode into groupBy(i, j)."""
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


def px_training_mix_old(spark: SparkSession, sf: str) -> DataFrame:
    """git 5f73cca form: row_number window over the fingerprint."""
    from movie_data_etl_pipeline_spark.operators import sampling

    docs = load_table(spark, sf, "documents")
    kept = text_analysis.adaptive_quality_keep(docs, carry=("lang",))
    w = Window.partitionBy(TX.fingerprint("text")).orderBy("doc_id")
    uniq = kept.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    train = uniq.where(sampling.uniform_hash(F.col("doc_id"), "split:") < 0.75)
    mixed = train.where(
        (F.col("lang") == "en")
        | (sampling.uniform_hash(F.col("doc_id"), "mix:") < 0.5)
    )
    return (
        mixed.groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.size(TX.tokens("text"))).cast("bigint").alias("total_tokens"),
        )
        .orderBy("source", "lang")
    )


def _quintile_map_old(metric: DataFrame, col: str) -> DataFrame:
    hist = metric.groupBy(F.col(col).alias("s")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_s")
    )
    cum = ml_eval.with_exclusive_prefix(hist, "s", ["n_s"])
    tot = hist.agg(F.sum("n_s").cast("bigint").alias("n"))
    return cum.join(F.broadcast(tot)).select(
        F.col("s").alias(col),
        F.expr("(5 * cum_n_s) div n").cast("bigint").alias(f"{col}_q"),
    )


def ev_rfm_segments_old(spark: SparkSession, sf: str) -> DataFrame:
    """git 5f73cca form: three independent quintile-map pipelines."""
    o = load_table(spark, sf, "orders").select(
        "o_custkey", "o_orderdate", SC.cents("o_totalprice").alias("cents")
    )
    hwm = o.agg(F.max("o_orderdate").alias("hwm"))
    cust = (
        o.join(F.broadcast(hwm))
        .groupBy("o_custkey")
        .agg(
            F.min(F.datediff(F.col("hwm"), F.col("o_orderdate")))
            .cast("bigint")
            .alias("rec"),
            F.count(F.lit(1)).cast("bigint").alias("freq"),
            F.sum("cents").cast("bigint").alias("money"),
        )
        .localCheckpoint(eager=True)
    )
    rmap = _quintile_map_old(cust.select("rec"), "rec")
    fmap = _quintile_map_old(cust.select("freq"), "freq")
    mmap = _quintile_map_old(cust.select("money"), "money")
    tagged = cust.join(rmap, "rec").join(fmap, "freq").join(mmap, "money")
    return (
        tagged.groupBy("rec_q", "freq_q", "money_q")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_cust"),
            F.sum("rec").cast("bigint").alias("sum_rec_days"),
            F.sum("freq").cast("bigint").alias("sum_orders"),
            F.sum("money").cast("bigint").alias("sum_cents"),
        )
        .orderBy("rec_q", "freq_q", "money_q")
    )


def gr_hits_old(spark: SparkSession, sf: str) -> DataFrame:
    """git 5f73cca form: hits_fixed_point WITHOUT per-round lineage
    truncation (edges checkpointed, rounds left lazy), same pins."""
    from movie_data_etl_pipeline_spark.plans import _hints
    from movie_data_etl_pipeline_spark.plans.graph_edges import cotx_pairs

    scale = 1 << 20
    hint = _hints.bounded_broadcast
    edges = cotx_pairs(spark, sf).select("c", "s").localCheckpoint(eager=True)
    hubs = edges.select("c").distinct().select(
        "c", F.lit(scale).cast("bigint").alias("h")
    )
    auths = None
    for _ in range(2):
        a_raw = (
            edges.join(hint(hubs), "c")
            .groupBy("s")
            .agg(F.sum("h").cast("bigint").alias("a_raw"))
        )
        a_max = a_raw.agg(F.max("a_raw").alias("a_max"))
        auths = a_raw.crossJoin(F.broadcast(a_max)).selectExpr(
            "s", f"(a_raw * {scale}) div a_max AS a"
        )
        h_raw = (
            edges.join(hint(auths), "s")
            .groupBy("c")
            .agg(F.sum("a").cast("bigint").alias("h_raw"))
        )
        h_max = h_raw.agg(F.max("h_raw").alias("h_max"))
        hubs = h_raw.crossJoin(F.broadcast(h_max)).selectExpr(
            "c", f"(h_raw * {scale}) div h_max AS h"
        )
    top_a = (
        auths.select(
            F.lit("authority").alias("role"),
            F.col("s").alias("node"),
            F.col("a").alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("node"))
        .limit(20)
    )
    top_h = (
        hubs.select(
            F.lit("hub").alias("role"),
            F.col("c").alias("node"),
            F.col("h").alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("node"))
        .limit(20)
    )
    return top_a.unionByName(top_h)


def ag_theil_sen_old(spark: SparkSession, sf: str) -> DataFrame:
    """git 5f73cca form: slope count via a full extra pass over the
    generated d² slope pairs (`slopes.agg(count)`)."""
    from movie_data_etl_pipeline_spark.operators import indexing

    o = load_table(spark, sf, "orders").select(
        F.to_date("o_orderdate").alias("d"), SC.cents("o_totalprice").alias("rev_c")
    )
    daily = o.groupBy("d").agg(F.sum("rev_c").alias("y")).localCheckpoint(eager=True)
    base = daily.select(
        F.datediff(F.col("d"), F.lit("1992-01-01").cast("date")).cast("bigint").alias("x"),
        "y",
    )
    a = base.select(F.col("x").alias("xa"), F.col("y").alias("ya"))
    b = base.select(F.col("x").alias("xb"), F.col("y").alias("yb"))
    slopes = (
        a.crossJoin(b)
        .filter(F.col("xa") < F.col("xb"))
        .select(
            (
                (F.col("yb") - F.col("ya")).cast("double")
                / (F.col("xb") - F.col("xa")).cast("double")
            ).alias("s")
        )
    )
    nrel = slopes.agg(F.count(F.lit(1)).alias("n"))
    ranked = indexing.global_row_number(slopes, ["s"])
    mid = (
        ranked.crossJoin(F.broadcast(nrel))
        .filter(
            (F.col("rn") == F.floor((F.col("n") + 1) / 2))
            | (F.col("rn") == F.floor((F.col("n") + 2) / 2))
        )
        .agg(F.min("s").alias("lo"), F.max("s").alias("hi"))
    )
    slope = mid.select((F.col("lo") + (F.col("hi") - F.col("lo")) / 2).alias("slope"))
    resid = base.crossJoin(F.broadcast(slope)).select(
        (F.col("y").cast("double") - F.col("slope") * F.col("x").cast("double")).alias("r"),
        "slope",
    )
    return resid.groupBy("slope").agg(F.median("r").alias("icpt")).select(
        F.round(F.col("slope") / 100.0, 6).alias("slope_per_day"),
        F.round(F.col("icpt") / 100.0, 2).alias("intercept"),
    )


def tx_bpe_merges_old(spark: SparkSession, sf: str) -> DataFrame:
    """git 5f73cca form: O(len²) merge fold every round INCLUDING the
    dead final-round merge (eagerly checkpointed, never consumed)."""
    docs = load_table(spark, sf, "documents")
    from movie_data_etl_pipeline_spark.sources.parquet import ensure_min_partitions

    rounds = 3
    t = TX.tokens("text")
    cur = ensure_min_partitions(docs.select(t.alias("t"))).filter(F.size("t") >= 2)
    cur = cur.localCheckpoint()
    out: list[tuple[int, str, str, int]] = []
    for r in range(1, rounds + 1):
        pairs = cur.select(
            F.explode(
                F.zip_with(
                    F.slice("t", 1, F.size("t") - 1),
                    F.slice("t", 2, F.size("t") - 1),
                    lambda a, b: F.struct(a.alias("x"), b.alias("y")),
                )
            ).alias("p")
        )
        top = (
            pairs.groupBy("p.x", "p.y")
            .agg(F.count(F.lit(1)).alias("c"))
            .orderBy(F.desc("c"), F.asc("x"), F.asc("y"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        x, y, c = top[0]["x"], top[0]["y"], int(top[0]["c"])
        out.append((r, x, y, c))
        joined = f"{x} {y}"
        merged = F.aggregate(
            F.col("t"),
            F.array().cast("array<string>"),
            lambda acc, tok: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(x))
                & (tok == F.lit(y)),
                F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(joined))),
            ).otherwise(F.concat(acc, F.array(tok))),
        )
        cur = cur.select(merged.alias("t")).localCheckpoint()
    return spark.createDataFrame(
        out, "round int, lhs string, rhs string, pair_count bigint"
    )


def ev_rfm_old(spark: SparkSession, sf: str) -> DataFrame:
    """git 5f73cca form: per-customer aggregate NOT checkpointed — the
    driver count() and the first rank pipeline each replay it."""
    from movie_data_etl_pipeline_spark.operators import indexing

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


OLD = {
    "qa_replica_diff": qa_replica_diff_old,
    "emb_pca_power": emb_pca_power_old,
    "px_training_mix": px_training_mix_old,
    "ev_rfm_segments": ev_rfm_segments_old,
    "gr_hits": gr_hits_old,
    "ag_theil_sen": ag_theil_sen_old,
    "tx_bpe_merges": tx_bpe_merges_old,
    "ev_rfm": ev_rfm_old,
}


# ------------------------------------------------------------------- driver


def _rows(df: DataFrame) -> list[tuple]:
    return sorted(tuple(r) for r in df.collect())


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default=str(Path(__file__).parent / "ab_r10_opt.json"))
    ap.add_argument("--only", nargs="*", default=None)
    ns = ap.parse_args()

    names = ns.only or list(OLD)
    unknown = [n for n in names if n not in OLD]
    if unknown:
        sys.exit(f"ab_r10_opt: no frozen old impl for {unknown}")

    spark = get_spark("ab-r10-opt")
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

    line = json.dumps({"metric": "ab_r10_opt", "sf": ns.sf, "reps": ns.reps, "results": record})
    Path(ns.out).write_text(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
