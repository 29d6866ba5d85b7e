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


OLD = {
    "ev_rfm": ev_rfm_old,
    "emb_pca_power": emb_pca_power_old,
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
