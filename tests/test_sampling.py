"""Deterministic corpus sampling (``operators/sampling``): mixture
resampling keeps the binding domain whole and lands near the target
ratios; hash splitting is a stable partition that never reassigns a
row as the corpus grows."""

from __future__ import annotations

from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.operators import sampling


def _corpus(spark, per_domain):
    rows = []
    i = 0
    for dom, n in per_domain.items():
        for _ in range(n):
            rows.append((i, dom))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, dom string")


def test_mixture_sample_hits_target_and_keeps_binding_domain(spark):
    # normalized weights web .6 / books .2 / code .2; scarce 'code'
    # binds: N = min(4000/.6, 2000/.2, 500/.2) = 2500, so web keeps
    # ~1500 of 4000 (rate .375) and books ~500 of 2000 (rate .25).
    docs = _corpus(spark, {"web": 4000, "books": 2000, "code": 500})
    weights = {"web": 0.75, "books": 0.25, "code": 0.25}  # normalized /1.25
    out = sampling.mixture_sample(docs, "dom", weights, "doc_id")
    got = {r["dom"]: r["n"] for r in out.groupBy("dom").agg(F.count("*").alias("n")).collect()}
    assert got["code"] == 500  # binding domain: rate 1.0, kept whole
    # Bernoulli draws around the proportional expectations (±3+ sigma)
    assert abs(got["web"] - 1500) < 120, got
    assert abs(got["books"] - 500) < 80, got


def test_mixture_sample_deterministic_and_drops_unweighted(spark):
    docs = _corpus(spark, {"web": 1000, "books": 1000, "junk": 300})
    w = {"web": 0.5, "books": 0.5}
    a = sorted(r["doc_id"] for r in sampling.mixture_sample(docs, "dom", w, "doc_id").collect())
    b = sorted(
        r["doc_id"]
        for r in sampling.mixture_sample(
            docs.repartition(13), "dom", w, "doc_id"
        ).collect()
    )
    assert a == b  # same rows regardless of partitioning / rerun
    doms = {r["dom"] for r in sampling.mixture_sample(docs, "dom", w, "doc_id").select("dom").distinct().collect()}
    assert doms == {"web", "books"}  # weight-0 domain dropped


def test_hash_split_partitions_and_is_growth_stable(spark):
    docs = _corpus(spark, {"web": 3000})
    fr = {"train": 0.75, "val": 0.125, "test": 0.125}
    full = sampling.hash_split(docs, "doc_id", fr)
    counts = {r["split"]: r["n"] for r in full.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 3000  # a partition: every row exactly once
    assert abs(counts["train"] - 2250) < 200, counts
    assert abs(counts["val"] - 375) < 100, counts
    # growth stability: assignments on a half-corpus agree with the full run
    half = sampling.hash_split(docs.where(F.col("doc_id") < 1500), "doc_id", fr)
    full_map = {r["doc_id"]: r["split"] for r in full.collect()}
    for r in half.collect():
        assert full_map[r["doc_id"]] == r["split"]
