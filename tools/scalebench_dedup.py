"""Scaling-ratio harness for the dedup / similarity families — the one
family `tools/scalebench.py` excludes by design, because verbatim
replication corrupts the PROBLEM: replicated text and vectors are
mutual near-duplicates, so candidate-pair counts (the quantity these
operators exist to bound) would grow with the square of the factor
while real corpora grow them linearly.

This harness amplifies with a DISTINCT-CORPUS generator instead:

* ``documents``: replica ``k`` shifts ``doc_id`` and rewrites every
  token with a replica tag (``tok`` → ``r<k>_tok``). Within a replica
  the duplicate/near-duplicate structure of the fixture is preserved
  EXACTLY (same token sequence modulo tagging ⇒ same shingle-set
  relationships); across replicas no shingle ever matches, which is
  the correct model of "10× more, mostly-unrelated documents".
* ``embeddings``: replica ``k`` shifts ``vec_id`` and applies a
  deterministic per-(replica, dim) sign flip — a diagonal ±1
  orthogonal transform, so within-replica geometry (norms, cosines,
  neighbor ranks) is preserved exactly while cross-replica cosines
  collapse toward 0 (each term of the dot product gets an independent
  pseudo-random sign).

Run:  python tools/scalebench_dedup.py [factor] [out_json]

Writes one JSON line: per-query seconds at 1× and N× and the ratio.
Only ``documents`` and ``embeddings`` are materialized in the amplified
dir — the queries below touch nothing else.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.plans import fixture_queries as FQ
from movie_data_etl_pipeline_spark.session import get_spark
from movie_data_etl_pipeline_spark.sources import load_table

OFFSET = 100_000_000

# The flagship 100 TB dedup/similarity operators (VERDICT r3 item 6),
# plus the exact-dedup baseline for contrast.
SCALE_QUERIES = [
    "dd_exact_dup_groups",   # exact hash-groupBy dedup
    "dd_ngram_jaccard",      # PPJoin-style prefix-filter near-dup
    "dd_minhash_lsh",        # banded MinHash candidate join
    "dd_simhash",            # pigeonhole chunk join + bit_count verify
    "dd_containment",        # df-cut posting self-join
    "dd_lsh_recall",         # banding recall diagnostic (sampled truth)
    "sim_knn_lsh",           # plane-bucketed ANN
    "sim_knn_ivf",           # IVF coarse-quantizer ANN
    "sim_embedding_near_dup",  # cosine near-dup over buckets
]


def amplify_corpus(spark, src_dir: str, out_dir: str, factor: int) -> None:
    done = os.path.join(out_dir, "_done")
    if os.path.exists(done):
        return
    os.makedirs(out_dir, exist_ok=True)

    docs = load_table(spark, src_dir, "documents")
    reps = []
    for k in range(factor):
        r = docs.withColumn("doc_id", F.col("doc_id") + F.lit(k * OFFSET))
        if k > 0:  # replica 0 stays verbatim so 1x-vs-Nx compares a superset
            r = r.withColumn(
                "text", F.regexp_replace("text", r"(\S+)", f"r{k}_$1")
            )
        reps.append(r)
    out = reps[0]
    for r in reps[1:]:
        out = out.unionAll(r)
    out.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")

    emb = load_table(spark, src_dir, "embeddings")
    reps = []
    for k in range(factor):
        r = emb.withColumn("vec_id", F.col("vec_id") + F.lit(k * OFFSET))
        if k > 0:
            r = r.withColumn(
                "embedding",
                F.transform(
                    "embedding",
                    lambda x, i: F.when(
                        F.pmod(F.hash(i, F.lit(k)), F.lit(2)) == 0, x
                    ).otherwise(-x),
                ),
            )
        reps.append(r)
    out = reps[0]
    for r in reps[1:]:
        out = out.unionAll(r)
    out.write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")
    Path(done).touch()


def run_set(spark, sf_dir: str) -> dict[str, float]:
    times: dict[str, float] = {}
    for name in SCALE_QUERIES:
        fn = FQ.QUERIES[name]
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times[name] = round(time.time() - t0, 3)
        spark.catalog.clearCache()
    return times


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_json = sys.argv[2] if len(sys.argv) > 2 else ""
    base_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    amp_dir = f"/tmp/scalebench_dedup_x{factor}"
    spark = get_spark("scalebench-dedup")
    amplify_corpus(spark, base_dir, amp_dir, factor)
    FQ.QUERIES["tx_token_stats"](spark, base_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    t1 = run_set(spark, base_dir)
    tn = run_set(spark, amp_dir)
    result = {
        "factor": factor,
        "generator": "distinct-corpus (token-tagged docs, sign-flipped embeddings)",
        "queries": {
            q: {"t1": t1[q], "tn": tn[q], "ratio": round(tn[q] / max(t1[q], 1e-9), 2)}
            for q in SCALE_QUERIES
        },
    }
    line = json.dumps(result)
    print(line)
    if out_json:
        Path(out_json).write_text(line + "\n")


if __name__ == "__main__":
    main()
