"""Recall/agreement floors for the four hash-dependent production
twins that the driver can only rows-only-check (their xxhash64 /
Gaussian-plane values are not DuckDB-reproducible):

- ``dd_minhash_lsh``        vs the exact ``dd_ngram_jaccard`` pairs
- ``dd_minhash_incremental``vs the exact pairs touching the batch
- ``dd_simhash``            vs the exact pairs at Jaccard ≥ 0.8
- ``sim_embedding_near_dup``vs brute-force exact cosine pairs

Each twin's verify stage is exact, so its output must be a SUBSET of
the exact ground truth (precision 1.0 by construction — asserted), and
the banding/bucketing must recall at least the floor below (measured
1.0 / 1.0 / 0.93 / 1.0 at sf0.001; floors leave headroom for fixture
regeneration). This upgrades the four from "runs" to self-certifying
(VERDICT-r5 ask #7). All hashes are fixed-seed, so the measurements
are deterministic per fixture.
"""

from __future__ import annotations

import itertools
import math

from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.plans import fixture_queries as FQ
from movie_data_etl_pipeline_spark.sources import load_table


def _pairs(spark, sf_dir, name, flt=None):
    df = FQ.QUERIES[name](spark, sf_dir)
    if flt is not None:
        df = df.filter(flt)
    return {(r["a_id"], r["b_id"]) for r in df.collect()}


def test_minhash_lsh_recall_floor(spark, sf_dir):
    exact = _pairs(spark, sf_dir, "dd_ngram_jaccard")
    lsh = _pairs(spark, sf_dir, "dd_minhash_lsh")
    assert lsh <= exact, "exact-verify stage must never emit a non-pair"
    assert len(lsh & exact) >= 0.9 * len(exact)


def test_minhash_incremental_recall_floor(spark, sf_dir):
    exact = _pairs(spark, sf_dir, "dd_ngram_jaccard")
    touching_batch = {(a, b) for (a, b) in exact if a % 10 == 0 or b % 10 == 0}
    incr = _pairs(spark, sf_dir, "dd_minhash_incremental")
    assert incr <= touching_batch
    assert len(incr & touching_batch) >= 0.9 * len(touching_batch)


def test_simhash_agreement_floor(spark, sf_dir):
    """SimHash(hamming ≤ 6) is a different similarity than Jaccard, so
    subset does not hold; the floor is agreement on the unambiguous
    near-dups (Jaccard ≥ 0.8)."""
    hi = _pairs(spark, sf_dir, "dd_ngram_jaccard", F.col("jaccard") >= 0.8)
    sim = _pairs(spark, sf_dir, "dd_simhash")
    assert hi, "fixture must plant near-duplicates"
    assert len(sim & hi) >= 0.7 * len(hi)


def test_simhash_registry_vs_portable_floor(spark, sf_dir):
    """Registry-surface floor tying the rows-only ``dd_simhash``
    production entry to its hash-green portable twin (VERDICT-r7 ask
    #5, the ``sim_knn_ivf`` pattern): on the unambiguous near-dups
    (exact Jaccard ≥ 0.8) that the value-checked ``dd_simhash_portable``
    entry recovers, the production entry must agree on at least 80%
    (measured 0.92 at sf0.001; both hash families are fixed-seed, so
    the measurement is deterministic per fixture). The two entries use
    different bit widths and hamming radii (64-bit/≤6 vs 28-bit/≤3),
    so neither output is a subset of the other — agreement on the
    exact-anchored pairs is the comparable surface. Complements
    ``test_simhash_agreement_floor`` (production vs exact anchors
    directly)."""
    hi = _pairs(spark, sf_dir, "dd_ngram_jaccard", F.col("jaccard") >= 0.8)
    prod = _pairs(spark, sf_dir, "dd_simhash")
    port = _pairs(spark, sf_dir, "dd_simhash_portable")
    anchored_port = port & hi
    assert anchored_port, "portable twin must recover some exact anchors"
    assert len(prod & anchored_port) >= 0.8 * len(anchored_port)


def test_embedding_near_dup_recall_floor(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    rows = emb.collect()

    def cos(a, b):
        dp = sum(x * y for x, y in zip(a, b))
        return dp / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        )

    exact = set()
    for r1, r2 in itertools.combinations(rows, 2):
        if cos(r1["embedding"], r2["embedding"]) >= 0.45:
            exact.add(tuple(sorted((r1["vec_id"], r2["vec_id"]))))
    nd = _pairs(spark, sf_dir, "sim_embedding_near_dup")
    assert nd <= exact
    assert exact, "fixture must contain near-parallel embeddings"
    assert len(nd & exact) >= 0.7 * len(exact)


def test_knn_ivf_registry_recall_floor(spark, sf_dir):
    """Registry-surface floor (VERDICT-r6 ask #5): the rows-only
    ``sim_knn_ivf`` entry must recall most of the exact
    ``sim_knn_bruteforce`` neighbor pairs for the shared query set
    (IVF's query side is the full corpus; brute force uses vec_id<50 —
    compare on the intersection). Seeded k-means + seeded pipeline, so
    the measurement is deterministic per fixture. A deeper operator
    test (parameter sweep + determinism rerun) lives in
    test_joins_stateful.py::test_knn_ivf_recall_vs_bruteforce."""
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in FQ.QUERIES["sim_knn_bruteforce"](spark, sf_dir).collect()
    }
    qids = {q for q, _ in exact}
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in FQ.QUERIES["sim_knn_ivf"](spark, sf_dir).collect()
        if r["query_id"] in qids
    }
    assert exact, "brute-force twin must produce pairs"
    assert len(exact & approx) >= 0.6 * len(exact)


def test_approx_stats_registry_agreement_floor(spark, sf_dir):
    """Registry-surface floor for ``ap_approx_stats`` (rows-only —
    sketch outputs are implementation-defined): HLL++ distinct-user
    counts within 4 sigma of exact countDistinct, and the quantile
    sketch's p50 within 5% of the exact interpolated twin
    ``ap_exact_quantiles``. Error-bound tests against the operator
    internals live in test_sketches.py; this one pins the driver-run
    registry entries to each other."""
    approx = {
        r["event_type"]: (r["approx_users"], r["approx_p50"])
        for r in FQ.QUERIES["ap_approx_stats"](spark, sf_dir).collect()
    }
    exact_q = {
        r["event_type"]: r["p50"]
        for r in FQ.QUERIES["ap_exact_quantiles"](spark, sf_dir).collect()
    }
    events = load_table(spark, sf_dir, "events")
    exact_u = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert approx.keys() == exact_q.keys() == exact_u.keys()
    for et, (au, ap50) in approx.items():
        assert abs(au - exact_u[et]) <= max(2, 0.08 * exact_u[et]), (et, au, exact_u[et])
        assert abs(ap50 - exact_q[et]) <= 0.05 * max(exact_q[et], 1.0), (et, ap50, exact_q[et])


def test_knn_lsh_registry_anchor(spark, sf_dir):
    """Registry-surface anchor for ``sim_knn_lsh`` — the LAST of the
    five rows-only entries without one (VERDICT-r10 ask #8): the
    Gaussian random-hyperplane buckets are not DuckDB-reproducible, so
    the driver can never hash-check this entry; this ties it to the
    exact ``sim_knn_bruteforce`` twin instead. At this fixture's
    density (≈500 vectors into 2^10 buckets × 6 tables) collisions
    are deliberately sparse, so pair-level recall against the exact
    global top-5 is LOW by design (measured 0.052 at sf0.001) — the
    anchor asserts (a) a non-vacuous overlap floor that catches
    catastrophic breakage (empty output, wrong scoring direction),
    (b) the structural contract: ≤k neighbors per query, rank within
    1..k, no self-pairs. Fixed-seed planes ⇒ deterministic per
    fixture. With this, all five permanently-oracle-less entries
    (dd_simhash, sim_knn_lsh, sim_knn_ivf, sim_embedding_near_dup,
    ap_approx_stats) carry a local exactness anchor; their rows-only
    driver status is the accepted contract, not a gap."""
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in FQ.QUERIES["sim_knn_bruteforce"](spark, sf_dir).collect()
    }
    rows = FQ.QUERIES["sim_knn_lsh"](spark, sf_dir).collect()
    approx = {(r["query_id"], r["neighbor_id"]) for r in rows}
    assert exact, "brute-force twin must produce pairs"
    assert rows, "lsh entry must emit pairs"
    assert len(exact & approx) >= 0.02 * len(exact)
    per_q: dict[int, list[int]] = {}
    for r in rows:
        assert r["query_id"] != r["neighbor_id"]
        assert 1 <= r["rank"] <= 5
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per_q.values())
