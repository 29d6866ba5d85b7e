"""Round-3 third wave: inverted index, compaction planner, grouped
OLS, sparse TF-IDF cosine, session attribution. (The salted join is
covered in test_formats_skew.py; each operator here also has a DuckDB
oracle query in plans/fixture_queries.)"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Row
from pyspark.sql import functions as F

from movie_data_etl_pipeline_spark.operators.indexing import inverted_index
from movie_data_etl_pipeline_spark.operators.layout import compaction_plan
from movie_data_etl_pipeline_spark.operators.similarity import tfidf_cosine_pairs
from movie_data_etl_pipeline_spark.operators.stats import ols_by_group


def test_inverted_index_exact_df_cf_and_capped_postings(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b a"),
            (2, "a c"),
            (3, "a"),
            (4, "b b b"),
        ],
        ["doc_id", "text"],
    )
    out = {r["token"]: r for r in inverted_index(docs, max_postings=2).collect()}
    assert out["a"]["df"] == 3 and out["a"]["cf"] == 4
    # cap keeps the SMALLEST ids; df/cf stay exact over the full relation
    assert out["a"]["postings"] == "1,2"
    assert out["b"]["df"] == 2 and out["b"]["cf"] == 4
    assert out["b"]["postings"] == "1,4"
    assert out["c"]["postings"] == "2"


def test_compaction_plan_bins_near_target_and_skips_full_files(spark):
    manifest = spark.createDataFrame(
        [Row(file_id=i, rows=sz) for i, sz in enumerate([5000, 900, 800, 700, 600, 100])]
    )
    plan = compaction_plan(manifest, target=1000).collect()
    by_bin = {r["bin"]: r for r in plan}
    # the 5000-row file fills bins 0-4 worth of cumsum by itself → bin 0,
    # alone, and already at/above target → no rewrite
    assert by_bin[0]["n_files"] == 1 and by_bin[0]["compact"] is False
    # every multi-file bin must be flagged for rewrite
    for r in plan:
        if r["n_files"] > 1:
            assert r["compact"] is True
    # packing conservation: every file appears exactly once
    all_files = ",".join(r["files"] for r in plan).split(",")
    assert sorted(int(f) for f in all_files) == [0, 1, 2, 3, 4, 5]
    assert sum(r["total_rows"] for r in plan) == 8100


def test_compaction_plan_is_deterministic(spark):
    manifest = spark.createDataFrame(
        [Row(file_id=i, rows=(i * 37) % 500 + 10) for i in range(50)]
    )
    a = [tuple(r) for r in compaction_plan(manifest, target=700).collect()]
    b = [tuple(r) for r in compaction_plan(manifest, target=700).collect()]
    assert a == b


def test_ols_by_group_matches_numpy_polyfit(spark):
    rng = np.random.default_rng(7)
    rows = []
    for g, (slope, icpt) in {"a": (3, 50), "b": (-2, 900)}.items():
        xs = rng.integers(1, 100, size=200)
        noise = rng.integers(-5, 6, size=200)
        for x, e in zip(xs, noise):
            rows.append((g, int(x), int(slope * x + icpt + e)))
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    got = {r["g"]: r for r in ols_by_group(df, ["g"], "x", "y").collect()}
    for g in ("a", "b"):
        grp = [(x, y) for gg, x, y in rows if gg == g]
        ref_slope, ref_icpt = np.polyfit([x for x, _ in grp], [y for _, y in grp], 1)
        assert abs(got[g]["slope"] - ref_slope) < 1e-4
        assert abs(got[g]["intercept"] - ref_icpt) < 1e-3
        assert 0.99 < got[g]["r2"] <= 1.0


def test_ols_by_group_zero_variance_returns_null(spark):
    df = spark.createDataFrame([("a", 5, 1), ("a", 5, 2), ("a", 5, 3)], ["g", "x", "y"])
    r = ols_by_group(df, ["g"], "x", "y").collect()[0]
    assert r["slope"] is None and r["intercept"] is None and r["r2"] is None


def test_ols_by_group_survives_cent_scale_sums(spark):
    # y ~ 10^7 (cents): y² sums overflow int64 past ~10^5 rows — the
    # decimal(38,0) path must stay exact (ANSI mode would error on
    # overflow, so passing at all proves the wide type is in play).
    df = (
        spark.range(200_000)
        .select(
            F.lit("g").alias("g"),
            (F.col("id") % 100 + 1).alias("x"),
            ((F.col("id") % 100 + 1) * 10_000_000).alias("y"),
        )
    )
    r = ols_by_group(df, ["g"], "x", "y").collect()[0]
    assert r["slope"] == 10_000_000.0 and r["intercept"] == 0.0 and r["r2"] == 1.0


def test_tfidf_cosine_near_dups_score_high(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog near the river bank"),
            (2, "the quick brown fox jumps over the lazy dog near the river bend"),
            (3, "completely different words about spark catalyst optimizer plans"),
            (4, "completely different words about spark catalyst optimizer plans"),
        ],
        ["doc_id", "text"],
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in tfidf_cosine_pairs(docs, ngram=3, max_df=3, threshold=0.1).collect()
    }
    # identical docs → cosine exactly 1
    assert pairs[(3, 4)] == 1.0
    # one-token tail edit → high but < 1
    assert 0.5 < pairs[(1, 2)] < 1.0
    # disjoint docs never pair
    assert (1, 3) not in pairs and (2, 4) not in pairs


def test_tfidf_cosine_df_cut_drops_hot_terms(spark):
    # a shingle present in EVERY doc is cut by max_df → docs sharing
    # only that shingle produce no pair
    docs = spark.createDataFrame(
        [
            (1, "common shared prefix alpha one"),
            (2, "common shared prefix beta two"),
            (3, "common shared prefix gamma three"),
        ],
        ["doc_id", "text"],
    )
    out = tfidf_cosine_pairs(docs, ngram=3, max_df=2, threshold=0.0).collect()
    assert out == []


def test_cms_estimate_is_one_sided_and_merge_equals_whole(spark):
    from movie_data_etl_pipeline_spark.operators.sketches import (
        cms_estimate,
        cms_merge,
        cms_profile,
    )

    rows = [(i, tok) for i, tok in enumerate(
        ["apple"] * 40 + ["pear"] * 25 + ["plum"] * 9 + ["fig"] * 2 + ["kiwi"]
    )]
    df = spark.createDataFrame(rows, ["i", "tok"])
    # tiny width FORCES collisions — the one-sided bound must hold anyway
    prof = cms_profile(df, "tok", depth=3, width=8)
    items = df.select("tok").distinct()
    est = {r["tok"]: r["est"] for r in cms_estimate(prof, items, "tok", 3, 8).collect()}
    truth = {"apple": 40, "pear": 25, "plum": 9, "fig": 2, "kiwi": 1}
    for tok, t in truth.items():
        assert est[tok] >= t  # never undercounts
    # mergeability: sketch(half A) + sketch(half B) == sketch(whole)
    pa = cms_profile(df.filter("i % 2 = 0"), "tok", depth=3, width=8)
    pb = cms_profile(df.filter("i % 2 = 1"), "tok", depth=3, width=8)
    merged = {(r["d"], r["bucket"]): r["cnt"] for r in cms_merge(pa, pb).collect()}
    whole = {(r["d"], r["bucket"]): r["cnt"] for r in prof.collect()}
    assert merged == whole


def test_replica_diff_flags_only_faulted_buckets(spark, sf_dir):
    from movie_data_etl_pipeline_spark.plans.fixture_queries import qa_replica_diff

    diff = qa_replica_diff(spark, sf_dir).collect()
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{sf_dir}/lineitem.parquet')"
    )
    expected = {
        r[0]
        for r in con.execute(
            "SELECT DISTINCT l_orderkey % 256 FROM lineitem "
            "WHERE l_orderkey % 4999 IN (7, 11)"
        ).fetchall()
    }
    assert {r["bucket"] for r in diff} == expected
    # dropped rows show as a count delta; modified rows as equal counts
    for r in diff:
        assert r["n_a"] >= r["n_b"]


def test_delta_join_identity_both_sides_grow(spark):
    from movie_data_etl_pipeline_spark.operators.incremental import delta_join

    a_old = spark.createDataFrame([(1, "a1"), (2, "a2")], ["k", "va"])
    da = spark.createDataFrame([(3, "a3"), (2, "a2x")], ["k", "va"])
    b_old = spark.createDataFrame([(2, "b2"), (3, "b3")], ["k", "vb"])
    db = spark.createDataFrame([(1, "b1"), (3, "b3x")], ["k", "vb"])
    full = a_old.unionByName(da).join(b_old.unionByName(db), "k")
    incr = a_old.join(b_old, "k").unionByName(
        delta_join(a_old, da, b_old, db, ["k"])
    )
    key = lambda df: sorted(tuple(r) for r in df.collect())
    assert key(full) == key(incr)


def test_kmv_lossless_below_k_and_merge_idempotent(spark):
    from movie_data_etl_pipeline_spark.operators.sketches import (
        kmv_estimate,
        kmv_merge,
        kmv_profile,
    )

    df = spark.createDataFrame(
        [("s1", f"tok{i % 7}") for i in range(50)]
        + [("s2", f"tok{i}") for i in range(40)],
        ["src", "tok"],
    )
    prof = kmv_profile(df, ["src"], "tok", k=16)
    est = {r["src"]: r["n_distinct_est"] for r in kmv_estimate(prof, ["src"], k=16).collect()}
    # s1 has 7 distinct < k → sketch is lossless, estimate exact
    assert est["s1"] == 7.0
    # s2 has 40 distinct > k → estimator path, within a loose band
    assert 20 < est["s2"] < 80  # within ~2 RSE of truth (RSE ≈ 26% at k=16)
    # idempotent merge: merging a sketch with itself changes nothing
    again = kmv_merge(prof.unionByName(prof), ["src"], k=16)
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, prof.collect()))


def test_kmv_merge_equals_whole(spark):
    from movie_data_etl_pipeline_spark.operators.sketches import kmv_merge, kmv_profile

    df = spark.createDataFrame(
        [("s", f"t{i}") for i in range(60)], ["src", "tok"]
    )
    whole = kmv_profile(df, ["src"], "tok", k=8)
    pa = kmv_profile(df.filter("substr(tok, 2) % 2 = 0"), ["src"], "tok", k=8)
    pb = kmv_profile(df.filter("substr(tok, 2) % 2 = 1"), ["src"], "tok", k=8)
    merged = kmv_merge(pa.unionByName(pb), ["src"], k=8)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_triangle_count_known_graphs(spark):
    from movie_data_etl_pipeline_spark.operators.graph import triangle_count

    # K4: 6 edges, 12 wedges, 4 triangles, clustering 1.0
    k4 = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(4) if a < b], ["a", "b"]
    )
    r = triangle_count(k4).collect()[0]
    assert (r["n_edges"], r["n_wedges"], r["n_triangles"]) == (6, 12, 4)
    assert r["global_clustering"] == 1.0
    # star: wedges but no triangles
    star = spark.createDataFrame([(0, i) for i in range(1, 6)], ["a", "b"])
    r = triangle_count(star).collect()[0]
    assert r["n_triangles"] == 0 and r["n_wedges"] == 10
    assert r["global_clustering"] == 0.0
    # triangle + pendant edge
    g = spark.createDataFrame([(1, 2), (2, 3), (1, 3), (3, 4)], ["a", "b"])
    r = triangle_count(g).collect()[0]
    assert r["n_triangles"] == 1


def test_weighted_sample_es_favors_heavy_weights_and_is_exact_k(spark):
    from movie_data_etl_pipeline_spark.operators.sampling import weighted_sample_es

    rows = [(f"id{i}", "s", 1000 if i < 50 else 1) for i in range(500)]
    df = spark.createDataFrame(rows, ["key", "src", "w"])
    out = weighted_sample_es(df, "key", "w", k=25, strata=("src",)).collect()
    assert len(out) == 25
    heavy = sum(1 for r in out if r["w"] == 1000)
    # 50 items carry 1000x the weight of the other 450: essentially all
    # picks must be heavy (P[light] per pick ≈ 450/(50·1000) ≈ 1%)
    assert heavy >= 22
    # determinism: same input → same selection
    again = weighted_sample_es(df, "key", "w", k=25, strata=("src",)).collect()
    assert sorted(r["key"] for r in out) == sorted(r["key"] for r in again)


def test_bpe_merges_hand_case(spark):
    from movie_data_etl_pipeline_spark.operators.text_analysis import learn_bpe_merges

    docs = spark.createDataFrame(
        [(1, "a a a b a a"), (2, "a b a b c"), (3, "x")], ["doc_id", "text"]
    )
    got = [tuple(r) for r in learn_bpe_merges(docs, rounds=3).collect()]
    # round 1: overlapping (a,a) counted 3 ("a a a" gives 2, "a a" gives 1);
    # greedy leftmost merge turns "a a a" into ["a a", "a"] (no re-merge)
    # round 2: (a,b) = 1 (doc1 post-merge) + 2 (doc2) = 3
    assert got == [
        (1, "a", "a", 3),
        (2, "a", "b", 3),
        (3, "a a", "a b", 1),
    ]
