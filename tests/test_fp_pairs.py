"""Frequent token pairs (`text_analysis.frequent_token_pairs`)."""

from __future__ import annotations

from movie_data_etl_pipeline_spark.operators import text_analysis


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
    )


def test_supports_and_lift(spark):
    # a&b together in 3 docs, a alone 1, b alone 1, c everywhere
    texts = ["a b c", "a b c", "a b c", "a c", "b c", "c", "c", "c"]
    out = {
        (r["tok_a"], r["tok_b"]): r
        for r in text_analysis.frequent_token_pairs(_docs(spark, texts), min_support=3).collect()
    }
    # n_a=4, n_b=4, n_ab=3, N=8 → lift = 3*8/(4*4) = 1.5
    assert out[("a", "b")]["n_ab"] == 3
    assert abs(out[("a", "b")]["lift"] - 1.5) < 1e-9
    # (a,c): n_ab=4 ≥ 3, lift = 4*8/(4*8) = 1.0
    assert out[("a", "c")]["n_ab"] == 4 and abs(out[("a", "c")]["lift"] - 1.0) < 1e-9
    # pairs below support vanish
    assert all(r["n_ab"] >= 3 for r in out.values())


def test_duplicate_tokens_in_doc_count_once(spark):
    texts = ["x x x y", "x y y", "x y", "z"]
    out = {
        (r["tok_a"], r["tok_b"]): r["n_ab"]
        for r in text_analysis.frequent_token_pairs(_docs(spark, texts), min_support=2).collect()
    }
    assert out[("x", "y")] == 3  # per-document presence, not occurrence count


def test_apriori_prune_drops_rare_tokens(spark):
    texts = ["p q", "p q", "p r"]  # r appears once
    rows = text_analysis.frequent_token_pairs(_docs(spark, texts), min_support=2).collect()
    toks = {t for r in rows for t in (r["tok_a"], r["tok_b"])}
    assert "r" not in toks and ("p", "q") in {(r["tok_a"], r["tok_b"]) for r in rows}


def test_temporal_split_accounting(spark):
    import datetime as dt

    from movie_data_etl_pipeline_spark.operators import sampling

    t0 = dt.datetime(2024, 1, 18, 12)
    rows = [(i, t0 + dt.timedelta(hours=6 * i)) for i in range(12)]
    df = spark.createDataFrame(rows, "id LONG, ts TIMESTAMP")
    out = sampling.temporal_split(df, "ts", cutoff="2024-01-20 00:00:00", embargo_days=1)
    got = {r["id"]: r["split"] for r in out.collect()}
    for i, t in rows:
        want = "train" if t < dt.datetime(2024, 1, 19) else (
            "embargo" if t < dt.datetime(2024, 1, 20) else "test"
        )
        assert got[i] == want
    # every row labeled — nothing dropped
    assert len(got) == len(rows)
