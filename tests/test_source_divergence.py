"""`text_analysis.source_divergence`: exact-TV / quantized-KL drift."""

from __future__ import annotations

import math

from movie_data_etl_pipeline_spark.operators import text_analysis


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id LONG, source STRING, text STRING")


def test_single_source_has_zero_divergence(spark):
    df = _docs(spark, [(1, "only", "a b c"), (2, "only", "a a d")])
    out = text_analysis.source_divergence(df).collect()
    assert len(out) == 1
    assert out[0]["tv_dist"] == 0.0
    assert out[0]["kl_nats"] == 0.0


def test_hand_computed_two_source_case(spark):
    # A: [x x y], B: [y] → corpus x:2 y:2 (T=4)
    df = _docs(spark, [(1, "A", "x x y"), (2, "B", "y")])
    out = {r["source"]: r for r in text_analysis.source_divergence(df).collect()}
    assert out["A"]["n_tokens"] == 3 and out["B"]["n_tokens"] == 1
    # TV_A = ½(|2/3−1/2| + |1/3−1/2|) = 1/6 ; TV_B = ½(1/2 + 1/2) = 1/2
    assert abs(out["A"]["tv_dist"] - 1 / 6) < 1e-6
    assert abs(out["B"]["tv_dist"] - 0.5) < 1e-6
    kl_a = (2 / 3) * math.log((2 / 3) / 0.5) + (1 / 3) * math.log((1 / 3) / 0.5)
    assert abs(out["A"]["kl_nats"] - kl_a) < 1e-5
    assert abs(out["B"]["kl_nats"] - math.log(2)) < 1e-5


def test_bounds_on_fixture(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = text_analysis.source_divergence(docs).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["tv_dist"] <= 1.0
        # KL ≥ 0 up to the 2^-20 per-token quantization slack
        assert r["kl_nats"] >= -1e-5


def test_bigram_surprisal_hand_case(spark):
    import math

    df = spark.createDataFrame(
        [(1, "src", "a b a b"), (2, "src", "b a")], "doc_id LONG, source STRING, text STRING"
    )
    out = {r["doc_id"]: r for r in text_analysis.bigram_surprisal(df).collect()}
    # corpus bigrams: (a,b):2 (b,a):2 → c1[a]=2 c1[b]=2, V=2
    u_ab = math.floor(math.log((2 + 2) / (2 + 1)) * 1048576 + 0.5)
    u_ba = math.floor(math.log((2 + 2) / (2 + 1)) * 1048576 + 0.5)
    assert out[1]["n_bigrams"] == 3
    want1 = (2 * u_ab + 1 * u_ba) / (1048576.0 * 3)
    assert abs(out[1]["mean_surprisal"] - round(want1, 6)) < 1e-9
    assert out[2]["n_bigrams"] == 1
    assert abs(out[2]["mean_surprisal"] - round(u_ba / 1048576.0, 6)) < 1e-9


def test_bigram_surprisal_flags_scrambled_sequences(spark):
    # corpus of strongly-patterned text + one doc with the same tokens scrambled:
    # unigram stats identical, bigram surprisal must rank the scrambled doc highest
    patterned = [(i, "s", "the cat sat on the mat " * 3) for i in range(20)]
    scrambled = [(99, "s", "mat the on sat the cat " * 3)]
    df = spark.createDataFrame(patterned + scrambled, "doc_id LONG, source STRING, text STRING")
    out = {r["doc_id"]: r["mean_surprisal"] for r in text_analysis.bigram_surprisal(df).collect()}
    assert out[99] == max(out.values())
    assert out[99] > out[0]
