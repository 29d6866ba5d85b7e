"""Wave-46 invariants: RAKE keywords vs an exact Python reference on
sf0.001."""

from __future__ import annotations

from collections import defaultdict

from movie_data_etl_pipeline_spark.functions.text import STOPWORDS
from movie_data_etl_pipeline_spark.plans import wave46
from movie_data_etl_pipeline_spark.sources import load_table


def test_rake_keywords_matches_python(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    stop = set(STOPWORDS)
    phrases = []  # one entry per occurrence
    for r in docs:
        run = []
        for tok in [t for t in r["text"].split(" ") if t]:
            if tok in stop:
                if run:
                    phrases.append(run)
                run = []
            else:
                run.append(tok)
        if run:
            phrases.append(run)
    phrases = [p for p in phrases if len(p) <= wave46._RAKE_MAX_PHRASE]
    degree = defaultdict(int)
    for p in phrases:
        for word in p:
            degree[word] += len(p)
    score = defaultdict(int)
    occ = defaultdict(int)
    for p in phrases:
        occ[" ".join(p)] += 1
    for ph in occ:
        score[ph] = sum(degree[w] for w in ph.split(" "))
    ranked = sorted(score.items(), key=lambda kv: (-kv[1], kv[0]))[: wave46._RAKE_TOP]

    got = wave46.tx_rake_keywords(spark, sf_dir).collect()
    assert len(got) == len(ranked)
    for row, (ph, sc) in zip(got, ranked):
        assert row["phrase"] == ph
        assert row["score"] == sc
        assert row["n_occurrences"] == occ[ph]
    # keywords must be multi-word-capable and stopword-free
    assert all(
        w not in stop for row in got for w in row["phrase"].split(" ")
    )
