"""Wave-59 invariants: BM25-style retrieval vs an exact Python
reference on sf0.001."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from movie_data_etl_pipeline_spark.plans import wave59
from movie_data_etl_pipeline_spark.sources import load_table


def test_bm25_topk_matches_python(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    toks = {r["doc_id"]: [t for t in r["text"].split(" ") if t] for r in docs}
    dl = {d: len(ts) for d, ts in toks.items()}
    n_docs = len(dl)
    avgdl = sum(dl.values()) / float(n_docs)
    tf = defaultdict(Counter)
    for d, ts in toks.items():
        for t in ts:
            if t in wave59._QUERY_TERMS:
                tf[d][t] += 1
    df = Counter()
    for d, c in tf.items():
        for t in c:
            df[t] += 1
    k1, b = wave59._K1, wave59._B
    scores = {}
    for d, c in tf.items():
        s = 0.0
        for t in wave59._QUERY_TERMS:
            if t not in c:
                continue
            idf = (n_docs - df[t] + 0.5) / (df[t] + 0.5)
            w = c[t] * (1.0 + k1) / (c[t] + k1 * (1.0 - b + b * dl[d] / avgdl)) * idf
            s += w
        scores[d] = (s, len(c))
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1][0], kv[0]))[
        : wave59._TOPK
    ]
    got = wave59.ix_bm25_topk(spark, sf_dir).collect()
    assert len(got) == len(ranked)
    for row, (d, (s, nt)) in zip(got, ranked):
        assert row["doc_id"] == d
        assert row["n_terms"] == nt
        assert math.isclose(row["score"], s, rel_tol=1e-12)
    # multi-term matches must outrank weak single-term matches at the top
    assert got[0]["n_terms"] >= 1
    assert got[0]["score"] >= got[-1]["score"]
