"""Wave-43 invariants: filter funnel and dedup impact vs exact Python
references on sf0.001."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

from movie_data_etl_pipeline_spark.plans import wave43
from movie_data_etl_pipeline_spark.sources import load_table


def _stats(text, n_chars):
    toks = [t for t in text.split(" ") if t]
    c = Counter(toks)
    return {
        "n_chars": n_chars,
        "n_tokens": len(toks),
        "n_distinct": len(c),
        "top_freq": max(c.values()),
        "sum_len": sum(len(t) for t in toks),
    }


def test_filter_funnel_matches_python(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "n_chars"
    ).collect()
    preds = [
        lambda s: s["n_chars"] >= 80,
        lambda s: s["n_tokens"] >= 15,
        lambda s: 4 * s["top_freq"] <= s["n_tokens"],
        lambda s: 5 * s["n_distinct"] >= 2 * s["n_tokens"],
        lambda s: 3 * s["n_tokens"] <= s["sum_len"] <= 12 * s["n_tokens"],
    ]
    survivors = [(r["doc_id"], _stats(r["text"], r["n_chars"])) for r in docs]
    expected = [(len(survivors), 0, sum(d for d, _ in survivors))]
    for p in preds:
        nxt = [(d, s) for d, s in survivors if p(s)]
        expected.append(
            (len(nxt), len(survivors) - len(nxt), sum(d for d, _ in nxt))
        )
        survivors = nxt
    got = wave43.tx_filter_funnel(spark, sf_dir).collect()
    assert [r["stage"] for r in got] == list(range(6))
    assert got[0]["filter"] == "intake"
    assert [r["filter"] for r in got[1:]] == [n for n, _ in wave43._FUNNEL_STAGES]
    for r, (n, dropped, ck) in zip(got, expected):
        assert (r["survivors"], r["dropped_here"], r["checksum"]) == (n, dropped, ck)
    # funnel must be monotone and actually drop something
    assert all(a["survivors"] >= b["survivors"] for a, b in zip(got, got[1:]))
    assert got[-1]["survivors"] < got[0]["survivors"]


def test_dup_impact_matches_python(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    ).collect()
    groups = defaultdict(list)
    for r in docs:
        groups[r["text"]].append(r["doc_id"])
    kept = set()
    for ids in groups.values():
        kept.add(min(ids, key=lambda d: (hashlib.md5(str(d).encode()).hexdigest(), d)))
    per_source = defaultdict(lambda: [0, 0, 0, 0])
    for r in docs:
        ntok = len(r["text"].split(" "))
        s = per_source[r["source"]]
        s[0] += 1
        s[2] += ntok
        if r["doc_id"] not in kept:
            s[1] += 1
            s[3] += ntok
    got = wave43.qa_dup_impact(spark, sf_dir).collect()
    assert [r["source"] for r in got] == sorted(per_source)
    for r in got:
        n, rem, tok, tokrem = per_source[r["source"]]
        assert (r["n_docs"], r["n_removed"], r["tok_total"], r["tok_removed"]) == (
            n,
            rem,
            tok,
            tokrem,
        )
        assert r["removal_ratio"] == tokrem / float(tok)
