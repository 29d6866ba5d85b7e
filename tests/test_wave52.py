"""Wave-52 invariants: the curation composition vs an exact Python
reference on sf0.001."""

from __future__ import annotations

import hashlib
from collections import defaultdict

from movie_data_etl_pipeline_spark.plans import wave52
from movie_data_etl_pipeline_spark.sources import load_table


def _uniform(doc_id) -> float:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:12], 16) / float(1 << 48)


def test_curation_e2e_matches_python(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    ).collect()
    # 1. exact dedup (md5-canonical arbiter)
    groups = defaultdict(list)
    for r in docs:
        groups[r["text"]].append(r["doc_id"])
    kept_ids = {
        min(ids, key=lambda d: (hashlib.md5(str(d).encode()).hexdigest(), d))
        for ids in groups.values()
    }
    deduped = [r for r in docs if r["doc_id"] in kept_ids]
    # 2. quality filter
    filtered = [
        r
        for r in deduped
        if len(r["text"]) >= 80 and len(r["text"].split(" ")) >= 15
    ]
    # 3. target mixture
    counts = defaultdict(int)
    for r in filtered:
        counts[r["lang"]] += 1
    weights = wave52._MIX
    cap = min(counts[d] / w for d, w in weights.items())
    rates = {d: w * cap / counts[d] for d, w in weights.items()}
    mixed = [
        r
        for r in filtered
        if r["lang"] in rates and _uniform(r["doc_id"]) < rates[r["lang"]]
    ]
    per_lang = defaultdict(lambda: [0, 0, 0])
    for r in mixed:
        s = per_lang[r["lang"]]
        s[0] += 1
        s[1] += len(r["text"].split(" "))
        s[2] += r["doc_id"]

    got = wave52.px_curation_e2e(spark, sf_dir).collect()
    assert [r["lang"] for r in got] == sorted(per_lang)
    for r in got:
        n, tok, ck = per_lang[r["lang"]]
        assert (r["n_docs"], r["n_tokens"], r["checksum"]) == (n, tok, ck)
    # the filter and mixture stages must actually bite; exact dedup is
    # a no-op at sf0.001 (all 500 texts are byte-distinct there — the
    # near-dups differ in suffixes), which the pipeline must tolerate
    assert len(deduped) <= len(docs)
    assert len(filtered) < len(deduped)
    assert len(mixed) < len(filtered)
