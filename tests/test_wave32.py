"""Wave-32 invariants: edit-distance journey pairs vs a Python
levenshtein reference on the sf0.001 fixtures."""

from __future__ import annotations

from collections import defaultdict

from movie_data_etl_pipeline_spark.plans import wave32
from movie_data_etl_pipeline_spark.sources import load_table


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_journey_editdist_matches_python(spark, sf_dir):
    rows = wave32.ev_journey_editdist(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).collect()
    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"][0].upper()))
    seqs = {}
    for u, evs in by_user.items():
        evs.sort()
        s = "".join(op for _, _, op in evs)[: wave32._ED_TRUNC]
        if len(s) >= wave32._ED_PREFIX:
            seqs[u] = s
    want = []
    users = sorted(seqs)
    for i, a in enumerate(users):
        for b in users[i + 1 :]:
            sa, sb = seqs[a], seqs[b]
            if sa[: wave32._ED_PREFIX] != sb[: wave32._ED_PREFIX]:
                continue
            if abs(len(sa) - len(sb)) > wave32._ED_MAX:
                continue
            d = _lev(sa, sb)
            if d <= wave32._ED_MAX:
                want.append((d, a, b, len(sa), len(sb)))
    want.sort()
    got = [(r["dist"], r["user_a"], r["user_b"], r["len_a"], r["len_b"]) for r in rows]
    assert got == want[:100] and len(got) > 0
