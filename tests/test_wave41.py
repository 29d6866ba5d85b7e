"""Wave-41 invariants: banded binary near-dup, top event paths, and
Kendall's tau-b vs exact Python references on sf0.001."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

from movie_data_etl_pipeline_spark.plans import wave41
from movie_data_etl_pipeline_spark.sources import load_table


def test_band_near_dup_matches_python(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    W = wave41._MM_WIN_HEX
    bands = defaultdict(list)  # (band, sig) -> [ids]
    for r in docs:
        hx = r["text"].encode().hex().upper()
        if len(hx) < wave41._MM_MIN_SHARED * W:
            continue
        for i in range(wave41._MM_BANDS):
            if len(hx) >= (i + 1) * W:
                sig = hashlib.md5(hx[i * W : (i + 1) * W].encode()).hexdigest()
                bands[(i, sig)].append(r["doc_id"])
    shared = defaultdict(int)
    for ids in bands.values():
        ids = sorted(set(ids))
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                shared[(a, b)] += 1
    profile = defaultdict(lambda: [0, 0])
    for (a, b), s in shared.items():
        if s >= wave41._MM_MIN_SHARED:
            profile[s][0] += 1
            profile[s][1] += a + b
    got = wave41.mm_band_near_dup(spark, sf_dir).collect()
    assert [r["shared"] for r in got] == sorted(profile)
    for r in got:
        n, ck = profile[r["shared"]]
        assert (r["n_pairs"], r["checksum"]) == (n, ck)
    # the fixture corpus carries prefix-identical near-dup groups:
    # at least one pair must share every prefix window
    assert sum(v[0] for v in profile.values()) > 0


def test_trigram_paths_matches_python(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    ).collect()
    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append(
            (int(r["ts"].timestamp()), r["event_id"], r["event_type"])
        )
    paths = defaultdict(lambda: [0, set()])
    for u, evs in by_user.items():
        evs.sort()
        types = [t for _, _, t in evs]
        for i in range(len(types) - 2):
            p = ">".join(types[i : i + 3])
            paths[p][0] += 1
            paths[p][1].add(u)
    ranked = sorted(paths.items(), key=lambda kv: (-kv[1][0], kv[0]))[
        : wave41._PATH_TOP
    ]
    got = wave41.ev_trigram_paths(spark, sf_dir).collect()
    assert len(got) == len(ranked)
    for row, (p, (n, users)) in zip(got, ranked):
        assert row["path"] == p
        assert row["n_occurrences"] == n
        assert row["n_users"] == len(users)


def test_kendall_tau_matches_python(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_shipdate", "l_quantity", "l_extendedprice"
    ).collect()
    days = defaultdict(lambda: [0, 0])
    for r in li:
        d = days[r["l_shipdate"]]
        d[0] += int(r["l_quantity"])
        d[1] += round(float(r["l_extendedprice"]) * 100)
    series = [v for _, v in sorted(days.items())]
    n = len(series)
    c = d = tx = ty = 0
    for i in range(n):
        for j in range(i + 1, n):
            sx = (series[j][0] > series[i][0]) - (series[j][0] < series[i][0])
            sy = (series[j][1] > series[i][1]) - (series[j][1] < series[i][1])
            if sx * sy == 1:
                c += 1
            elif sx * sy == -1:
                d += 1
            if sx == 0:
                tx += 1
            if sy == 0:
                ty += 1
    n0 = n * (n - 1) // 2
    got = wave41.ag_kendall_tau(spark, sf_dir).collect()
    assert len(got) == 1
    row = got[0]
    assert (row["n0"], row["c"], row["d"], row["tx"], row["ty"]) == (n0, c, d, tx, ty)
    assert row["tau_b"] == (c - d) / math.sqrt(float((n0 - tx) * (n0 - ty)))
    assert -1.0 <= row["tau_b"] <= 1.0
