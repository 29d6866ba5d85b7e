"""Wave-53 invariants: changepoint and concurrency sweep vs exact
Python references on sf0.001."""

from __future__ import annotations

import math
from collections import defaultdict

from movie_data_etl_pipeline_spark.plans import wave53
from movie_data_etl_pipeline_spark.sources import load_table


def test_changepoint_matches_python(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_shipdate", "l_extendedprice"
    ).collect()
    days = defaultdict(int)
    for r in li:
        days[r["l_shipdate"]] += math.floor(float(r["l_extendedprice"]))
    series = sorted(days.items())
    n = len(series)
    sy = sum(y for _, y in series)
    best = None
    cum = 0
    for i, (d, y) in enumerate(series[:-1], start=1):
        cum += y
        ml = cum / float(i)
        mr = (sy - cum) / float(n - i)
        gain = i * (n - i) / float(n) * (ml - mr) ** 2
        if best is None or gain > best[5] or (gain == best[5] and d < best[0]):
            best = (d, i, n - i, ml, mr, gain)
    got = wave53.ts_changepoint_binseg(spark, sf_dir).collect()
    assert len(got) == 1
    row = got[0]
    assert str(row["split_day"])[:10] == str(best[0])[:10]
    assert (row["n_l"], row["n_r"]) == (best[1], best[2])
    assert row["mean_left"] == best[3]
    assert row["mean_right"] == best[4]
    assert row["gain"] == best[5]


def test_concurrency_sweep_matches_python(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts").collect()
    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append(int(r["ts"].timestamp()))
    intervals = []
    for secs in by_user.values():
        secs.sort()
        start = prev = secs[0]
        for s in secs[1:]:
            if s - prev > wave53._SESSION_GAP_S:
                intervals.append((start, prev))
                start = s
            prev = s
        intervals.append((start, prev))
    deltas = defaultdict(int)
    for a, b in intervals:
        deltas[a] += 1
        deltas[b + 1] -= 1
    days = defaultdict(lambda: [0, 0, 0])  # peak, closing, transitions
    active = 0
    for t in sorted(deltas):
        active += deltas[t]
        d = days[t // 86400]
        d[0] = max(d[0], active)
        d[1] = active  # last t in day wins (sorted order)
        d[2] += 1
    got = wave53.ev_concurrency_sweep(spark, sf_dir).collect()
    assert [r["epoch_day"] for r in got] == sorted(days)
    for r in got:
        peak, closing, trans = days[r["epoch_day"]]
        assert r["peak_concurrency"] == peak
        assert r["closing_concurrency"] == closing
        assert r["n_transitions"] == trans
    # the sweep must end fully drained
    assert active == 0
