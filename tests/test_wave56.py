"""Wave-56 invariants: capture-recapture and session-gap quartiles vs
exact Python references on sf0.001."""

from __future__ import annotations

from collections import defaultdict

from movie_data_etl_pipeline_spark.plans import wave56
from movie_data_etl_pipeline_spark.sources import load_table


def test_capture_recapture_matches_python(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id").collect()
    clicks = {r["user_id"] for r in ev if r["event_type"] == "click"}
    views = {r["user_id"] for r in ev if r["event_type"] == "view"}
    all_users = {r["user_id"] for r in ev}
    n1, n2 = len(clicks), len(views)
    m = len(clicks & views)
    got = wave56.ag_capture_recapture(spark, sf_dir).collect()
    assert len(got) == 1
    row = got[0]
    assert (row["n1"], row["n2"], row["m"], row["n_true"]) == (
        n1,
        n2,
        m,
        len(all_users),
    )
    assert row["lincoln_petersen"] == n1 * n2 / float(m)
    assert row["chapman"] == ((n1 + 1) * (n2 + 1)) // (m + 1) - 1
    # both estimators target the click∪view population and must land
    # in a sane bracket around it
    union = len(clicks | views)
    assert union <= row["chapman"] * 3
    assert row["chapman"] <= len(all_users) * 3


def _order_stat(values, mult, div):
    values = sorted(values)
    n = len(values)
    hist = defaultdict(int)
    for v in values:
        hist[v] += 1
    cum = 0
    for v in sorted(hist):
        if div * (cum + hist[v]) >= mult * n and div * cum < mult * n:
            return v
        cum += hist[v]
    raise AssertionError("unreachable")


def test_session_gap_median_matches_python(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts").collect()
    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append(int(r["ts"].timestamp()))
    gaps = []
    for secs in by_user.values():
        secs.sort()
        for a, b in zip(secs, secs[1:]):
            if b - a > wave56._SESSION_GAP_S:
                gaps.append(b - a)
    got = wave56.ev_session_gap_median(spark, sf_dir).collect()
    assert len(got) == 1
    row = got[0]
    assert row["n"] == len(gaps)
    assert row["q1_s"] == _order_stat(gaps, 1, 4)
    assert row["median_s"] == _order_stat(gaps, 1, 2)
    assert row["q3_s"] == _order_stat(gaps, 3, 4)
    assert row["q1_s"] <= row["median_s"] <= row["q3_s"]
    assert row["q1_s"] > wave56._SESSION_GAP_S
