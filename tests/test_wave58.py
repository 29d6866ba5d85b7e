"""Wave-58 invariants: DAU/WAU/MAU stickiness vs an exact Python
reference on sf0.001."""

from __future__ import annotations

from collections import defaultdict
from datetime import timedelta

from movie_data_etl_pipeline_spark.plans import wave58
from movie_data_etl_pipeline_spark.sources import load_table


def test_stickiness_matches_python(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts").collect()
    ud = {(r["user_id"], r["ts"].date()) for r in ev}
    by_day = defaultdict(set)
    for u, d in ud:
        by_day[d].add(u)
    days = sorted(by_day)
    d0 = min(days)
    targets = [d for d in days if (d - d0).days >= wave58._MAU_DAYS - 1]
    got = wave58.ev_stickiness(spark, sf_dir).collect()
    assert [r["day"] for r in got] == [d.isoformat() for d in targets]
    for row, d in zip(got, targets):
        dau = by_day[d]
        wau = set().union(
            *(by_day.get(d - timedelta(days=o), set()) for o in range(wave58._WAU_DAYS))
        )
        mau = set().union(
            *(by_day.get(d - timedelta(days=o), set()) for o in range(wave58._MAU_DAYS))
        )
        assert row["dau"] == len(dau)
        assert row["wau"] == len(wau)
        assert row["mau"] == len(mau)
        assert row["dau_wau"] == len(dau) / float(len(wau))
        assert row["dau_mau"] == len(dau) / float(len(mau))
        # actives nest: DAU ⊆ WAU ⊆ MAU
        assert len(dau) <= len(wau) <= len(mau)
