"""Wave-42 invariants: JSON surface and conditional surface vs exact
Python references on sf0.001."""

from __future__ import annotations

import json

from movie_data_etl_pipeline_spark.plans import wave42
from movie_data_etl_pipeline_spark.sources import load_table


def test_json_surface_matches_python(spark, sf_dir):
    parts = {
        r["p_partkey"]: r
        for r in load_table(spark, sf_dir, "part").collect()
        if r["p_partkey"] < 200
    }
    got = wave42.fn_json_surface(spark, sf_dir).collect()
    assert [r["k"] for r in got] == sorted(parts)
    for row in got:
        p = parts[row["k"]]
        k = row["k"]
        want = {
            "k": k,
            "brand": p["p_brand"],
            "mods": [k % 3, k % 5, k % 7],
            "sub": {"size": p["p_size"], "ty": p["p_type"][:6]},
        }
        want_j = json.dumps(want, separators=(",", ":"))
        assert row["j"] == want_j
        assert row["brand"] == p["p_brand"]
        assert row["k_back"] == k
        assert row["mod1"] == k % 5
        assert row["n_mods"] == 3
        assert row["sub_size"] == p["p_size"]
        assert row["sub_ty"] == p["p_type"][:6]
        assert row["missing_field"] is None
        assert row["j_len"] == len(want_j)


def test_conditional_surface_matches_python(spark, sf_dir):
    parts = {
        r["p_partkey"]: r
        for r in load_table(spark, sf_dir, "part").collect()
        if r["p_partkey"] < 300
    }
    got = wave42.fn_conditional_surface(spark, sf_dir).collect()
    assert [r["k"] for r in got] == sorted(parts)
    saw_null = False
    for row in got:
        p = parts[row["k"]]
        k, sz = row["k"], p["p_size"]
        nsz = None if sz == 25 else sz
        saw_null = saw_null or nsz is None
        assert row["sz"] == sz
        assert row["nullable_sz"] == nsz
        assert row["coal"] == (nsz if nsz is not None else k % 10)
        assert row["ifn"] == (nsz if nsz is not None else -1)
        assert row["size_class"] == (
            "small" if sz < 10 else "medium" if sz < 30 else "large"
        )
        assert row["least3"] == min(k % 13, sz, 9)
        assert row["greatest3"] == max(k % 13, sz, 9)
        assert row["least_nullskip"] == (sz if nsz is None else min(nsz, sz))
        tvl_gt = None if nsz is None else nsz > 20
        assert row["tvl_gt"] == {None: "unknown", True: "true", False: "false"}[tvl_gt]
        tvl_or = True if sz > 20 else (None if nsz is None else nsz > 20)
        assert row["tvl_or"] == {None: "unknown", True: "true", False: "false"}[tvl_or]
        tvl_and = (
            False
            if (nsz is not None and nsz <= 20) or sz <= 20
            else (None if nsz is None else True)
        )
        assert row["tvl_and"] == {None: "unknown", True: "true", False: "false"}[
            tvl_and
        ]
        assert row["nvl2_tag"] == ("null" if nsz is None else "has")
    # the probe must actually exercise the null path
    assert saw_null
