"""Wave-40 invariants: array surface, correlated-subquery rollup, and
rank surface vs exact Python references on sf0.001."""

from __future__ import annotations

from collections import defaultdict

from movie_data_etl_pipeline_spark.plans import wave40
from movie_data_etl_pipeline_spark.sources import load_table


def test_array_surface_matches_python(spark, sf_dir):
    keys = sorted(
        r["p_partkey"]
        for r in load_table(spark, sf_dir, "part").select("p_partkey").collect()
        if r["p_partkey"] < 300
    )
    got = wave40.fn_array_surface(spark, sf_dir).collect()
    assert [r["k"] for r in got] == keys

    def render(xs):
        return "|".join(str(x) for x in xs)

    for r in got:
        k = r["k"]
        base = [k % 7, k % 5, k % 3, k % 5, 2]
        seq = list(range(1, 2 + k % 4))
        assert r["base_s"] == render(base)
        assert r["sorted_s"] == render(sorted(base))
        assert r["dsorted_s"] == render(sorted(base, reverse=True))
        assert r["distinct_s"] == render(sorted(set(base)))
        assert r["has3"] == (3 in base)
        assert r["pos_k5"] == base.index(k % 5) + 1
        assert r["sz"] == len(base)
        assert r["mn"] == min(base)
        assert r["mx"] == max(base)
        assert r["total"] == sum(base)
        assert r["slice23_s"] == render(base[1:4])
        assert r["seq_s"] == render(seq)
        assert r["seq_sum"] == sum(seq)
        assert r["flat_s"] == render(sorted(base) + seq)


def test_correlated_agg_matches_python(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    ).collect()
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority", "o_totalprice"
    ).collect()
    per = defaultdict(lambda: [0, 0, 0, False])  # cnt, max, sum, urgent
    for r in orders:
        cents = round(float(r["o_totalprice"]) * 100)
        c = per[r["o_custkey"]]
        c[0] += 1
        c[1] = max(c[1], cents)
        c[2] += cents
        c[3] = c[3] or r["o_orderpriority"] == "1-URGENT"
    segs = defaultdict(lambda: [0, 0])
    for r in cust:
        c = per.get(r["c_custkey"])
        if c and c[3] and c[1] * c[0] >= 2 * c[2]:
            segs[r["c_mktsegment"]][0] += 1
            segs[r["c_mktsegment"]][1] += r["c_custkey"]
    got = wave40.sq_correlated_agg(spark, sf_dir).collect()
    assert [r["c_mktsegment"] for r in got] == sorted(segs)
    for r in got:
        n, ck = segs[r["c_mktsegment"]]
        assert (r["n_cust"], r["checksum"]) == (n, ck)


def test_rank_surface_matches_python(spark, sf_dir):
    orders = [
        r
        for r in load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .collect()
        if r["o_orderkey"] % 97 == 0
    ]
    parts = defaultdict(list)
    for r in orders:
        parts[r["o_orderpriority"]].append(round(float(r["o_totalprice"]) * 100))
    got = wave40.w11_rank_surface(spark, sf_dir).collect()
    assert len(got) == len(orders)
    for r in got:
        vals = parts[r["priority"]]
        n = len(vals)
        above = sum(1 for v in vals if v > r["cents"])
        at_or_above = sum(1 for v in vals if v >= r["cents"])
        distinct_above = len({v for v in vals if v > r["cents"]})
        assert r["rnk"] == above + 1
        assert r["drnk"] == distinct_above + 1
        assert r["prnk"] == (above / (n - 1) if n > 1 else 0.0)
        assert r["cdist"] == at_or_above / n
