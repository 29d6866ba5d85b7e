"""Wave-36 invariants: item-item CF, correlation matrix, and the
string-function surface vs exact Python references on sf0.001."""

from __future__ import annotations

import hashlib
import math
import re
from collections import defaultdict

from movie_data_etl_pipeline_spark.plans import wave36
from movie_data_etl_pipeline_spark.sources import load_table


def test_item_item_cf_matches_python(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey").collect()
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").collect()
    cust_of = {r["o_orderkey"]: r["o_custkey"] for r in orders}
    baskets = defaultdict(set)
    for r in li:
        c = cust_of.get(r["l_orderkey"])
        if c is not None:
            baskets[c].add(r["l_partkey"])
    kept = {c: ps for c, ps in baskets.items() if len(ps) <= wave36._CF_MAX_BASKET}
    item_n = defaultdict(int)
    for ps in kept.values():
        for p in ps:
            item_n[p] += 1
    n_ab = defaultdict(int)
    for ps in kept.values():
        sp = sorted(ps)
        for i, pa in enumerate(sp):
            for pb in sp[i + 1 :]:
                n_ab[(pa, pb)] += 1
    scored = [
        (pa, pb, n, item_n[pa], item_n[pb], n / math.sqrt(float(item_n[pa] * item_n[pb])))
        for (pa, pb), n in n_ab.items()
        if n >= wave36._CF_MIN_SUPPORT
    ]
    scored.sort(key=lambda t: (-t[5], t[0], t[1]))
    want = scored[: wave36._CF_TOP]

    got = wave36.rc_item_item_cf(spark, sf_dir).collect()
    assert len(got) == len(want)
    for rnk, (row, w) in enumerate(zip(got, want), start=1):
        assert (row["pa"], row["pb"], row["n_ab"], row["n_a"], row["n_b"]) == w[:5]
        assert row["cosine"] == w[5]
        assert row["rnk"] == rnk


def test_corr_matrix_matches_python(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_extendedprice", "l_discount", "l_tax"
    ).collect()
    cols = {
        "qty": [int(r["l_quantity"]) for r in li],
        "price_usd": [math.floor(float(r["l_extendedprice"])) for r in li],
        "disc_pct": [round(float(r["l_discount"]) * 100) for r in li],
        "tax_pct": [round(float(r["l_tax"]) * 100) for r in li],
    }
    n = len(li)
    names = [name for name, _ in wave36._CORR_VARS]

    def corr(a, b):
        xs, ys = cols[a], cols[b]
        sx, sy = sum(xs), sum(ys)
        sxx = sum(x * x for x in xs)
        syy = sum(y * y for y in ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        nn = float(n)
        cov = sxy / nn - (sx / nn) * (sy / nn)
        vx = sxx / nn - (sx / nn) * (sx / nn)
        vy = syy / nn - (sy / nn) * (sy / nn)
        return cov / (math.sqrt(vx) * math.sqrt(vy))

    got = wave36.ag_corr_matrix(spark, sf_dir).collect()
    pairs = [(a, b) for i, a in enumerate(names) for b in names[i + 1 :]]
    assert [(r["var_x"], r["var_y"]) for r in got] == sorted(pairs)
    for r in got:
        assert r["n"] == n
        assert r["corr"] == corr(r["var_x"], r["var_y"])
        assert -1.0 <= r["corr"] <= 1.0


def test_string_surface_matches_python(spark, sf_dir):
    parts = {
        r["p_partkey"]: r
        for r in load_table(spark, sf_dir, "part").collect()
        if r["p_partkey"] < 200
    }
    got = wave36.fn_string_surface(spark, sf_dir).collect()
    assert [r["p_partkey"] for r in got] == sorted(parts)
    for row in got:
        name = parts[row["p_partkey"]]["p_name"]
        assert row["up"] == name.upper()
        assert row["len"] == len(name)
        assert row["sub38"] == name[2:10]
        assert row["pos_a"] == name.find("a") + 1
        assert row["underscored"] == name.replace(" ", "_")
        assert row["vowel_digits"] == name.translate(str.maketrans("aeiou", "12345"))
        lp = name[:12] if len(name) >= 12 else "*" * (12 - len(name)) + name
        assert row["lpad12"] == lp
        rp = name[:14] if len(name) >= 14 else name + "." * (14 - len(name))
        assert row["rpad14"] == rp
        assert row["rev"] == name[::-1]
        assert row["rep3x2"] == name[:3] * 2
        assert row["n_words"] == len(name.split(" "))
        m = re.search(r"[a-z]+", name)
        assert row["first_word"] == (m.group(0) if m else "")
        assert row["md5_hex"] == hashlib.md5(name.encode()).hexdigest()
        r = parts[row["p_partkey"]]
        assert row["brand_type"] == f"{r['p_brand']}-{r['p_type']}"
