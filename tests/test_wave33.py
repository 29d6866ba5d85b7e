"""Wave-33 invariants: OOF encoding and grouped-split audit vs exact
Python references on the sf0.001 fixtures."""

from __future__ import annotations

from collections import defaultdict

from movie_data_etl_pipeline_spark.functions import portable_hash as ph
from movie_data_etl_pipeline_spark.plans import wave33
from movie_data_etl_pipeline_spark.sources import load_table


def test_oof_encode_matches_python(spark, sf_dir):
    rows = {
        (r["category"], r["fold"]): r
        for r in wave33.fe_oof_target_encode(spark, sf_dir).collect()
    }
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    ).collect()
    cell = defaultdict(lambda: [0, 0])
    for r in orders:
        fold = ph.py_mix(r["o_orderkey"] % ph.P) % wave33._OOF_K
        c = cell[(r["o_orderpriority"], fold)]
        c[0] += int(round(r["o_totalprice"] * 100))
        c[1] += 1
    cat = defaultdict(lambda: [0, 0])
    for (category, _), (s, n) in cell.items():
        cat[category][0] += s
        cat[category][1] += n
    assert set(rows) == set(cell)
    for (category, fold), (s_cf, n_cf) in cell.items():
        s_c, n_c = cat[category]
        r = rows[(category, fold)]
        assert r["n_cf"] == n_cf
        if n_c > n_cf:
            assert r["oof_mean_c"] == int(round((s_c - s_cf) / (n_c - n_cf)))
        else:
            assert r["oof_mean_c"] is None
    # leakage property: a cell's encoding never uses its own rows —
    # removing the cell changes the encoding whenever the cell mean
    # differs from the category mean
    for (category, fold), (s_cf, n_cf) in cell.items():
        s_c, n_c = cat[category]
        if n_c > n_cf and n_cf > 0:
            own_in = round(s_c / n_c)
            oof = rows[(category, fold)]["oof_mean_c"]
            if abs(s_cf / n_cf - s_c / n_c) > 1.0:
                assert oof != own_in or n_cf == 0


def test_group_kfold_audit(spark, sf_dir):
    rows = {r["scheme"]: r for r in wave33.sa_group_kfold_audit(spark, sf_dir).collect()}
    assert rows["grouped_by_customer"]["n_spanning"] == 0
    # the naive split must actually leak on this fixture (customers
    # with >1 order exist), otherwise the audit demonstrates nothing
    assert rows["naive_by_order"]["n_spanning"] > 0
    assert rows["naive_by_order"]["n_groups"] == rows["grouped_by_customer"]["n_groups"]
