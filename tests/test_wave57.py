"""Wave-57 invariants: Cohen's kappa and odds ratio vs exact Python
references on sf0.001."""

from __future__ import annotations

from movie_data_etl_pipeline_spark.plans import wave57
from movie_data_etl_pipeline_spark.sources import load_table


def test_cohens_kappa_matches_python(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("text").collect()
    yy = yn = ny = nn = 0
    for r in docs:
        a = len(r["text"]) >= 80
        b = len(r["text"].split(" ")) >= 15
        if a and b:
            yy += 1
        elif a:
            yn += 1
        elif b:
            ny += 1
        else:
            nn += 1
    n = yy + yn + ny + nn
    po = (yy + nn) / float(n)
    pe = ((yy + yn) * (yy + ny) + (ny + nn) * (yn + nn)) / float(n * n)
    kappa = (po - pe) / (1.0 - pe)
    got = wave57.ag_cohens_kappa(spark, sf_dir).collect()
    assert len(got) == 1
    row = got[0]
    assert (row["n"], row["yy"], row["yn"], row["ny"], row["nn"]) == (
        n,
        yy,
        yn,
        ny,
        nn,
    )
    assert row["p_observed"] == po
    assert row["kappa"] == kappa
    assert -1.0 <= row["kappa"] <= 1.0


def test_odds_ratio_matches_python(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_discount", "l_returnflag"
    ).collect()
    a = b = c = d = 0
    for r in li:
        exposed = float(r["l_discount"]) >= 0.05
        outcome = r["l_returnflag"] == "R"
        if exposed and outcome:
            a += 1
        elif exposed:
            b += 1
        elif outcome:
            c += 1
        else:
            d += 1
    got = wave57.ag_odds_ratio(spark, sf_dir).collect()
    assert len(got) == 1
    row = got[0]
    assert (row["a"], row["b"], row["c"], row["d"]) == (a, b, c, d)
    assert row["odds_ratio"] == a * d / float(b * c)
    assert row["odds_ratio_smoothed"] == (a + 1) * (d + 1) / float((b + 1) * (c + 1))
    assert row["odds_ratio"] > 0.0
