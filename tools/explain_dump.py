"""Dump ``.explain("formatted")`` for named registry queries to files —
the plan evidence for optimization rounds (plans/r10/<name>_before.txt /
_after.txt): the judge cannot run Spark and checks plan-shape claims
(Exchange counts, join strategies, PushedFilters, Python-eval nodes)
against these files.

    python tools/explain_dump.py OUTDIR SUFFIX name [name ...]
    python tools/explain_dump.py plans/r10 before qa_replica_diff emb_pca_power

Plans are compiled (not executed) at $SPARK_GRAFT_SF_DIR (default
sf0.1) — explain is plan-only, so this is cheap and does not disturb a
concurrently-running measurement.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from movie_data_etl_pipeline_spark.plans import fixture_queries as FQ
from movie_data_etl_pipeline_spark.session import get_spark


def explain_formatted(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def main() -> None:
    if len(sys.argv) < 4:
        sys.exit(__doc__)
    outdir, suffix, names = Path(sys.argv[1]), sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    outdir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("explain-dump")
    for name in names:
        df = FQ.QUERIES[name](spark, sf_dir)
        text = explain_formatted(df)
        path = outdir / f"{name}_{suffix}.txt"
        path.write_text(text)
        print(f"wrote {path} ({len(text)} bytes)")


if __name__ == "__main__":
    main()
