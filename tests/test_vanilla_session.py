"""Guard against "works only under get_spark's confs" (VERDICT r4 §What's
wrong #2): the correctness driver builds a VANILLA SparkSession — none of
the repo factory's confs (``python.filterPushdown``, ``nanosAsLong``,
``autoBroadcastJoinThreshold=64m``, UTC timezone, Arrow) exist there. Any
query whose plan or values depend on a ``get_spark``-only conf passes
every local gate (crosscheck, pytest, bench) and then fails or
hash-mismatches under the driver — r4's ``src_paged_api`` red row was
exactly this class.

This test runs the CURRENT driver window (the first 50 registry entries —
the ones the driver will actually execute this round) in a subprocess
whose session is built with ``SparkSession.builder.master(...)`` and no
other config, and compares row-count + order-insensitive value hash
against the same queries under the repo session. An error under vanilla,
or a value divergence between the two sessions, fails with the query
named.
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys
import textwrap
from pathlib import Path

import pandas as pd
import pytest

REPO_ROOT = str(Path(__file__).resolve().parents[1])
# same sourcing rule as tests/conftest.py (not importable: tests/ is
# not a package)
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
WINDOW = 50

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR),
    reason=f"fixture dir {SF_DIR} absent (driver-generated testdata)",
)

# One hashing implementation, used verbatim in both sessions (keep in
# sync textually — the subprocess re-executes this source).
_NORMALIZE_SRC = '''
import hashlib


def result_hash(pdf):
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    out = pdf.copy()
    for c in out.columns:
        if str(out[c].dtype) in ("float64", "float32"):
            out[c] = out[c].round(9)
    rows = sorted(out.astype(str).itertuples(index=False, name=None))
    return hashlib.md5(repr(rows).encode()).hexdigest()
'''

exec(_NORMALIZE_SRC)  # defines result_hash in this module


def _subprocess_script(limit: int | None) -> str:
    bound = "" if limit is None else f"[:{limit}]"
    return f'''
import json, sys, traceback

sys.path.insert(0, {REPO_ROOT!r})
{_NORMALIZE_SRC}

from pyspark.sql import SparkSession

# deliberately NO repo confs — this is the driver's session shape
spark = (
    SparkSession.builder.master("local[4]")
    .appName("vanilla-session-guard")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as m

qs = m.queries()
out = {{}}
for name in list(qs){bound}:
    try:
        pdf = qs[name](spark, {SF_DIR!r}).toPandas()
        out[name] = {{"rows": len(pdf), "hash": result_hash(pdf)}}
    except Exception as e:
        out[name] = {{"error": traceback.format_exc()[-800:]}}
print("VANILLA_RESULT " + json.dumps(out))
spark.stop()
'''


def _run_and_compare(spark, limit: int | None, timeout: int) -> None:
    proc = subprocess.run(
        [sys.executable, "-c", _subprocess_script(limit)],
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=REPO_ROOT,
    )
    lines = [
        line for line in proc.stdout.splitlines() if line.startswith("VANILLA_RESULT ")
    ]
    assert lines, (
        "vanilla subprocess produced no result line\n"
        f"stdout tail: {proc.stdout[-1500:]}\nstderr tail: {proc.stderr[-1500:]}"
    )
    vanilla = json.loads(lines[-1][len("VANILLA_RESULT ") :])

    errors = {n: r["error"] for n, r in vanilla.items() if "error" in r}
    assert not errors, f"queries ERROR under a vanilla session: {errors}"

    import __spark_entry__ as m

    qs = m.queries()
    names = list(qs) if limit is None else list(qs)[:limit]
    mismatches = {}
    for name in names:
        pdf = qs[name](spark, SF_DIR).toPandas()
        repo = {"rows": len(pdf), "hash": result_hash(pdf)}
        if repo != vanilla[name]:
            mismatches[name] = {"repo": repo, "vanilla": vanilla[name]}
    assert not mismatches, (
        "queries produce DIFFERENT results under a vanilla session "
        f"(conf-dependent values): {mismatches}"
    )


def test_driver_window_is_session_independent(spark):
    _run_and_compare(spark, WINDOW, timeout=1700)


@pytest.mark.slow
def test_full_registry_is_session_independent(spark):
    """The whole-registry variant (VERDICT-r5 ask #5): certifies every
    entry — not just the driver window — against the conf-dependence
    failure class before its driver round arrives. Marked slow; run
    explicitly once per round:

        python -m pytest tests/test_vanilla_session.py -m slow -q
    """
    _run_and_compare(spark, None, timeout=5400)
