"""Compile every repo module with warnings-as-errors so invalid escape
sequences (DeprecationWarning today, SyntaxError on Python's roadmap)
cannot creep back into oracle SQL strings."""

from __future__ import annotations

import glob
import warnings
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_no_invalid_escape_sequences():
    files = (
        glob.glob(str(REPO / "movie_data_etl_pipeline_spark/**/*.py"), recursive=True)
        + glob.glob(str(REPO / "tests/*.py"))
        + glob.glob(str(REPO / "tools/*.py"))
        + [str(REPO / "bench.py"), str(REPO / "__spark_entry__.py")]
    )
    assert len(files) > 50
    offenders = []
    for f in files:
        with open(f) as fh:
            src = fh.read()
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            compile(src, f, "exec")
        for w in caught:
            if issubclass(w.category, (SyntaxWarning, DeprecationWarning)):
                offenders.append((f, str(w.message)))
    assert not offenders, offenders
