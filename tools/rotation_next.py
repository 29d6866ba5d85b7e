"""Round-N rotation helper: compute the driver-correctness window state
from the CORRECTNESS_r*.json artifacts and the live registry.

The round driver checks only the FIRST 50 insertion-ordered entries of
``queries()``; ``plans/fixture_queries._rotated()`` therefore orders the
registry as (current window) -> (never-checked, build order) ->
(driver-green tail). At each round boundary:

    python tools/rotation_next.py

prints (a) every name with a green driver row so far (to fold into the
checked frozenset), (b) the names in the CURRENT front-50 window that
got their row this round, and (c) the NEXT 50 never-checked candidates
in build order — the raw material for the next ``_R{N}_WINDOW``.
Pre-verify the new window with

    python tools/crosscheck.py /root/testdata/sf0.01 <the 50 names>

before committing the reorder.
"""

from __future__ import annotations

import glob
import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from movie_data_etl_pipeline_spark.plans.fixture_queries import QUERIES  # noqa: E402


def _is_green(rec: dict) -> bool:
    """A driver row counts as green when the oracle pair hash-matched,
    OR when the entry is rows-only by design (``err == 'no_oracle'``)
    and the driver recorded a sane row count — the weaker check the
    driver applies to the 8 registry entries without a DuckDB oracle
    (xxhash64/Gaussian production twins, the live-source scan, the
    agreement-floored sketch)."""
    green = rec.get("hash_match", rec.get("rows_match", rec.get("ok", False)))
    if green is True:
        return True
    return rec.get("err") == "no_oracle" and rec.get("spark_rows") is not None


def driver_checked() -> dict[str, str]:
    """name -> latest round with a green driver row."""
    out: dict[str, str] = {}
    for path in sorted(glob.glob(str(Path(__file__).parent.parent / "CORRECTNESS_r*.json"))):
        rnd = Path(path).stem.split("_r")[-1]
        try:
            data = json.loads(Path(path).read_text())
        except (OSError, json.JSONDecodeError):
            continue
        rows = data.get("queries", data if isinstance(data, dict) else {})
        for name, rec in rows.items():
            if not isinstance(rec, dict):
                continue
            if _is_green(rec):
                out[name] = rnd
    return out


def first_checked() -> dict[str, str]:
    """name -> FIRST round with a green driver row (staleness is
    measured from the first attest unless a later re-attest refreshed
    it — driver_checked() gives the refresh; this gives the origin)."""
    out: dict[str, str] = {}
    for path in sorted(glob.glob(str(Path(__file__).parent.parent / "CORRECTNESS_r*.json"))):
        rnd = Path(path).stem.split("_r")[-1]
        try:
            data = json.loads(Path(path).read_text())
        except (OSError, json.JSONDecodeError):
            continue
        rows = data.get("queries", data if isinstance(data, dict) else {})
        for name, rec in rows.items():
            if isinstance(rec, dict) and name not in out and _is_green(rec):
                out[name] = rnd
    return out


def window_counts_line() -> str:
    """The machine-derived rotation-comment count line (VERDICT-r9 ask
    #5: counts can no longer go stale silently — the registry contract
    test recomputes this exact string from the live lists and asserts
    the rotation comment contains it verbatim)."""
    from movie_data_etl_pipeline_spark.plans import fixture_queries as FQ

    recheck_names = [n for n in dir(FQ) if n.endswith("_RECHECKS")]
    reattest_names = [n for n in dir(FQ) if n.endswith("_REATTESTS")]
    window_names = [n for n in dir(FQ) if re.fullmatch(r"_R\d+_WINDOW", n)]
    rechecks = list(getattr(FQ, recheck_names[0])) if recheck_names else []
    reattests = list(getattr(FQ, reattest_names[0])) if reattest_names else []
    window = list(getattr(FQ, window_names[0])) if window_names else []
    rnd = window_names[0].split("_")[1].lstrip("R") if window_names else "?"
    other = len(window) - len(rechecks) - len(reattests)
    return (
        f"window r{rnd}: {len(window)} = {len(rechecks)} re-checks"
        f" + {len(reattests)} re-attests + {other} never-checked"
    )


def main() -> None:
    names = list(QUERIES)
    checked = driver_checked()
    window = names[:50]
    never = [n for n in names if n not in checked]
    print(f"registry: {len(names)}  driver-green (any round): {len(checked)}")
    print(f"\ncurrent front-50 window, green this latest round:")
    for n in window:
        print(f"  {'OK ' if n in checked else '-- '}{n}")
    print(f"\nnever-checked remaining: {len(never)}")
    if never:
        print("next 50 window candidates (build order):")
        nxt = [n for n in never if n not in window][:50]
        for n in nxt:
            print(f"  {n}")
    else:
        # post-union era (r10+): every window is pure re-attestation —
        # front-load any in-round plan rewrites, then fill with the 50
        # OLDEST-attested names (round last checked asc, build order
        # within a round)
        order = {n: i for i, n in enumerate(names)}
        stale = sorted(checked, key=lambda n: (int(checked[n]), order.get(n, 1 << 30)))
        print("union closed — next 50 re-attest candidates (oldest driver row first):")
        for n in stale[:50]:
            print(f"  r{checked[n]:>2} {n}")
    print("\nfold-into-checked frozenset (sorted):")
    print(sorted(checked))
    print("\nmachine-derived rotation-comment count line:")
    print(f"  {window_counts_line()}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--counts":
        print(window_counts_line())
    else:
        main()
