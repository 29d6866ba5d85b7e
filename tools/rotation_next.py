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
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from movie_data_etl_pipeline_spark.plans.fixture_queries import QUERIES  # noqa: E402


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
            # driver format: {"rows_match": bool, "schema_match": bool,
            # "hash_match": bool, ...}; rows-only entries lack hash_match
            green = rec.get(
                "hash_match",
                rec.get("rows_match", rec.get("ok", False)),
            )
            if green is True:
                out[name] = rnd
    return out


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


if __name__ == "__main__":
    main()
