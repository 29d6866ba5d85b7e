"""Merge N raw bench-run JSON lines (the FIRST stdout line of
``python bench.py``, the one carrying the per-query dict) into one
merged-bests local record line and append it to
``tools/bench_r{N}_local.json``.

Per-query merged best = min over runs (the bench's own best-of-2
steady-state convention, extended across runs); the record carries
per-run totals/drift so the drift story travels with the number.
Runs merged together MUST be of the same code (same plans) — the tool
refuses to append to a file whose last record has a different
``code_tag`` unless ``--new-epoch`` is passed (post-optimization runs
must not be merged with pre-optimization bests).

    python tools/merge_bench_runs.py OUT_JSON CODE_TAG NOTE run1.json [run2.json ...] [--new-epoch]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--new-epoch"]
    new_epoch = "--new-epoch" in sys.argv
    if len(args) < 4:
        sys.exit(__doc__)
    out_path, code_tag, note, run_files = Path(args[0]), args[1], args[2], args[3:]

    runs = []
    for rf in run_files:
        for line in Path(rf).read_text().strip().splitlines():
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if rec.get("metric") == "headline_total" and "queries" in rec:
                runs.append(rec)
                break
        else:
            sys.exit(f"merge_bench_runs: no per-query headline record in {rf}")

    names = set(runs[0]["queries"])
    for r in runs[1:]:
        if set(r["queries"]) != names:
            sys.exit("merge_bench_runs: runs disagree on query set")

    merged = {
        n: round(min(r["queries"][n] for r in runs), 3) for n in runs[0]["queries"]
    }
    out = {
        "metric": "headline_total_merged_bests",
        "value": round(sum(merged.values()), 3),
        "unit": "sec",
        "n_runs": len(runs),
        "code_tag": code_tag,
        "per_run_value": [r["value"] for r in runs],
        "per_run_drift": [r.get("drift_factor") for r in runs],
        "per_run_cold": [r.get("cold_total") for r in runs],
        "calib_core_r2_ref": runs[0].get("calib_core_r2_ref"),
        "note": note,
        "queries": merged,
        "sf": runs[0]["sf"],
    }
    if out_path.exists():
        last = json.loads(out_path.read_text().strip().splitlines()[-1])
        if last.get("code_tag") != code_tag and not new_epoch:
            sys.exit(
                f"merge_bench_runs: last record code_tag={last.get('code_tag')!r} "
                f"!= {code_tag!r}; pass --new-epoch to append a new epoch "
                "(never merge bests across plan changes)"
            )
        with out_path.open("a") as fh:
            fh.write(json.dumps(out) + "\n")
    else:
        out_path.write_text(json.dumps(out) + "\n")
    print(json.dumps({k: v for k, v in out.items() if k != "queries"}))


if __name__ == "__main__":
    main()
