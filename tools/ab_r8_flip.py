"""Interleaved same-session A/B for the engine-wide AQE
flip-to-broadcast closure (VERDICT-r7 ask #3):

    A = spark.sql.adaptive.autoBroadcastJoinThreshold inherited from
        spark.sql.autoBroadcastJoinThreshold (64 MB) — runtime
        SMJ/SHJ -> BHJ conversion ON (the pre-round-8 behavior)
    B = -1 — runtime conversion OFF (the fault-class closure)

The conf is runtime-settable, so both arms run in ONE session with
reps interleaved A,B,A,B,... per query — box drift hits both arms
equally, unlike cross-session bench comparisons (the two r8 bench
runs moved 25% apart on drift alone and their calibration core is
itself sensitive to this config, which invalidates drift
normalization for exactly this experiment).

Output values are identical by construction (the conf only moves the
physical join strategy), so the comparison is noop-sink wall time,
best-of-REPS per arm. Usage:

    python tools/ab_r8_flip.py [SF_DIR] [REPS] [query ...]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from movie_data_etl_pipeline_spark.plans import fixture_queries as FQ
from movie_data_etl_pipeline_spark.session import get_spark

FLIP_CONF = "spark.sql.adaptive.autoBroadcastJoinThreshold"
ARMS = {"flip_on": str(64 * 1024 * 1024), "flip_off": "-1"}


def main() -> None:
    # ADVICE-r8 #2: parse positionally and hard-error on anything
    # unconsumed (the old '/'-sniffing silently dropped a second path
    # or a second digit arg and benchmarked the default sf0.1).
    import argparse

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=None)
    ap.add_argument("queries", nargs="*")
    # legacy positional forms ("SF_DIR REPS q ..") keep working: lift a
    # leading path into --sf and a leading integer into --reps, error on
    # any later path/integer that would previously have been dropped.
    argv = sys.argv[1:]
    if argv and "/" in argv[0]:
        argv = ["--sf", argv[0], *argv[1:]]
    ns = ap.parse_args(argv)
    if ns.queries and ns.queries[0].isdigit():
        if ns.reps is not None:
            sys.exit(
                f"ab_r8_flip: both --reps {ns.reps} and a positional rep "
                f"count {ns.queries[0]} given — use one"
            )
        ns.reps = int(ns.queries[0])
        ns.queries = ns.queries[1:]
    if ns.reps is None:
        ns.reps = 2
    if ns.reps < 1:
        sys.exit("ab_r8_flip: --reps must be >= 1")
    stray = [a for a in ns.queries if "/" in a or a.isdigit()]
    if stray:
        sys.exit(f"ab_r8_flip: unconsumed path/number args {stray} — "
                 "use --sf/--reps; query names cannot contain '/'")
    sf_dir = ns.sf
    reps = ns.reps
    names = ns.queries or list(FQ.QUERIES)
    unknown = [n for n in names if n not in FQ.QUERIES]
    if unknown:
        sys.exit(f"ab_r8_flip: unknown queries {unknown}")
    spark = get_spark("ab-r8-flip")
    # warmup
    FQ.QUERIES["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    best: dict[str, dict[str, float]] = {a: {} for a in ARMS}
    for name in names:
        fn = FQ.QUERIES[name]
        for _ in range(reps):
            for arm, val in ARMS.items():
                spark.conf.set(FLIP_CONF, val)
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                if name not in best[arm] or dt < best[arm][name]:
                    best[arm][name] = round(dt, 3)
        print(
            f"{name}: on={best['flip_on'][name]} off={best['flip_off'][name]}",
            file=sys.stderr,
            flush=True,
        )
    tot = {a: round(sum(v.values()), 2) for a, v in best.items()}
    print(json.dumps({"totals": tot, "per_query": best, "sf": sf_dir, "reps": reps}))


if __name__ == "__main__":
    main()
