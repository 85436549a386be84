#!/usr/bin/env python
"""Plan-shape regression gate: per-query counts of the scale-relevant
physical operators (shuffles, broadcasts, join kinds, aggregates,
windows, sorts, scans, Python-eval nodes) diffed against the committed
PLAN_BASELINE.json.

A correctness gate can stay green while a plan silently regresses — a
broadcast collapsing to a shuffle join, a second exchange sneaking in
behind a refactor, a whole-stage expression falling back to Python.
The bench catches the big ones hours later; this catches the shape
change at commit time, like a golden-file test for Catalyst output.

Usage:
  python tools/plan_baseline.py             # check against baseline
  python tools/plan_baseline.py --update    # rewrite the baseline
  python tools/plan_baseline.py [name ...]  # restrict to queries

Exit 1 on any drift (changed signature, vanished query) or on queries
missing from the baseline (run --update after adding queries and
review the new signatures in the diff).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASELINE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "PLAN_BASELINE.json",
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--update", action="store_true")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from clinvar_pipeline_spark.audit import plan_signatures
    from clinvar_pipeline_spark.session import get_spark

    spark = get_spark(app_name="plan-baseline")
    spark.sparkContext.setLogLevel("ERROR")
    sigs = plan_signatures(spark, args.sf, args.names or None)

    if args.update:
        old = {}
        if os.path.exists(BASELINE):
            with open(BASELINE) as f:
                old = json.load(f)
        old.update(sigs)
        if not args.names:
            # full run defines the complete set: drop vanished queries
            old = sigs
        with open(BASELINE, "w") as f:
            json.dump(old, f, indent=1, sort_keys=True)
        print(f"baseline updated: {len(old)} queries -> {BASELINE}")
        return

    if not os.path.exists(BASELINE):
        print("no PLAN_BASELINE.json — run with --update first")
        sys.exit(1)
    with open(BASELINE) as f:
        base = json.load(f)

    drift, missing = [], []
    for name, sig in sigs.items():
        if name not in base:
            missing.append(name)
        elif base[name] != sig:
            drift.append(name)
            print(f"DRIFT {name}:")
            keys = sorted(set(base[name]) | set(sig))
            for k in keys:
                b, g = base[name].get(k, 0), sig.get(k, 0)
                if b != g:
                    print(f"    {k}: baseline={b} now={g}")
        else:
            print(f"ok    {name}")
    for name in missing:
        print(f"NEW   {name}: not in baseline (run --update and review)")

    n = len(sigs)
    print(f"\n{n - len(drift) - len(missing)}/{n} match baseline")
    if drift or missing:
        sys.exit(1)


if __name__ == "__main__":
    main()
