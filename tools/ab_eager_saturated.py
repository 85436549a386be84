#!/usr/bin/env python
"""VERDICT r11 item 2: measure the eager-persist marks under a
SATURATED-core profile — the deployment the marks exist for — instead
of the idle local box where the r11 A/B showed lazy winning because
redundant sibling lineage passes overlap on idle cores.

Method: pin Spark to a few cores (SPARK_GRAFT_CPUS, default 4) and
burn the REST of the machine with busy loops so racing recomputes
cannot hide on idle capacity; then run tools/ab_eager.py once per
mode (fresh JVM each — the master is fixed per session), alternating
mode order across --reps repetitions so drift hits both arms equally.

Usage:
  python tools/ab_eager_saturated.py --cpus 4 --reps 2 name [name ...]
"""

from __future__ import annotations

import argparse
import json
import multiprocessing
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def _burn() -> None:
    x = 1.0
    while True:
        x = x * 1.0000001 + 1e-9
        if x > 1e12:
            x = 1.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=4)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    n_burn = max(0, multiprocessing.cpu_count() - args.cpus)
    burners = [
        multiprocessing.Process(target=_burn, daemon=True)
        for _ in range(n_burn)
    ]
    for b in burners:
        b.start()
    results: dict[str, list[dict]] = {"eager": [], "lazy": []}
    try:
        order = ["lazy", "eager"]
        for rep in range(args.reps):
            for mode in order if rep % 2 == 0 else order[::-1]:
                env = dict(os.environ)
                env["SPARK_GRAFT_CPUS"] = str(args.cpus)
                if mode == "eager":
                    env["SPARK_GRAFT_EAGER_PERSIST"] = "1"
                else:
                    env.pop("SPARK_GRAFT_EAGER_PERSIST", None)
                p = subprocess.run(
                    [sys.executable, os.path.join(HERE, "ab_eager.py"),
                     *args.names],
                    env=env, capture_output=True, text=True,
                )
                line = p.stdout.strip().splitlines()[-1] if p.stdout else "{}"
                results[mode].append(json.loads(line))
    finally:
        for b in burners:
            b.terminate()
    summary = {}
    for name in args.names:
        summary[name] = {
            mode: {
                "warm_each_rep": [r[name]["warm"] for r in results[mode]],
                "warm_min": min(r[name]["warm"] for r in results[mode]),
                "passes": [r[name]["passes"] for r in results[mode]],
            }
            for mode in ("lazy", "eager")
        }
    print(json.dumps({"cpus": args.cpus, "burners": n_burn, **summary},
                     indent=1))


if __name__ == "__main__":
    main()
