#!/usr/bin/env python
"""Wall-time regression gate — the bench analogue of plan_baseline.

plan_baseline catches plan-SHAPE regressions at commit time; a
constant-factor kernel regression (same plan, slower kernel — the r6
text_profile case, r8's 21 s table_profile debut) only shows up in the
numbers. This tool diffs a fresh BENCH_DETAIL.json's warm per-query
times against the last COMMITTED one (``git show`` of the baseline
ref, default HEAD) and fails on any query whose warm time regressed
more than ``--tolerance`` (default 25%) beyond a noise floor.

Protocol notes baked into the comparison:
- warm times only (cold pays one-shot codegen JIT — noisy by design);
- a 0.75 s absolute floor: sub-second queries live inside this
  sandbox's documented 2-15x CPU-steal spike envelope, so a ratio on
  them is noise, not signal (bench.py already min-of-3s them);
- both sides must be the same SF — comparing sf0.01 against the
  committed sf0.1 detail is refused, not fudged (the r9 lesson: a
  smoke run at the wrong SF silently clobbers the anchor);
- WAIVERS carries {query: reason} for understood one-round shifts
  (an intentional algorithm change lands with its waiver and the
  waiver is deleted next round once the new number is the baseline).

Usage:
  python tools/bench_check.py                # fresh vs HEAD
  python tools/bench_check.py --ref r8tag    # fresh vs another commit
  python tools/bench_check.py --tolerance 0.4
Exit 0 = no unwaivered regression; 1 = regressions (listed); 2 = no
comparable baseline (first round at an SF, missing file).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

# query -> reason for an accepted one-round warm-time shift; delete
# the entry the round after, when the new number is the baseline
WAIVERS: dict[str, str] = {
    # r11's four waivers were deleted in r12 as promised (rotation
    # discipline): pagerank_fast / pmi_collocations /
    # shingle_containment were ambient-tier waivers superseded by the
    # fresh end-of-r12 baseline; fuzzy_entity_clusters's deliberate
    # long-key trade was REVERTED in r12 (the compressed-shuffle-bytes
    # measurement falsified its scale rationale — see
    # OPTIMIZATION_r12.md). When adding a waiver, cite a same-session
    # interleaved measurement and record the evidence file path so the
    # claim is auditable.
}

ABS_FLOOR_SEC = 0.75


def _committed_detail(ref: str) -> dict | None:
    try:
        out = subprocess.run(
            ["git", "show", f"{ref}:BENCH_DETAIL.json"],
            capture_output=True, text=True, cwd=REPO, check=True,
        ).stdout
        return json.loads(out)
    except (subprocess.CalledProcessError, json.JSONDecodeError):
        return None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="HEAD",
                    help="git ref whose committed BENCH_DETAIL.json is the baseline")
    ap.add_argument("--tolerance", type=float, default=0.25,
                    help="max allowed fractional warm-time regression per query")
    ap.add_argument("--fresh", default=os.path.join(REPO, "BENCH_DETAIL.json"),
                    help="path of the freshly produced detail file")
    args = ap.parse_args()

    base = _committed_detail(args.ref)
    if base is None:
        print(f"no committed BENCH_DETAIL.json at {args.ref}; nothing to compare")
        return 2
    try:
        with open(args.fresh) as f:
            fresh = json.load(f)
    except (OSError, json.JSONDecodeError) as e:
        print(f"cannot read fresh detail {args.fresh}: {e}")
        return 2
    if fresh.get("sf") != base.get("sf"):
        print(
            f"SF mismatch: fresh sf={fresh.get('sf')} vs baseline "
            f"sf={base.get('sf')} — run bench at the baseline SF first"
        )
        return 2

    base_warm = {**base.get("warm_queries", {}), **base.get("v2_warm_queries", {})}
    fresh_warm = {**fresh.get("warm_queries", {}), **fresh.get("v2_warm_queries", {})}

    regressions, improved, waived = [], 0, []
    for name, old in sorted(base_warm.items()):
        new = fresh_warm.get(name)
        if new is None:
            continue  # dropped from the tier — the bench diff shows it
        if new <= old:
            improved += 1
            continue
        if max(old, new) < ABS_FLOOR_SEC:
            continue  # inside the sandbox noise envelope
        ratio = (new - old) / old
        if ratio <= args.tolerance:
            continue
        if name in WAIVERS:
            waived.append((name, old, new, WAIVERS[name]))
            continue
        regressions.append((name, old, new, ratio))

    for name, old, new, reason in waived:
        print(f"waived {name}: {old:.2f}s -> {new:.2f}s ({reason})")
    for name, old, new, ratio in regressions:
        print(f"REGRESSED {name}: {old:.2f}s -> {new:.2f}s (+{ratio:.0%})")
    n = len(base_warm)
    print(
        f"{n - len(regressions) - len(waived)}/{n} within tolerance "
        f"({improved} improved, {len(waived)} waived, "
        f"{len(regressions)} regressed) vs {args.ref} at sf{base.get('sf')}"
    )
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
