#!/usr/bin/env python
"""Shuffle-volume regression gate: per-query shuffle read/write BYTES
diffed against the committed SHUFFLE_BASELINE.json.

The plan gate (tools/plan_baseline.py) counts operator classes and
bench_check counts seconds; neither counts bytes exchanged. A broadcast
decaying into a shuffle join, a pre-aggregation dropping out, or a
pruned scan widening can multiply exchange volume while staying inside
wall-clock noise at sf0.1 — invisible locally, a cliff at 100 TB (the
reference's own perf cliff was exactly an I/O-volume regression,
SURVEY §3.1). This gate pins the bytes.

Protocol: each registry query runs once (noop write) on a session with
the UI status store enabled; the query's shuffle volume is the delta of
summed per-stage shuffleWrite/shuffleRead bytes from the REST status
API between the snapshots before and after the run. Bytes are
deterministic for a fixed plan + data (lz4 block compression is
deterministic), unlike seconds — so the check threshold can be tight:

    fail iff bytes_now > bytes_base * RATIO + FLOOR

RATIO absorbs AQE coalescing jitter on partition boundaries; FLOOR
(16 MiB) keeps tiny-query jitter (a few KiB of map-status overhead)
from tripping the ratio on near-zero baselines. Shrinking volume never
fails (that is an improvement) — run --update to re-pin after a
deliberate optimization, and review the diff.

Memoized corpus state (trained models, quantizers) means a query's
bytes depend on whether an earlier query already trained the shared
model — so baseline and check must both run the FULL registry in
registry order (the default). Name-scoped runs are for local iteration
on memo-free queries.

Usage:
  python tools/shuffle_baseline.py             # check vs baseline
  python tools/shuffle_baseline.py --update    # rewrite the baseline
  python tools/shuffle_baseline.py [name ...]  # restrict (iteration)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASELINE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "SHUFFLE_BASELINE.json",
)
RATIO = 1.3
FLOOR = 16 * 1024 * 1024  # bytes


def _api(spark) -> str:
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    return f"{base}/api/v1/applications/{app_id}"


def stage_totals(spark) -> dict[str, int]:
    """Cumulative shuffle bytes over every stage attempt so far.

    Requires spark.ui.retainedStages to exceed the run's stage count —
    eviction would silently shrink the cumulative sums and corrupt the
    per-query deltas, so measure() asserts stages are never dropped.
    """
    url = f"{_api(spark)}/stages?status=complete&status=failed"
    with urllib.request.urlopen(url) as r:
        stages = json.load(r)
    return {
        "shuffle_write": sum(s.get("shuffleWriteBytes", 0) for s in stages),
        "shuffle_read": sum(s.get("shuffleReadBytes", 0) for s in stages),
        "n_stages": len(stages),
    }


def measure(spark, registry, names, sf_dir: str, release) -> dict[str, dict]:
    out: dict[str, dict] = {}
    before = stage_totals(spark)
    for name in names:
        registry[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        release()
        after = stage_totals(spark)
        assert after["n_stages"] >= before["n_stages"], (
            "status store evicted stages mid-run; raise spark.ui.retainedStages"
        )
        out[name] = {
            "shuffle_write": after["shuffle_write"] - before["shuffle_write"],
            "shuffle_read": after["shuffle_read"] - before["shuffle_read"],
        }
        before = after
    return out


def compare(
    base: dict[str, dict],
    got: dict[str, dict],
    ratio: float = RATIO,
    floor: int = FLOOR,
) -> list[str]:
    """Names whose measured shuffle volume regressed past the
    threshold. Pure so the gate's tripwire is unit-testable."""
    bad = []
    for name, m in got.items():
        if name not in base:
            continue
        for k in ("shuffle_write", "shuffle_read"):
            if m[k] > base[name][k] * ratio + floor:
                bad.append(name)
                break
    return bad


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--update", action="store_true")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from clinvar_pipeline_spark import queries as q
    from clinvar_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name="shuffle-baseline",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "200000",
            "spark.ui.retainedJobs": "200000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = q.queries()
    names = args.names or list(registry)
    got = measure(spark, registry, names, args.sf, q.release_cached)

    if args.update:
        old = {}
        if os.path.exists(BASELINE) and args.names:
            with open(BASELINE) as f:
                old = json.load(f)
        old.update(got)
        with open(BASELINE, "w") as f:
            json.dump(old, f, indent=1, sort_keys=True)
        print(f"baseline updated: {len(old)} queries -> {BASELINE}")
        return

    if not os.path.exists(BASELINE):
        print("no SHUFFLE_BASELINE.json — run with --update first")
        sys.exit(1)
    with open(BASELINE) as f:
        base = json.load(f)

    bad = compare(base, got)
    missing = [n for n in got if n not in base]
    for n in sorted(got):
        mark = "REGR " if n in bad else ("NEW  " if n in missing else "ok   ")
        b = base.get(n, {})
        print(
            f"{mark}{n}: write {got[n]['shuffle_write']:>12,}"
            f" (base {b.get('shuffle_write', 0):,})"
            f"  read {got[n]['shuffle_read']:>12,}"
            f" (base {b.get('shuffle_read', 0):,})"
        )
    print(f"\n{len(got) - len(bad) - len(missing)}/{len(got)} within threshold")
    if bad or missing:
        sys.exit(1)


if __name__ == "__main__":
    main()
