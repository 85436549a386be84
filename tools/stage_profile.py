#!/usr/bin/env python
"""Per-query stage-time attribution (optimization rounds' measuring
stick, guide §1): run named registry queries against a noop sink on a
UI-enabled session and report, for each query, the new stages it ran
sorted by executorRunTime — with shuffle read/write bytes, input bytes,
and task counts — so optimization targets are chosen from data, not
guesses.

Usage:
  python tools/stage_profile.py --sf /root/testdata/sf0.1 name [name ...]
  python tools/stage_profile.py --warm 1 ...   # run once un-timed first
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _api(spark) -> str:
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    return f"{base}/api/v1/applications/{app_id}"


def stages(spark) -> dict[int, dict]:
    url = f"{_api(spark)}/stages?status=complete&status=failed"
    with urllib.request.urlopen(url) as r:
        return {(s["stageId"], s["attemptId"]): s for s in json.load(r)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--warm", type=int, default=1)
    ap.add_argument("--top", type=int, default=12)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from clinvar_pipeline_spark import queries as q
    from clinvar_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name="stage-profile",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "200000",
            "spark.ui.retainedJobs": "200000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = q.queries()
    try:
        import bench

        registry.update(bench._extra_queries())
    except Exception:
        pass

    for name in args.names:
        for _ in range(args.warm):
            registry[name](spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
            q.release_cached()
        before = stages(spark)
        t0 = time.time()
        registry[name](spark, args.sf).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = time.time() - t0
        q.release_cached()
        after = stages(spark)
        new = [s for k, s in after.items() if k not in before]
        new.sort(key=lambda s: -s.get("executorRunTime", 0))
        tot_run = sum(s.get("executorRunTime", 0) for s in new)
        print(f"\n=== {name}: wall {wall:.2f}s, {len(new)} stages, "
              f"executorRunTime total {tot_run/1000:.2f}s ===")
        for s in new[: args.top]:
            nm = s.get("name", "?")
            print(
                f"  run {s.get('executorRunTime', 0)/1000:7.2f}s"
                f" cpu {s.get('executorCpuTime', 0)/1e9:7.2f}s"
                f" tasks {s.get('numCompleteTasks', 0):4d}"
                f" in {s.get('inputBytes', 0)/1e6:8.1f}MB"
                f" sw {s.get('shuffleWriteBytes', 0)/1e6:7.1f}MB"
                f" sr {s.get('shuffleReadBytes', 0)/1e6:7.1f}MB"
                f"  {nm[:90]}"
            )


if __name__ == "__main__":
    main()
