#!/usr/bin/env python
"""Generic per-query A/B timing harness (r11): noop-sink passes for
named registry queries at the current $SPARK_GRAFT_CPUS core count.
Run back-to-back around a code change on the same tier — this
session's tier shows 2-3x ambient swings, so only paired runs are
comparable. Reports cold + min-of-warm per query.

Usage: python tools/ab_run.py [--passes 4] name [name ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=4)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()
    if args.passes < 2:
        ap.error("--passes must be >= 2 (need at least one warm pass)")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from clinvar_pipeline_spark import queries as q
    from clinvar_pipeline_spark.session import get_spark

    spark = get_spark(app_name="ab-run")
    spark.sparkContext.setLogLevel("ERROR")
    registry = q.queries()
    try:
        import bench

        registry.update(bench._extra_queries())
    except Exception:
        pass
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1000).write.format(
        "noop"
    ).mode("overwrite").save()
    out = {}
    for name in args.names:
        fn = registry[name]
        ts = []
        for _ in range(args.passes):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts.append(round(time.time() - t0, 3))
            q.release_cached()
        out[name] = {"cold": ts[0], "warm": min(ts[1:]), "passes": ts}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
