#!/usr/bin/env python
"""Dump ``.explain("formatted")`` for named registry queries to files.

Used by the optimization rounds to commit before/after physical plans
(plans/r<N>/<query>_{before,after}.txt) so plan-shape claims in
OPTIMIZATION_r<N>.md are checkable without running Spark.

Usage:
  python tools/plan_dump.py --out plans/r11 --suffix before [name ...]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", required=True)
    ap.add_argument("--suffix", required=True)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from clinvar_pipeline_spark import queries as q
    from clinvar_pipeline_spark.session import get_spark

    spark = get_spark(app_name="plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    registry = q.queries()
    try:  # bench-only callables (pagerank_fast) ride along when present
        import bench

        registry.update(bench._extra_queries())
    except Exception:
        pass
    names = args.names or sorted(registry)
    os.makedirs(args.out, exist_ok=True)
    for name in names:
        df = registry[name](spark, args.sf)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(args.out, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        q.release_cached()
        print(path)


if __name__ == "__main__":
    main()
