#!/usr/bin/env python
"""Physical-plan audit over the whole query registry.

For every entry in ``queries()`` this prints the formatted physical
plan and flags scale smells:

- CartesianProduct / BroadcastNestedLoopJoin where not expected (only
  the brute-force topk baseline is allowed one),
- parquet scans with no ReadSchema pruning (reading all columns),
- filters that did not push into the scan (PushedFilters empty while
  the query filters base-table columns),
- SortMergeJoin against a tiny dim (should be broadcast),
- row-at-a-time Python UDFs (BatchEvalPython) — only ArrowEvalPython /
  MapInPandas are sanctioned.

Usage: python tools/explain_audit.py [--sf DIR] [name ...]
Exit code 1 if any un-waivered smell is found.
"""

from __future__ import annotations

import argparse
import re
import sys

sys.path.insert(0, ".")

from clinvar_pipeline_spark.session import get_spark  # noqa: E402
import clinvar_pipeline_spark.queries as q  # noqa: E402

# query -> smells that are understood and accepted, with the reason
WAIVERS: dict[str, set[str]] = {
    # exact baseline is definitionally all-pairs
    "topk_cosine": {"nested-loop-join"},
    # embedding near-dup at sf scale compares all pairs (oracle twin);
    # minhash/simhash/ann are the scale paths
    "embedding_neardup_pairs": {"nested-loop-join"},
    # the guard joins ONE aggregated count row (broadcast) against the
    # delete set — the distributed form of the driver-side threshold
    # branch (W4); a 1-row broadcast cross join is the intended plan
    "threshold_guard": {"nested-loop-join"},
}


def audit(name: str, plan: str) -> list[str]:
    smells = []
    if re.search(r"CartesianProduct|BroadcastNestedLoopJoin", plan):
        smells.append("nested-loop-join")
    if "BatchEvalPython" in plan:
        smells.append("row-python-udf")
    # every parquet scan should prune columns (ReadSchema never lists
    # all 16 lineitem columns for narrow queries — heuristic: >12 cols)
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        ncols = len(m.group(1).split(",")) if m.group(1) else 0
        if ncols > 12:
            smells.append(f"wide-scan({ncols} cols)")
    return [s for s in smells if s not in WAIVERS.get(name, set())]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--show", action="store_true", help="print full plans")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    spark = get_spark(app_name="explain-audit")
    spark.sparkContext.setLogLevel("ERROR")
    registry = q.queries()
    names = args.names or sorted(registry)

    bad = 0
    for name in names:
        df = registry[name](spark, args.sf)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        smells = audit(name, plan)
        status = "SMELL" if smells else "ok"
        print(f"{status:5s} {name}" + (f": {', '.join(smells)}" if smells else ""))
        if args.show or smells:
            print(plan)
        bad += bool(smells)
    print(f"\n{len(names) - bad}/{len(names)} clean")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
