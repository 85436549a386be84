#!/usr/bin/env python
"""Interleaved A/B of pagerank's localCheckpoint cadence (guide §5:
localCheckpoint is a plan-truncation barrier; r10 measured each
barrier ~8% — re-measure on the r11 long-key shape at 6 iterations).

checkpoint_every=3 (committed), 6 (one cut), 0 (no cuts — safe for
<=10 iterations per the docstring). Values are bit-identical in exact
mode by construction (integer sums are order-independent), so this is
purely a wall-time question.

Usage: python tools/ab_pagerank_ckpt.py [--rounds 4]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=4)
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from clinvar_pipeline_spark import queries as q
    from clinvar_pipeline_spark import queries_warehouse as qw
    from clinvar_pipeline_spark.session import get_spark

    spark = get_spark(app_name="ab-pagerank-ckpt")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/orders.parquet").limit(100).write.format(
        "noop").mode("overwrite").save()
    # prime the node-count memo so every arm starts warm
    qw.pagerank(spark, sf_dir, exact=True).write.format("noop").mode(
        "overwrite").save()
    q.release_cached()

    arms = [3, 6, 0]
    out: dict[str, dict[str, list[float]]] = {
        "exact": {str(a): [] for a in arms},
        "fast": {str(a): [] for a in arms},
    }
    for rnd in range(args.rounds):
        seq = arms if rnd % 2 == 0 else arms[::-1]
        for ck in seq:
            for mode, exact in (("exact", True), ("fast", False)):
                t0 = time.time()
                qw.pagerank(
                    spark, sf_dir, exact=exact, checkpoint_every=ck
                ).write.format("noop").mode("overwrite").save()
                out[mode][str(ck)].append(round(time.time() - t0, 3))
                q.release_cached()
    print(json.dumps({
        m: {
            ck: {"median": round(statistics.median(ts), 3), "min": min(ts),
                 "passes": ts}
            for ck, ts in d.items()
        }
        for m, d in out.items()
    }, indent=1))


if __name__ == "__main__":
    main()
