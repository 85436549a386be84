#!/usr/bin/env python
"""VERDICT r11 item 4 harness: measure candidate session-config
changes against the per-query fixed floor and the mid-size joins.

One process per (config, rep): a fresh JVM runs the named queries
noop-sunk (cold + N warm passes), plus a `floor_probe` pseudo-query
(tiny two-stage groupBy — pure plan/AQE/scheduling latency, no data
work) so the fixed floor is measured directly. Configs alternate
across reps so tier drift hits every arm.

Usage:
  python tools/conf_matrix.py --reps 2 --warm 2 name [name ...]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

CONFIGS: dict[str, dict[str, str]] = {
    "base": {},
    "shj": {"spark.sql.join.preferSortMergeJoin": "false"},
    "shj_aqe": {
        "spark.sql.join.preferSortMergeJoin": "false",
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "64m",
    },
    "zstd_shuffle": {"spark.io.compression.codec": "zstd"},
    "lz4_plus_shj": {
        "spark.sql.join.preferSortMergeJoin": "false",
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "64m",
        "spark.sql.files.maxPartitionBytes": "256m",
    },
    "kryo": {
        "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    },
    "sp64": {"spark.sql.shuffle.partitions": "64"},
}


def run_child(conf_json: str, warm: int, names: list[str]) -> None:
    """Child-process body: build the session with the overrides, time
    each query cold + warm."""
    sys.path.insert(0, os.path.dirname(HERE))
    import time

    from clinvar_pipeline_spark import queries as q
    from clinvar_pipeline_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="conf-matrix", extra_conf=json.loads(conf_json))
    spark.sparkContext.setLogLevel("ERROR")
    registry = q.queries()
    try:
        import bench

        registry.update(bench._extra_queries())
    except Exception:
        pass

    def floor_probe(spark, _sf):
        from pyspark.sql import functions as F

        return (
            spark.range(10000, numPartitions=8)
            .groupBy((F.col("id") % 97).alias("k"))
            .count()
            .groupBy((F.col("k") % 7).alias("g"))
            .sum("count")
        )

    registry["floor_probe"] = floor_probe
    if "floor_probe" not in names:
        names = list(names) + ["floor_probe"]
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1000).write.format(
        "noop").mode("overwrite").save()
    out = {}
    for name in names:
        fn = registry[name]
        ts = []
        for _ in range(warm + 1):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts.append(round(time.time() - t0, 3))
            q.release_cached()
        out[name] = {"cold": ts[0], "warm": min(ts[1:]), "passes": ts}
    print("RESULT " + json.dumps(out))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--warm", type=int, default=2)
    ap.add_argument("--configs", default=",".join(CONFIGS))
    ap.add_argument("--child-conf", default=None, help=argparse.SUPPRESS)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()
    if args.child_conf is not None:
        run_child(args.child_conf, args.warm, args.names)
        return

    confs = {k: CONFIGS[k] for k in args.configs.split(",")}
    runs: dict[str, list[dict]] = {k: [] for k in confs}
    order = list(confs)
    for rep in range(args.reps):
        seq = order if rep % 2 == 0 else order[::-1]
        for cname in seq:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--child-conf", json.dumps(confs[cname]),
                 "--warm", str(args.warm), *args.names],
                capture_output=True, text=True,
            )
            line = [l for l in p.stdout.splitlines() if l.startswith("RESULT ")]
            if not line:
                print(f"child {cname} failed:\n{p.stdout[-2000:]}\n{p.stderr[-2000:]}",
                      file=sys.stderr)
                sys.exit(1)
            runs[cname].append(json.loads(line[-1][len("RESULT "):]))
    summary: dict[str, dict] = {}
    for name in args.names + ["floor_probe"] if "floor_probe" not in args.names else args.names:
        summary[name] = {
            cname: {
                "warm_min": min(r[name]["warm"] for r in rs),
                "warm_each_rep": [r[name]["warm"] for r in rs],
                "cold_min": min(r[name]["cold"] for r in rs),
            }
            for cname, rs in runs.items()
        }
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
