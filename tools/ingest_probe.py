#!/usr/bin/env python
"""Ingest front-door bench: WARC walk, CSV quarantine, JSONL ingest.

The query tiers (bench.py) never touch the ingest sources, so the only
corpus-sized pure-Python loop in the engine — sources/warc.py's
per-archive record walk — had zero wall-time signal (r8 verdict,
missing #3). This probe synthesizes a corpus of configurable volume
from the documents table (replicated to ``--mb`` megabytes of text,
default 256), lands it in all three wire formats, and times each read
path to full materialization, reporting MB/s per path.

Corrupt-input fidelity: each format gets a slab of malformed input
(truncated gzip tail for WARC, ragged rows for CSV, junk lines for
JSONL) so the timed path includes the quarantine/counter machinery,
not just the happy path.

Usage:
  python tools/ingest_probe.py [--mb 256] [--archives 32]
      [--workdir /tmp/ingest_probe] [--keep]
Writes INGEST_PROBE.json at the repo root and prints one JSON line:
  {"metric": "ingest_probe", "paths": {"warc": {"mb": ..., "cold_s":
   ..., "warm_s": ..., "mb_per_s_warm": ...}, "csv": {...},
   "jsonl": {...}}, "gen_mb": ...}
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)


def _dir_mb(path: str) -> float:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total / 1e6


def _gen(spark, sf_dir: str, workdir: str, target_mb: int, archives: int):
    """Land the replicated documents corpus as JSONL, CSV, and WARC."""
    from pyspark.sql import functions as F

    from clinvar_pipeline_spark.sources.jsonl import write_documents_jsonl

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "lang", "text"
    )
    base_mb = (
        docs.select(F.sum(F.length("text"))).collect()[0][0] or 1
    ) / 1e6
    rep = max(1, int(target_mb / base_mb))
    n_docs = docs.count()
    big = (
        docs.crossJoin(
            spark.range(rep).select(F.col("id").alias("_r"))
        )
        .select(
            (F.col("doc_id") + F.col("_r") * F.lit(n_docs * 2)).alias(
                "doc_id"
            ),
            "source", "lang", "text",
        )
        .repartition(archives)
    )

    # JSONL + a corrupt slab
    jl = f"{workdir}/jsonl"
    write_documents_jsonl(big, jl)
    with open(f"{jl}/part-corrupt.jsonl", "w") as f:
        for i in range(1000):
            f.write('{"doc_id": ' + "x" * 20 + f"{i}}}\n")

    # CSV + ragged rows (quote-safe: to_csv handles embedded seps)
    cs = f"{workdir}/csv"
    big.write.mode("overwrite").option("header", "true").csv(cs)
    with open(f"{cs}/part-corrupt.csv", "w") as f:
        f.write("doc_id,source,lang,text\n")
        for i in range(1000):
            f.write(f"{i},only_two_fields\n")

    # WARC: each partition writes ONE archive (local-mode probe: tasks
    # share the filesystem), response records wrapping the doc text,
    # one archive per partition + a truncated-tail member at the end
    wc = f"{workdir}/warc"
    os.makedirs(wc, exist_ok=True)

    def write_archive(it):
        import gzip as _gz

        from clinvar_pipeline_spark.sources.warc import warc_encode

        from pyspark import TaskContext

        rows = list(it)
        if not rows:
            return iter(())
        # partition id, not a doc_id hash: hashes can collide across
        # partitions and one task's archive would silently overwrite
        # another's, skewing the probe's MB/s and counters (ADVICE r9)
        pid = TaskContext.get().partitionId()
        recs = [
            {
                "type": "response",
                "url": f"https://example.org/{r['doc_id']}",
                "date": "2026-01-01T00:00:00Z",
                "record_id": f"<urn:doc:{r['doc_id']}>",
                "http": (200, "text/plain", r["text"].encode()),
            }
            for r in rows
        ]
        payload = warc_encode(recs)
        # corrupt tail: half a gzip member (counted ARCHIVES_BAD_TAIL)
        payload += _gz.compress(b"WARC/1.0\r\nWARC-Type: resp")[:10]
        with open(f"{wc}/part-{pid}.warc.gz", "wb") as f:
            f.write(payload)
        return iter(())

    big.rdd.mapPartitions(write_archive).count()
    return {"jsonl": jl, "csv": cs, "warc": wc}


def _time_path(fn, passes: int = 2) -> tuple[float, float]:
    from clinvar_pipeline_spark.caching import release_cached

    times = []
    for _ in range(passes):
        t0 = time.time()
        fn()
        times.append(round(time.time() - t0, 3))
        release_cached()
    return times[0], min(times[1:]) if len(times) > 1 else times[0]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=256,
                    help="target text volume to synthesize (MB)")
    ap.add_argument("--archives", type=int, default=32)
    ap.add_argument("--workdir", default="/tmp/ingest_probe")
    ap.add_argument("--keep", action="store_true",
                    help="keep the generated corpus on disk")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from clinvar_pipeline_spark.session import get_spark
    from clinvar_pipeline_spark.sources.csvq import read_csv_quarantined
    from clinvar_pipeline_spark.sources.jsonl import read_documents_jsonl
    from clinvar_pipeline_spark.sources.warc import read_warc

    spark = get_spark(app_name="ingest-probe")
    spark.sparkContext.setLogLevel("ERROR")

    if os.path.exists(args.workdir):
        shutil.rmtree(args.workdir)
    os.makedirs(args.workdir)
    t0 = time.time()
    dirs = _gen(spark, args.sf, args.workdir, args.mb, args.archives)
    gen_s = round(time.time() - t0, 1)

    def run_jsonl():
        good, counters = read_documents_jsonl(spark, dirs["jsonl"])
        good.write.format("noop").mode("overwrite").save()
        return dict(counters.collect())

    def run_csv():
        good, quar, counters = read_csv_quarantined(
            spark, dirs["csv"],
            "doc_id bigint, source string, lang string, text string",
        )
        good.write.format("noop").mode("overwrite").save()
        quar.write.format("noop").mode("overwrite").save()
        return dict(counters.collect())

    def run_warc():
        records, counters = read_warc(spark, dirs["warc"])
        records.write.format("noop").mode("overwrite").save()
        return dict(counters.collect())

    out: dict = {"metric": "ingest_probe", "sf_source": args.sf,
                 "gen_s": gen_s, "paths": {}}
    for name, fn in (("jsonl", run_jsonl), ("csv", run_csv),
                     ("warc", run_warc)):
        mb = round(_dir_mb(dirs[name]), 1)
        cold, warm = _time_path(fn)
        out["paths"][name] = {
            "mb_on_disk": mb,
            "cold_s": cold,
            "warm_s": warm,
            "mb_per_s_warm": round(mb / warm, 1) if warm else None,
            "counters": {k: int(v) for k, v in fn().items()},
        }
    out["gen_mb"] = round(sum(
        p["mb_on_disk"] for p in out["paths"].values()), 1)

    with open(os.path.join(REPO, "INGEST_PROBE.json"), "w") as f:
        json.dump(out, f, indent=1)
    if not args.keep:
        shutil.rmtree(args.workdir)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
