"""Crash-for-real exactly-once tests (r10 verdict ask #4).

test_compaction proves exactly-once under SIMULATED interruption
windows; these tests SIGKILL an actual driver process inside the two
real windows and restart on the same checkpoint:

- cm_stream land window: the process dies after cm_delta_batch lands
  epoch N's delta but before foreachBatch returns, so the streaming
  checkpoint never commits batch N. The restart must replay batch N
  under the SAME epoch id (the offset log is written at batch start),
  overwrite the delta idempotently, and drain — snapshot == batch.

- compact manifest window: the process dies after the new base
  generation's data is written but before the consumed manifest
  commits (the seam between the two writes — compact()'s only
  createDataFrame call sits exactly there). The orphaned base dir
  must stay invisible to readers, the restart must sweep it, redo the
  fold, and the final snapshot must still equal the batch sketch.

SIGKILL (not .stop(), not an exception) is the point: no atexit, no
py4j shutdown, no checkpoint finalization — the same failure a
preempted executor host or an OOM-killed driver produces.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, signal, sys

sys.path.insert(0, %(repo)r)
mode, drop, deltas, out, ckpt = sys.argv[1:6]

from clinvar_pipeline_spark.session import get_spark
import clinvar_pipeline_spark.streaming.corpus as corpus
from clinvar_pipeline_spark.streaming.corpus import DOCUMENT_SCHEMA

spark = get_spark(app_name="kill9-child", master="local[4]",
                  shuffle_partitions="4")
spark.sparkContext.setLogLevel("ERROR")

if mode == "seed":
    rows = [
        (1, "spark join hash row batch scan", "en", "s", 31),
        (2, "row row row value table part", "en", "s", 29),
        (3, "spark spark merge window group", "en", "s", 30),
        (4, "table scan filter key sort agg", "en", "s", 30),
    ]
    for r in rows:  # one file per row = one micro-batch per row
        spark.createDataFrame([r], DOCUMENT_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(drop)
    sys.exit(0)

if mode == "check":
    from clinvar_pipeline_spark.queries_curation import cm_sketch_frame
    from clinvar_pipeline_spark.streaming.corpus import cm_snapshot

    def cells(df):
        return {f"{r['j']}:{r['b']}": r["c"] for r in df.collect()}

    snap = cells(cm_snapshot(spark, deltas))
    sink = cells(spark.read.parquet(out))
    batch = cells(cm_sketch_frame(spark.read.parquet(drop)))
    print(json.dumps({
        "snap_eq": snap == batch,
        "sink_eq": sink == batch,
        "n_cells": len(batch),
    }))
    sys.exit(0)

compact_every = None
if mode in ("kill_in_compact", "drain_compact"):
    compact_every = 2

if mode == "kill_after_land":
    real_land = corpus.cm_delta_batch

    def bomb_land(batch_df, epoch_id, deltas_path):
        real_land(batch_df, epoch_id, deltas_path)
        if int(epoch_id) == 1:
            os.kill(os.getpid(), signal.SIGKILL)

    corpus.cm_delta_batch = bomb_land

if mode == "kill_in_compact":
    from pyspark.sql import SparkSession

    armed = {"on": False}
    real_compact = corpus.cm_compact

    def arm_then_compact(spark_, deltas_path, keep_last=1):
        armed["on"] = True
        return real_compact(spark_, deltas_path, keep_last)

    corpus.cm_compact = arm_then_compact
    real_cdf = SparkSession.createDataFrame

    def bomb_cdf(self, *a, **k):
        if armed["on"]:
            os.kill(os.getpid(), signal.SIGKILL)
        return real_cdf(self, *a, **k)

    SparkSession.createDataFrame = bomb_cdf

docs = spark.readStream.schema(DOCUMENT_SCHEMA).option(
    "maxFilesPerTrigger", 1
).parquet(drop)
q = corpus.cm_stream(docs, deltas, out, ckpt, compact_every=compact_every)
q.awaitTermination(180)
sys.exit(0)
"""


def _run_child(tmp_path, mode: str, dirs) -> subprocess.CompletedProcess:
    child = tmp_path / "child.py"
    child.write_text(CHILD % {"repo": REPO})
    return subprocess.run(
        [sys.executable, str(child), mode, *dirs],
        capture_output=True,
        text=True,
        timeout=420,
    )


def _dirs(tmp_path):
    return [
        str(tmp_path / "drop"),
        str(tmp_path / "_cm_deltas"),
        str(tmp_path / "cm_sketch"),
        str(tmp_path / "ckpt"),
    ]


def _seed_and_kill(tmp_path, kill_mode, drain_mode):
    dirs = _dirs(tmp_path)
    seed = _run_child(tmp_path, "seed", dirs)
    assert seed.returncode == 0, seed.stderr[-2000:]

    killed = _run_child(tmp_path, kill_mode, dirs)
    assert killed.returncode == -signal.SIGKILL, (
        killed.returncode,
        killed.stderr[-2000:],
    )
    # the kill landed inside the window: state exists, stream not done
    assert os.path.isdir(dirs[1])

    restart = _run_child(tmp_path, drain_mode, dirs)
    assert restart.returncode == 0, restart.stderr[-2000:]

    check = _run_child(tmp_path, "check", dirs)
    assert check.returncode == 0, check.stderr[-2000:]
    out = json.loads(check.stdout.strip().splitlines()[-1])
    assert out["n_cells"] > 0
    assert out["snap_eq"] and out["sink_eq"], out
    return dirs


def test_sigkill_between_land_and_commit(tmp_path):
    """Die after epoch 1's delta lands, before its checkpoint commit;
    restart drains on the same checkpoint; snapshot == batch."""
    dirs = _seed_and_kill(tmp_path, "kill_after_land", "drain")
    # the replay really happened: epoch dirs are exactly one per file
    epochs = sorted(
        n for n in os.listdir(dirs[1]) if n.startswith("epoch=")
    )
    assert epochs == ["epoch=0", "epoch=1", "epoch=2", "epoch=3"]


def test_sigkill_mid_compact_manifest_window(tmp_path):
    """Die between the new base generation's data write and its
    consumed-manifest commit; the orphan base stays invisible, the
    restart sweeps it and redoes the fold; snapshot == batch."""
    dirs = _seed_and_kill(tmp_path, "kill_in_compact", "drain_compact")
    # compaction really ran on the restart: a committed base exists
    # with its consumed marker, and folded epoch dirs are gone
    names = os.listdir(dirs[1])
    bases = [n for n in names if n.startswith("_base-")]
    assert bases, names
    newest = max(bases, key=lambda n: int(n.split("-")[1]))
    assert os.path.exists(
        os.path.join(dirs[1], newest, "consumed", "_SUCCESS")
    )
    live = [n for n in names if n.startswith("epoch=")]
    assert len(live) < 4  # some epochs folded away
