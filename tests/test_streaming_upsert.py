"""Streaming upsert classification (streaming/upsert.py): two file
drops processed as two availableNow runs over one checkpoint, so the
second run classifies against state persisted by the first — and the
second run's change types must equal batch diff_sync of drop2 against
drop1 (the batch/stream equivalence that makes the operator a twin,
not a new semantics)."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

import time

from clinvar_pipeline_spark.operators.diff_sync import CHANGE_COL, diff_sync
from clinvar_pipeline_spark.streaming.upsert import STALE, diff_sync_stream

SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType()),
        T.StructField("clinsig", T.StringType()),
        T.StructField("notes", T.StringType()),
    ]
)


def _run(spark, in_dir, ckpt_dir, name, stale_after_ms=None):
    """One availableNow pass; the memory sink cannot recover from a
    checkpoint (needed for run #2 to see run #1's state), so the
    update-mode output lands via foreachBatch -> parquet."""
    out_dir = f"{ckpt_dir}_out_{name}"
    stream = spark.readStream.format("parquet").schema(SCHEMA).load(in_dir)
    q = (
        diff_sync_stream(
            stream,
            key_cols=["symbol"],
            compare_cols=["clinsig", "notes"],
            key_schema="symbol string",
            stale_after_ms=stale_after_ms,
        )
        .writeStream.foreachBatch(
            lambda bdf, _bid: bdf.write.mode("append").parquet(out_dir)
        )
        .outputMode("update")
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.read.parquet(out_dir)


def test_stream_matches_batch_diff(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("upsert_stream")
    in_dir, ckpt = str(root / "in"), str(root / "ckpt")

    drop1 = spark.createDataFrame(
        [("A", "pathogenic", "n1"), ("B", "benign", "n2")], SCHEMA
    )
    drop2 = spark.createDataFrame(
        [
            ("A", "pathogenic", "n1"),   # unchanged
            ("B", "likely benign", "n2"),  # updated
            ("C", "vus", "n3"),          # new
        ],
        SCHEMA,
    )

    drop1.coalesce(1).write.mode("append").parquet(in_dir)
    out1 = _run(spark, in_dir, ckpt, "upsert_out1")
    got1 = {r["symbol"]: r["change_type"] for r in out1.collect()}
    assert got1 == {"A": "INSERT", "B": "INSERT"}

    drop2.coalesce(1).write.mode("append").parquet(in_dir)
    out2 = _run(spark, in_dir, ckpt, "upsert_out2")
    got2 = {r["symbol"]: r["change_type"] for r in out2.collect()}

    expected = {
        r["symbol"]: r[CHANGE_COL]
        for r in diff_sync(
            drop2, drop1, key_cols=["symbol"], compare_cols=["clinsig", "notes"]
        ).collect()
    }
    assert got2 == expected == {"A": "UNCHANGED", "B": "UPDATE", "C": "INSERT"}


def test_duplicate_keys_in_one_batch_classify_against_batch_start(
    spark, tmp_path_factory
):
    # batch semantics parity: each duplicate compares against the SAME
    # prior state (diff_sync classifies each incoming dup against the
    # same existing row), then state advances to the last arrival
    root = tmp_path_factory.mktemp("upsert_dups")
    in_dir, ckpt = str(root / "in"), str(root / "ckpt")
    spark.createDataFrame([("A", "v1", "n")], SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    _run(spark, in_dir, ckpt, "dup_out1")

    spark.createDataFrame(
        [("A", "v2", "n"), ("A", "v1", "n")], SCHEMA
    ).coalesce(1).write.mode("append").parquet(in_dir)
    out = _run(spark, in_dir, ckpt, "dup_out2")
    changes = sorted(r["change_type"] for r in out.collect())
    # v2 differs from stored v1 -> UPDATE; the second dup also compares
    # against batch-start state v1 -> UNCHANGED (not against v2)
    assert changes == ["UNCHANGED", "UPDATE"]


def test_third_run_sees_advanced_state(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("upsert_adv")
    in_dir, ckpt = str(root / "in"), str(root / "ckpt")
    spark.createDataFrame([("A", "v1", "n")], SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    _run(spark, in_dir, ckpt, "adv1")
    spark.createDataFrame([("A", "v2", "n")], SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    _run(spark, in_dir, ckpt, "adv2")
    # state advanced to v2: replaying v2 is UNCHANGED now
    spark.createDataFrame([("A", "v2", "n")], SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    out = _run(spark, in_dir, ckpt, "adv3")
    assert [r["change_type"] for r in out.collect()] == ["UNCHANGED"]


def test_stale_key_surfaces_after_timeout(spark, tmp_path_factory):
    """W4 streaming analogue: a key silent past stale_after_ms emits
    one STALE marker with its last fingerprint, its state is evicted
    (bounded store), and a later reappearance classifies as INSERT —
    matching the batch engine's view of a deleted-then-reinserted
    row."""
    root = tmp_path_factory.mktemp("upsert_stale")
    in_dir, ckpt = str(root / "in"), str(root / "ckpt")
    # Wide enough that a run's own trailing no-data micro-batch cannot
    # fire it (availableNow schedules one to evaluate timeouts), narrow
    # enough that sleeping past it between runs is cheap.
    window_ms = 5000

    spark.createDataFrame(
        [("A", "pathogenic", "n1"), ("B", "benign", "n2")], SCHEMA
    ).coalesce(1).write.mode("append").parquet(in_dir)
    out1 = _run(spark, in_dir, ckpt, "stale1", stale_after_ms=window_ms)
    rows1 = out1.collect()
    assert {
        (r["symbol"], r["change_type"]) for r in rows1 if r["change_type"] != STALE
    } == {("A", "INSERT"), ("B", "INSERT")}
    fp_a = next(r["fingerprint"] for r in rows1 if r["symbol"] == "A")

    # let A's silence window elapse, then drop a batch touching only B
    time.sleep(window_ms / 1000 + 1.5)
    spark.createDataFrame([("B", "likely benign", "n2")], SCHEMA).coalesce(
        1
    ).write.mode("append").parquet(in_dir)
    out2 = _run(spark, in_dir, ckpt, "stale2", stale_after_ms=window_ms)
    rows2 = out2.collect()
    a_stale = [
        r for r in rows1 + rows2 if r["symbol"] == "A" and r["change_type"] == STALE
    ]
    # A surfaced as STALE exactly once, carrying the fingerprint it
    # went silent with
    assert [r["fingerprint"] for r in a_stale] == [fp_a]
    # B had data in run 2, so it classified rather than timing out
    # there; whether it's UPDATE or INSERT depends on whether run 1's
    # own trailing timeout batch already evicted it (sandbox batch
    # scheduling is slow enough that either is legal) — but the two
    # must be consistent: evicted -> INSERT, retained -> UPDATE.
    b_stale_run1 = any(
        r["symbol"] == "B" and r["change_type"] == STALE for r in rows1
    )
    (b_change2,) = {
        r["change_type"] for r in rows2 if r["symbol"] == "B" and r["change_type"] != STALE
    }
    assert b_change2 == ("INSERT" if b_stale_run1 else "UPDATE")

    # state was evicted: A reappearing is an INSERT, not UNCHANGED
    spark.createDataFrame([("A", "pathogenic", "n1")], SCHEMA).coalesce(
        1
    ).write.mode("append").parquet(in_dir)
    out3 = _run(spark, in_dir, ckpt, "stale3", stale_after_ms=window_ms)
    a_changes3 = {
        r["change_type"] for r in out3.collect() if r["symbol"] == "A"
    }
    assert "INSERT" in a_changes3 and "UNCHANGED" not in a_changes3
