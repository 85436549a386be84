"""Structured Streaming tests: drive the windowed aggregations and the
custom stateful operator over a real file stream (two micro-batches via
two parquet drops), and check streaming results equal the batch
formulation of the same expressions."""

import pytest
from pyspark.sql import functions as F

from clinvar_pipeline_spark.streaming.windows import (
    read_event_stream,
    running_user_totals,
    session_counts,
    sliding_counts,
    tumbling_counts,
)


@pytest.fixture(scope="module")
def event_batches(spark):
    rows1 = [
        (1, "2024-01-01 00:01:00", 1, "click", 1.0, "{}"),
        (2, "2024-01-01 00:04:00", 1, "view", 2.0, "{}"),
        (3, "2024-01-01 00:12:00", 2, "click", 3.0, "{}"),
    ]
    rows2 = [
        (4, "2024-01-01 00:13:00", 1, "click", 4.0, "{}"),
        (5, "2024-01-01 01:00:00", 2, "purchase", 5.0, "{}"),
    ]

    def mk(rows):
        return spark.createDataFrame(
            rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))

    return mk(rows1), mk(rows2)


def _run_stream(spark, stream_df, tmpdir, out_name, output_mode):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(out_name)
        .outputMode(output_mode)
        .option("checkpointLocation", f"{tmpdir}/ckpt_{out_name}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(out_name)


@pytest.fixture(scope="module")
def input_dir(spark, event_batches, tmp_path_factory):
    d = tmp_path_factory.mktemp("stream_in")
    b1, b2 = event_batches
    b1.coalesce(1).write.mode("append").parquet(str(d / "events"))
    b2.coalesce(1).write.mode("append").parquet(str(d / "events"))
    return str(d / "events")


def test_tumbling_stream_matches_batch(spark, input_dir, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("t1")
    stream = tumbling_counts(read_event_stream(spark, input_dir))
    got = _run_stream(spark, stream, tmp, "tumbling_out", "complete")
    expected = (
        spark.read.parquet(input_dir)
        .groupBy(F.window("ts", "10 minutes").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .select(F.col("win.start").alias("win_start"), "event_type", "n", "total")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expected.collect()))


def test_sliding_stream_matches_batch(spark, input_dir, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("t2")
    got = _run_stream(
        spark, sliding_counts(read_event_stream(spark, input_dir)), tmp, "sliding_out", "complete"
    )
    expected = (
        spark.read.parquet(input_dir)
        .groupBy(F.window("ts", "10 minutes", "5 minutes").alias("win"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("win_start"), "n")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expected.collect()))


def test_session_stream_matches_batch(spark, input_dir, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("t3")
    got = _run_stream(
        spark, session_counts(read_event_stream(spark, input_dir)), tmp, "session_out", "complete"
    )
    expected = (
        spark.read.parquet(input_dir)
        .groupBy(F.session_window("ts", "30 minutes").alias("win"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "user_id",
            "n",
        )
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expected.collect()))


def test_running_totals_stateful(spark, input_dir, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("t4")
    got = _run_stream(
        spark,
        running_user_totals(read_event_stream(spark, input_dir)),
        tmp,
        "totals_out",
        "update",
    )
    # availableNow processes all files; the memory sink holds the final
    # update per user (possibly several updates; take the last = max n)
    final = (
        got.groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"), F.max("total").alias("total"))
        .collect()
    )
    by_user = {r["user_id"]: (r["n_events"], r["total"]) for r in final}
    assert by_user[1] == (3, 7.0)
    assert by_user[2] == (2, 8.0)


def test_dedup_stream_drops_repeats(spark, event_batches, tmp_path_factory):
    from clinvar_pipeline_spark.streaming.windows import dedup_stream

    d = tmp_path_factory.mktemp("stream_dedup")
    b1, b2 = event_batches
    # write batch 1 twice + batch 2 once: event_ids 1-3 arrive duplicated
    b1.coalesce(1).write.mode("append").parquet(str(d / "events"))
    b1.coalesce(1).write.mode("append").parquet(str(d / "events"))
    b2.coalesce(1).write.mode("append").parquet(str(d / "events"))

    stream = read_event_stream(spark, str(d / "events"))
    out = _run_stream(
        spark, dedup_stream(stream), str(d), "dedup_out", "append"
    )
    got = sorted(r["event_id"] for r in out.collect())
    assert got == [1, 2, 3, 4, 5]
