"""Streaming as-of attribution: arriving left rows (e.g. purchases)
joined as-of against a FROZEN right-side history (e.g. the view log
up to the stream's start) per micro-batch.

Structured Streaming cannot express the batch as-of plan directly —
the union + window carry-forward needs a per-key sort over both
sides, which a streaming window without watermark semantics cannot
do. But the BACKWARD as-of of each left row against a frozen right
side is row-independent (the match depends only on the right frame,
never on other left rows), so running the batch operator inside
``foreachBatch`` against the frozen frame is EXACTLY equivalent to
the batch join on the same rows — no approximation, no ordering
dependence across micro-batches. The test pins streamed output ==
batch asof_join over a two-batch drop.

Same lifecycle as the other streamed stages (streaming/corpus.py):
availableNow + checkpoint for incremental reruns; the right side is
run-scoped frozen state, so reruns attribute new arrivals under
exactly the history already-landed rows saw. A LIVE right side
(views also streaming) is the stream-stream case, which needs
watermarked state retention — out of scope here by design; the
nightly batch asof is the verdict of record (the neardup_stream
discipline)."""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame

from clinvar_pipeline_spark.operators.temporal import asof_join


def asof_stream(
    left_stream: DataFrame,
    right: DataFrame,
    out_path: str,
    checkpoint: str,
    on: str = "ts",
    by: Sequence[str] = ("user_id",),
    direction: str = "backward",
    tolerance_us: int | None = None,
):
    """Start the streaming as-of join: each micro-batch of left rows
    is asof_join'ed against the frozen ``right`` frame and appended
    to ``out_path``. Returns the StreamingQuery."""

    def _do(batch_df: DataFrame, _epoch: int) -> None:
        asof_join(
            batch_df,
            right,
            on=on,
            by=by,
            direction=direction,
            tolerance_us=tolerance_us,
        ).write.mode("append").parquet(out_path)

    return (
        left_stream.writeStream.foreachBatch(_do)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
