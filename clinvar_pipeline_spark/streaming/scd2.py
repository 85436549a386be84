"""Streaming SCD Type 2 maintenance — the history-keeping dimension
build (queries_warehouse.scd2_frame) served on a live change feed.

streaming/upsert.py is the SCD1 twin (newest value wins, fingerprint
state per key); this module keeps the superseded versions: arriving
change rows close validity intervals incrementally, watermark-correct
under out-of-order delivery.

Why stateful and watermark-gated: a run boundary (one interval
closing, the next opening) is defined by the ORDER of a key's rows —
a late arrival landing between two already-seen rows can split or
extend a run. So a row may only be FOLDED into the run state when the
watermark proves nothing can still arrive before it (the
transitions_live_stream finalization argument, applied to run
collapse instead of adjacency):

- per key, state holds the open run (attr, version, valid_from,
  n_orders) plus a pending buffer of rows above the watermark —
  O(horizon), not O(history);
- each invocation folds the pending rows the watermark has passed, in
  (ts, order-key) order — the exact total order the batch
  scd2_frame uses — emitting an interval row whenever a run CLOSES;
- the open (current) run never emits on the stream: it is still
  mutable by definition. The drained output is therefore exactly the
  batch history's CLOSED intervals whose valid_to the final watermark
  passed — pinned by test; the batch query remains the verdict of
  record for the open tail (the neardup_stream discipline);
- keys with pending rows but no new arrivals flush by
  EventTimeTimeout pinned to their earliest pending event time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCD2_STATE_SCHEMA = (
    "cur_attr string, cur_version bigint, cur_from bigint, cur_n bigint, "
    "p_ts array<bigint>, p_ok array<bigint>, p_attr array<string>"
)

_SCD2_OUT_SCHEMA = (
    "custkey long, version long, priority string, "
    "valid_from_us long, valid_to_us long, n_orders long"
)


def scd2_live_stream(
    orders: DataFrame,
    watermark_delay: str = "10 seconds",
    by: str = "o_custkey",
    on: str = "o_orderdate",
    order_key: str = "o_orderkey",
    attr: str = "o_orderpriority",
) -> DataFrame:
    """Orders stream → appended CLOSED SCD2 intervals
    (custkey, version, priority, valid_from_us, valid_to_us,
    n_orders), each emitted exactly when the watermark finalizes the
    row that closed it."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def _fn(key, pdfs, state: GroupState):
        cur_attr, cur_version, cur_from, cur_n = None, 0, 0, 0
        p_ts: list[int] = []
        p_ok: list[int] = []
        p_attr: list[str] = []
        if state.exists:
            cur_attr, cur_version, cur_from, cur_n, sts, sok, sattr = state.get
            p_ts, p_ok, p_attr = list(sts), list(sok), list(sattr)
        for pdf in pdfs:
            if pdf.empty:
                continue
            for t, k, a in zip(
                pdf["_us"].astype("int64"),
                pdf[order_key].astype("int64"),
                pdf[attr],
            ):
                p_ts.append(int(t))
                p_ok.append(int(k))
                p_attr.append(str(a))

        wm_us = state.getCurrentWatermarkMs() * 1000
        pend = sorted(zip(p_ts, p_ok, p_attr))
        ready = [r for r in pend if r[0] <= wm_us]
        keep = [r for r in pend if r[0] > wm_us]

        closed = []
        for t, k, a in ready:
            if cur_attr is None:
                cur_attr, cur_version, cur_from, cur_n = a, 1, t, 1
            elif a == cur_attr:
                cur_n += 1
            else:
                closed.append(
                    (key[0], cur_version, cur_attr, cur_from, t, cur_n)
                )
                cur_attr, cur_version, cur_from, cur_n = (
                    a,
                    cur_version + 1,
                    t,
                    1,
                )

        state.update(
            (
                cur_attr,
                cur_version,
                cur_from,
                cur_n,
                [t for t, _, _ in keep],
                [k for _, k, _ in keep],
                [a for _, _, a in keep],
            )
        )
        if keep:
            # the watermark passing the earliest pending row must
            # re-invoke this key even with no new arrivals
            state.setTimeoutTimestamp(min(t for t, _, _ in keep) // 1000 + 1)

        if closed:
            yield pd.DataFrame(
                {
                    "custkey": pd.array([r[0] for r in closed], dtype="Int64"),
                    "version": pd.array([r[1] for r in closed], dtype="Int64"),
                    "priority": [r[2] for r in closed],
                    "valid_from_us": pd.array(
                        [r[3] for r in closed], dtype="Int64"
                    ),
                    "valid_to_us": pd.array(
                        [r[4] for r in closed], dtype="Int64"
                    ),
                    "n_orders": pd.array(
                        [r[5] for r in closed], dtype="Int64"
                    ),
                }
            )

    keyed = orders.withWatermark(on, watermark_delay).withColumn(
        "_us", F.unix_micros(F.col(on).cast("timestamp_ltz"))
    )
    return keyed.groupBy(by).applyInPandasWithState(
        _fn,
        outputStructType=_SCD2_OUT_SCHEMA,
        stateStructType=_SCD2_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
