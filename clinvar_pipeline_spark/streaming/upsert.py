"""Streaming upsert classification: the nightly diff-sync (J10/W1/W2,
operators/diff_sync.py) as an always-on incremental operator.

The batch engine classifies a release against the previous snapshot
with one full-outer join. This twin classifies a RECORD STREAM against
the state store: per natural key the state holds the last applied row
fingerprint, and each micro-batch emits INSERT (key never seen),
UPDATE (fingerprint differs) or UNCHANGED (fingerprint equal) — the
reference's no-op-downgrade rule (W2) as stream semantics. DELETE is
deliberately absent: absence of a key is not an event, so stale-key
DELETION stays a batch concern (the W4/W5 guarded deletes) — but
stale-key OBSERVABILITY is streamable: with ``stale_after_ms`` set,
keys that receive no record for that long surface one STALE marker
row via GroupStateTimeout (processing time), the streaming analogue
of the batch W4 delete-candidate scan (operators/guarded_delete.py).
The marker is an observation, not a delete — downstream thresholds
and decides, exactly as the batch guard does before deleting.

Semantics match batch diff_sync on duplicate keys: every row in a
micro-batch classifies against the state AT BATCH START (the batch
engine compares each incoming duplicate against the same existing
row); the state then advances to the batch's last-arrived fingerprint.

Scale: state is one fingerprint string per key, sharded by the group
hash like any stateful agg; fingerprints are computed map-side (md5
over normalized compare columns) so the shuffle carries keys +
16-byte digests, never wide rows — the same discipline as the batch
diff (diff_sync docstring, scale notes).
"""

from __future__ import annotations

from typing import Iterator, Sequence, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from clinvar_pipeline_spark.operators.diff_sync import (
    INSERT,
    UNCHANGED,
    UPDATE,
    row_fingerprint,
)

_STATE_SCHEMA = "fp string"
_CHANGE_SCHEMA = "change_type string, fingerprint string"

#: Marker emitted for keys silent longer than ``stale_after_ms`` —
#: the streaming observability analogue of the batch W4/W5 guarded
#: delete candidates. Never emitted by the batch diff_sync.
STALE = "STALE"


def diff_sync_stream(
    records: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
    key_schema: str,
    stale_after_ms: int | None = None,
) -> DataFrame:
    """Classify a record stream into INSERT/UPDATE/UNCHANGED per key.

    ``records``: streaming DataFrame containing ``key_cols`` and
    ``compare_cols``. ``key_schema``: DDL for the key columns in the
    output (e.g. ``"symbol string"``) — applyInPandasWithState needs
    the output schema declared.

    ``stale_after_ms``: if set, a key that receives no record for this
    long (processing time) emits one ``STALE`` marker row carrying its
    last fingerprint, and its state is dropped — so a key that later
    reappears classifies as INSERT, matching the batch engine's view
    of a deleted-then-reinserted row. State stays bounded: silent keys
    are evicted instead of accumulating forever.

    Returns a stream of (key..., change_type, fingerprint) rows, one
    per input row (plus STALE markers), in update mode.
    """
    keyed = records.withColumn("_fp", row_fingerprint(compare_cols)).select(
        *key_cols, "_fp"
    )
    out_schema = f"{key_schema}, {_CHANGE_SCHEMA}"

    def classify(
        key: Tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if stale_after_ms is not None and state.hasTimedOut:
            # No records this batch and the silence window elapsed:
            # surface the key once, drop its state (bounded store).
            prev_fp = state.get[0] if state.exists else None
            state.remove()
            yield pd.DataFrame(
                {
                    **{c: [key[i]] for i, c in enumerate(key_cols)},
                    "change_type": [STALE],
                    "fingerprint": [prev_fp],
                }
            )
            return
        prev_fp = state.get[0] if state.exists else None
        last_fp = prev_fp
        out = []
        for pdf in pdfs:
            for fp in pdf["_fp"]:
                if prev_fp is None:
                    change = INSERT
                elif fp != prev_fp:
                    change = UPDATE
                else:
                    change = UNCHANGED
                out.append((change, fp))
                last_fp = fp
        if last_fp is not None:
            state.update((last_fp,))
            if stale_after_ms is not None:
                # Timeouts reset on every function call; re-arm so the
                # silence clock restarts at the key's latest record.
                state.setTimeoutDuration(stale_after_ms)
        yield pd.DataFrame(
            {
                **{c: [key[i]] * len(out) for i, c in enumerate(key_cols)},
                "change_type": [c for c, _ in out],
                "fingerprint": [f for _, f in out],
            }
        )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if stale_after_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return keyed.groupBy(*key_cols).applyInPandasWithState(
        classify,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )

