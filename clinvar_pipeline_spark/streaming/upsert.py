"""Streaming upsert classification: the nightly diff-sync (J10/W1/W2,
operators/diff_sync.py) as an always-on incremental operator.

The batch engine classifies a release against the previous snapshot
with one full-outer join. This twin classifies a RECORD STREAM against
the state store: per natural key the state holds the last applied row
fingerprint, and each micro-batch emits INSERT (key never seen),
UPDATE (fingerprint differs) or UNCHANGED (fingerprint equal) — the
reference's no-op-downgrade rule (W2) as stream semantics. DELETE is
deliberately absent: absence of a key is not an event, so stale-key
deletion stays a batch concern (the W4/W5 guarded deletes).

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


def diff_sync_stream(
    records: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
    key_schema: str,
) -> DataFrame:
    """Classify a record stream into INSERT/UPDATE/UNCHANGED per key.

    ``records``: streaming DataFrame containing ``key_cols`` and
    ``compare_cols``. ``key_schema``: DDL for the key columns in the
    output (e.g. ``"symbol string"``) — applyInPandasWithState needs
    the output schema declared.

    Returns a stream of (key..., change_type, fingerprint) rows, one
    per input row, in update mode.
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
        yield pd.DataFrame(
            {
                **{c: [key[i]] * len(out) for i, c in enumerate(key_cols)},
                "change_type": [c for c, _ in out],
                "fingerprint": [f for _, f in out],
            }
        )

    return keyed.groupBy(*key_cols).applyInPandasWithState(
        classify,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

