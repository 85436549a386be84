"""Map-side partial top-k: shrink a per-key top-k's shuffle from
(keys x corpus) candidate rows to (partitions x keys x k) survivor
rows, exactly.

The global top-k per key is a subset of the union of per-partition
top-k's per key (any row outside its partition's top-k is beaten by k
rows that also reach the reducer), so pruning each partition to its
local top-k BEFORE the exchange never changes the result — the same
discipline TakeOrderedAndProject applies to global top-k and the PQ
ADC scan applies per query (operators/similarity.py), exposed here
for per-KEY top-k where Spark's window would otherwise shuffle every
candidate.

The kernel does NOT recompute scores — it prunes rows whose score
column was already computed upstream (JVM-side, e.g. the sequential
cosine in functions/hashes.cosine_similarity), so engine-exact value
semantics are untouched; only row count changes."""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def partition_topk(
    df: DataFrame,
    key_col: str,
    score_col: str,
    tiebreak_col: str,
    k: int,
) -> DataFrame:
    """Per input partition, keep only the top-``k`` rows per
    ``key_col`` ordered by (``score_col`` DESC, ``tiebreak_col`` ASC)
    — a pure prune, schema unchanged. Follow with the global window
    top-k; the window now sorts at most partitions x keys x k rows
    per key instead of the full candidate set.

    State per task is one (scores, tiebreaks, row-index) triple per
    key capped at k entries — bounded by keys x k, independent of
    partition size (batches stream through, never accumulate).

    Ordering edge cases match the Spark window it feeds: NaN scores
    rank LARGEST (Spark DESC semantics) and null keys form their own
    group. NULL scores are not supported (they would rank last in
    the window but NaN-first here — keep the score column
    non-nullable, as a computed similarity is)."""
    cols = list(df.columns)
    schema = df.schema

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        best: dict = {}  # key -> pruned pdf slice
        for pdf in batches:
            if pdf.empty:
                continue
            # dropna=False: a null key is its own group downstream
            # (Spark windows partition null keys together) — silently
            # dropping those rows would change the result
            for key, g in pdf.groupby(key_col, sort=False, dropna=False):
                if key in best:
                    g = pd.concat([best[key], g], ignore_index=True)
                if len(g) > k:
                    s = g[score_col].to_numpy(dtype="float64")
                    t = g[tiebreak_col].to_numpy()
                    # match Spark's DESC ordering where NaN ranks
                    # LARGEST (numpy lexsort would put NaN last and
                    # prune rows the window would keep)
                    skey = np.where(np.isnan(s), -np.inf, -s)
                    keep = np.lexsort((t, skey))[:k]
                    g = g.iloc[keep]
                best[key] = g.reset_index(drop=True)
        if best:
            yield pd.concat(best.values(), ignore_index=True)[cols]

    return df.mapInPandas(gen, schema=schema)
