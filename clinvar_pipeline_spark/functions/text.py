"""Text expressions: term-name normalization (JVM-side), UTF-8
byte-budget truncation and width-bucketed packing (Arrow pandas UDFs —
the only two operators in the engine whose exact semantics ``substring``
/ higher-order functions cannot express, SURVEY §2.8)."""

from __future__ import annotations

from typing import List, Optional

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

from clinvar_pipeline_spark.config import TRIM_SUFFIX


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def normalize_term_key(name: Column | str) -> Column:
    """Normalized term-match key (J11, TermNameMatcher.java:135-150):
    lowercase, strip ``-,()/`` to spaces, split on whitespace, **sort
    the words**, join with ``.``. Used as an equi-join key against the
    ontology index, turning fuzzy name matching into a hash join."""
    c = _col(name)
    words = F.split(
        F.trim(F.regexp_replace(F.lower(c), "[-,()/]", " ")), "\\s+"
    )
    return F.concat_ws(".", F.array_sort(F.array_remove(words, "")))


# ---------------------------------------------------------------------------
# UTF-8 byte-budget truncation (M9, Manager.java:148-183, Dao.java:157-209).
#
# Oracle VARCHAR2(4000 BYTE) parity: a string whose UTF-8 encoding
# exceeds `budget` bytes is cut (never splitting a multibyte sequence)
# so that trimmed + " ..." fits in `budget`, and " ..." is appended to
# signal truncation. `substring` is char-based so it cannot express
# this; octet_length can only test. Vectorized over Arrow batches.
# ---------------------------------------------------------------------------

def _byte_trim_py(s: Optional[str], budget: int, suffix: str = TRIM_SUFFIX) -> Optional[str]:
    if s is None:
        return None
    raw = s.encode("utf-8")
    if len(raw) <= budget:
        return s
    keep = budget - len(suffix.encode("utf-8"))
    # cut at the byte budget, dropping any trailing incomplete multibyte
    # sequence (input is valid UTF-8, so 'ignore' only ever drops that)
    return raw[:keep].decode("utf-8", errors="ignore") + suffix


def byte_trim(col: Column | str, budget: int) -> Column:
    """Column expression form of the byte-budget trim. Fast path: rows
    already within budget bypass Python entirely via ``octet_length``
    guard (the UDF only ever sees rows that might need cutting)."""

    @pandas_udf(StringType())
    def _trim(s: pd.Series) -> pd.Series:
        return s.map(lambda v: _byte_trim_py(v, budget))

    c = _col(col)
    return F.when(F.octet_length(c) <= F.lit(budget), c).otherwise(_trim(c))


def byte_trim_py(s: Optional[str], budget: int) -> Optional[str]:
    """Python-level reference implementation (exported for golden tests
    and driver-side use)."""
    return _byte_trim_py(s, budget)


# ---------------------------------------------------------------------------
# Width-bucketed packing (A3, AnnotCache.java:136-167,213-244).
#
# A merged sorted set whose `|`-joined serialization would exceed a
# byte width is split into multiple rows, each row's serialization
# ≤ width. The reference splits the *sorted joined string* at the last
# '|' before the limit — i.e. greedy left-to-right packing of sorted
# elements. Deterministic: same input set → same buckets.
# ---------------------------------------------------------------------------

def _pack_py(items: Optional[List[str]], width: int, joiner: str = "|") -> Optional[List[List[str]]]:
    if items is None:
        return None
    elems = sorted(set(items))
    buckets: List[List[str]] = []
    cur: List[str] = []
    cur_len = 0
    jlen = len(joiner)
    for e in elems:
        add = len(e) if not cur else cur_len + jlen + len(e)
        if cur and add > width:
            buckets.append(cur)
            cur, cur_len = [e], len(e)
        else:
            cur, cur_len = cur + [e], add
    if cur or not buckets:
        buckets.append(cur)
    return buckets


def pack_width_buckets(col: Column | str, width: int) -> Column:
    """array<string> → array<array<string>>: greedy packing of the
    sorted deduped elements into buckets whose ``|``-joined length is
    ≤ ``width``. Explode the result to materialize the split rows."""

    @pandas_udf(ArrayType(ArrayType(StringType())))
    def _pack(s: pd.Series) -> pd.Series:
        return s.map(lambda v: _pack_py(list(v) if v is not None else None, width))

    return _pack(_col(col))


def pack_py(items: Optional[List[str]], width: int) -> Optional[List[List[str]]]:
    """Python-level reference implementation for golden tests."""
    return _pack_py(items, width)
