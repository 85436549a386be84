"""Schema-evolution-tolerant document ingest — the front door for a
corpus accumulated over YEARS of drops whose schemas drifted (columns
added, ids widened, metadata renamed away): at 100 TB you cannot
rewrite old drops to the current schema, so the reader must reconcile.

Spark's own ``mergeSchema`` only UNIONS schemas (and refuses true type
conflicts); this module goes the rest of the way to the canonical
``documents`` shape (streaming/corpus.DOCUMENT_SCHEMA):

- missing nullable columns are injected as nulls (``lang``/``source``)
  or DERIVED where a faithful derivation exists (``n_chars`` =
  length(text); ``doc_id`` = xxhash64(text, source-literal) — stable
  across re-reads, the warc_documents discipline);
- integer widths widen (int -> long) and other safe casts apply;
- extra columns are dropped (reported, not silently);
- a drop with no ``text`` column cannot be a document corpus — it is
  REJECTED as a whole, reported, and never unioned (the quarantine
  discipline at drop granularity).

Everything decision-shaped happens on DRIVER-SIDE METADATA (one
``spark.read.parquet(path).schema`` per drop — footer-only, no data
scan; drops number in the dozens at any corpus size), then ONE
unionByName plan over the reconciled frames — Catalyst sees a plain
multi-source scan with per-source projections, so pushdown and
pruning work exactly as for a homogeneous read.

Returns a machine-checkable reconciliation REPORT frame rather than
log lines: (path, column, action) — the counter-frame discipline of
the other sources applied to schema drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from clinvar_pipeline_spark.streaming.corpus import DOCUMENT_SCHEMA

_CANON = [
    ("doc_id", T.LongType()),
    ("text", T.StringType()),
    ("lang", T.StringType()),
    ("source", T.StringType()),
    ("n_chars", T.LongType()),
]

# widenings that cannot lose information; anything else is a reject
_SAFE_CASTS = {
    (T.IntegerType(), T.LongType()),
    (T.ShortType(), T.LongType()),
    (T.ByteType(), T.LongType()),
}


def reconcile_documents(
    spark: SparkSession, paths: list[str]
) -> tuple[DataFrame, DataFrame]:
    """(documents, report): union the parquet document drops under
    ``paths`` reconciled to DOCUMENT_SCHEMA. ``report`` has one row
    per (path, column, action); action ∈ {ok, cast:<from>-><to>,
    missing->null, derived:<expr>, extra:dropped,
    rejected:<reason>}. A rejected drop contributes report rows only.
    """
    frames: list[DataFrame] = []
    report_rows: list[tuple[str, str, str]] = []
    for path in paths:
        try:
            src = spark.read.parquet(path)
        except Exception as e:  # unreadable drop: reject, don't crash
            report_rows.append((path, "*", f"rejected:unreadable:{type(e).__name__}"))
            continue
        have = {f.name: f.dataType for f in src.schema.fields}
        if "text" not in have or not isinstance(have["text"], T.StringType):
            report_rows.append((path, "text", "rejected:no text column"))
            continue
        cols = []
        ok = True
        for name, want in _CANON:
            if name in have:
                got = have[name]
                if got == want:
                    cols.append(F.col(name))
                    report_rows.append((path, name, "ok"))
                elif (got, want) in _SAFE_CASTS:
                    cols.append(F.col(name).cast(want).alias(name))
                    report_rows.append(
                        (path, name,
                         f"cast:{got.simpleString()}->{want.simpleString()}")
                    )
                else:
                    report_rows.append(
                        (path, name,
                         f"rejected:unsafe type {got.simpleString()} for "
                         f"{want.simpleString()}")
                    )
                    ok = False
                    break
            elif name == "n_chars":
                cols.append(F.length("text").cast("long").alias("n_chars"))
                report_rows.append((path, name, "derived:length(text)"))
            elif name == "doc_id":
                # stable across re-reads and engine-portable: hash of
                # the content plus the drop path (two drops sharing a
                # text must not collapse to one id)
                cols.append(
                    F.xxhash64(F.col("text"), F.lit(path)).alias("doc_id")
                )
                report_rows.append((path, name, "derived:xxhash64(text,path)"))
            else:
                cols.append(F.lit(None).cast(want).alias(name))
                report_rows.append((path, name, "missing->null"))
        if not ok:
            continue
        for name in sorted(set(have) - {n for n, _ in _CANON}):
            report_rows.append((path, name, "extra:dropped"))
        frames.append(src.select(*cols))
    if frames:
        docs = frames[0]
        for f in frames[1:]:
            docs = docs.unionByName(f)
    else:
        docs = spark.createDataFrame([], DOCUMENT_SCHEMA)
    report = spark.createDataFrame(
        report_rows, "path string, column string, action string"
    )
    return docs, report
