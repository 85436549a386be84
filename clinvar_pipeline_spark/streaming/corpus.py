"""Streaming corpus preparation: the stateless corpus-prep operators
(PII scrub, repetition gates) over a Structured Streaming document
source.

The batch suite in queries_llm.py is built from per-row expressions,
which are streaming-legal unchanged — this module is the proof: the
same expression builders run over ``readStream`` with no operator
rewrites, so an ingest pipeline can scrub and gate documents as they
arrive instead of in a nightly pass. (The stateful/global stages —
dedup pair generation, stratified rates, sequence packing — stay
batch or use the stateful twins in streaming/windows.py /
streaming/upsert.py: they need corpus-wide aggregates by nature.)

Equality with the batch formulation is pinned by
tests/test_streaming_corpus.py over a two-micro-batch file stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCUMENT_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def read_document_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream of document parquet drops (each new file =
    one micro-batch of documents; schema must be declared for
    streaming reads)."""
    return spark.readStream.schema(DOCUMENT_SCHEMA).parquet(path)


def read_document_stream_jsonl(
    spark: SparkSession, path: str
) -> DataFrame:
    """Streaming JSONL ingest (the corpus interchange format as a
    live source): schema-enforced, corrupt lines dropped map-side
    (in streaming, a corrupt-count aggregate would need its own
    stateful query — batch ingest via sources/jsonl.py is where the
    counters live)."""
    from clinvar_pipeline_spark.sources.jsonl import DOCUMENT_FIELDS

    raw = (
        spark.readStream.schema(f"{DOCUMENT_FIELDS}, _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    return raw.filter(F.col("_corrupt_record").isNull()).drop(
        "_corrupt_record"
    )


def scrub_stream(docs: DataFrame) -> DataFrame:
    """Per-document PII scrub on a (possibly streaming) frame: counts
    per class + scrubbed text. Map-only → append-mode safe."""
    from clinvar_pipeline_spark.queries_llm import pii_scrub_exprs

    e = pii_scrub_exprs(F.col("text"))
    return docs.select(
        "doc_id",
        e["n_email"].alias("n_email"),
        e["n_card"].alias("n_card"),
        e["n_ip"].alias("n_ip"),
        e["scrubbed"].alias("text_scrubbed"),
    )


def gates_stream(docs: DataFrame) -> DataFrame:
    """Repetition quality gates on a (possibly streaming) frame.
    Map-only → append-mode safe."""
    from clinvar_pipeline_spark.queries_llm import repetition_metrics

    return repetition_metrics(docs, "doc_id", "text")
