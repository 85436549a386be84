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

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCUMENT_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def _stream_path(path: str) -> str:
    """The streaming file source requires a DIRECTORY or a glob —
    pointing it at a single file (the testdata layout) fails with
    "basePath must be a directory". A file path is rewritten as the
    equivalent Hadoop glob (`dir/[d]ocuments.parquet`), which matches
    exactly that file while the inferred basePath stays the parent
    directory.

    EVERY glob metacharacter in the basename is bracket-escaped, not
    just the first character — a drop named `docs[1].jsonl` rewritten
    as `[d]ocs[1].jsonl` would have its `[1]` read as a character
    class and silently match a different file (`docs1.jsonl`)."""
    import os

    if os.path.isfile(path):
        d, b = os.path.split(path)
        esc = "".join(
            f"[{c}]" if c in "*?[]{}" else c for c in b
        )
        if esc == b:
            # no metachars to escape: bracket the first char so the
            # path still reads as a glob (else the directory check
            # fires)
            esc = f"[{b[0]}]{b[1:]}"
        return os.path.join(d, esc)
    return path


def read_document_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream of document parquet drops (each new file =
    one micro-batch of documents; schema must be declared for
    streaming reads)."""
    return spark.readStream.schema(DOCUMENT_SCHEMA).parquet(
        _stream_path(path)
    )


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
        .json(_stream_path(path))
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


def media_features_stream(docs: DataFrame) -> DataFrame:
    """Full-ladder multimodal feature extraction on a (possibly
    streaming) frame — the multimodal-ingest-at-scale pattern: the
    map-only Arrow kernel (operators/multimodal.extract_media_features,
    fixed 14-row fan-out per payload, pixel/frame/pcm/byte tiers)
    runs per micro-batch with no state, so the streamed rows are
    byte-identical to the batch query's on the same documents
    (pinned by tests/test_streaming_corpus.py). Map-only →
    append-mode safe (the scrub_stream discipline)."""
    from clinvar_pipeline_spark.operators.multimodal import (
        attach_binary,
        extract_media_features,
    )

    return extract_media_features(attach_binary(docs, "doc_id", "text"))


def eval_shingle_hashes(eval_docs: DataFrame, k: int = 3) -> set:
    """Build the benchmark's k-gram hash set driver-side (bounded:
    benchmark sets are eval-sized by definition — the same broadcast
    budget the batch decontaminate gives its semi-join side). The set
    rides to executors via closure capture in
    :func:`decontaminate_stream`."""
    from clinvar_pipeline_spark.functions.hashes import (
        normalized_tokens,
        shingles_of_tokens,
    )

    rows = (
        eval_docs.select(
            F.explode(
                shingles_of_tokens(normalized_tokens(F.col("text")), k=k)
            ).alias("s")
        )
        .select(F.xxhash64("s").alias("h"))
        .distinct()
        .collect()
    )
    return {r["h"] for r in rows}


def decontaminate_stream(
    docs: DataFrame, eval_hashes: set, k: int = 3, flag: float = 0.5
) -> DataFrame:
    """Per-document benchmark-contamination check on a (possibly
    streaming) frame: each arriving document's distinct k-gram hashes
    are tested against the captured eval set INSIDE one Arrow kernel —
    a document's shingles all live in its own row, so no streaming
    aggregation or watermark is needed and the operator stays map-only
    / append-safe. Semantics match the batch `decontaminate` query
    (same tokenizer, shingler, xxhash64 family via a JVM pre-pass,
    ratio, and flag threshold); pinned equal by test.

    Scale: the eval set is benchmark-sized; the kernel receives
    (doc_id, shingle-hash array) columns only."""
    from pyspark.sql.functions import pandas_udf

    from clinvar_pipeline_spark.functions.hashes import (
        normalized_tokens,
        shingles_of_tokens,
    )

    @pandas_udf("int")
    def n_hits(hs: pd.Series) -> pd.Series:
        # arrays arrive as numpy ndarrays — `arr or []` is ambiguous
        out = []
        for arr in hs:
            if arr is None:
                out.append(0)
            else:
                out.append(sum(1 for h in arr if int(h) in eval_hashes))
        return pd.Series(out, dtype="int32")

    sh = F.expr("transform(_sh, s -> xxhash64(s))")
    base = docs.select(
        "doc_id",
        shingles_of_tokens(normalized_tokens(F.col("text")), k=k).alias(
            "_sh"
        ),
    ).select("doc_id", sh.alias("_h"))
    ratio = F.col("n_contaminated").cast("double") / F.col("n_shingles")
    return (
        base.filter(F.size("_h") > 0)
        .select(
            "doc_id",
            F.size("_h").alias("n_shingles"),
            n_hits(F.col("_h")).alias("n_contaminated"),
        )
        .filter(F.col("n_contaminated") > 0)
        .select(
            "doc_id",
            "n_shingles",
            "n_contaminated",
            F.round(ratio, 4).alias("contamination_ratio"),
            F.when(ratio >= flag, 1).otherwise(0).alias(
                "flag_contaminated"
            ),
        )
    )

def train_quality_weights(batch_docs: DataFrame) -> tuple[dict, float]:
    """Batch-train the linear BoW quality model
    (queries_llm.quality_weight_frame — same slices, smoothing, and
    log-odds closed form as the batch quality_classifier query) and
    collect the VOCAB-sized weight table driver-side. Bounded by the
    same budget eval_shingle_hashes gives the benchmark set: a
    classifier vocabulary is ~1e5-1e6 tokens regardless of corpus
    size. The dict rides to executors via closure capture in
    :func:`quality_stream` — corpus state trained once in batch,
    served to every arriving micro-batch (the quantizer
    discipline)."""
    from clinvar_pipeline_spark.queries_llm import (
        doc_tokens,
        quality_weight_frame,
    )

    w, wu = quality_weight_frame(doc_tokens(batch_docs))
    return {r["t"]: r["w"] for r in w.collect()}, wu


def quality_stream(
    docs: DataFrame, weights: dict, w_unseen: float
) -> DataFrame:
    """Model-based quality scoring on a (possibly streaming) frame:
    per-document mean token log-odds under the captured weight table,
    keep_flag at 0 — the serving half of the batch
    quality_classifier query (same tokenizer, same rounding, same
    flag rule; pinned equal by test). Map-only / append-safe: a
    document's score is a pure function of its own row plus the
    broadcast-captured model.

    Scale: tokens never leave their row — the Arrow kernel receives
    (token-array) columns and emits one double per doc."""
    import math

    from pyspark.sql.functions import pandas_udf

    from clinvar_pipeline_spark.functions.hashes import normalized_tokens

    @pandas_udf("double")
    def mean_logodds(toks: pd.Series) -> pd.Series:
        # math.fsum: the batch twin's distributed avg() sums partials
        # in nondeterministic order; a naive in-order Python sum would
        # make stream/batch equality hinge on round(.,4) absorbing
        # last-ulp drift. fsum is exactly rounded, so the served score
        # is summation-order INDEPENDENT — the stream's value is
        # deterministic relative to the batch twin, and any residual
        # divergence would sit at a true 4-decimal rounding boundary
        # of the exact sum, not at a float-association accident
        # (review finding).
        out = []
        for arr in toks:
            out.append(
                math.fsum(weights.get(t, w_unseen) for t in arr)
                / len(arr)
            )
        return pd.Series(out, dtype="float64")

    base = docs.select(
        "doc_id", normalized_tokens(F.col("text")).alias("_toks")
    ).filter(F.size("_toks") > 0)
    score = F.round(mean_logodds(F.col("_toks")), 4)
    return base.select(
        "doc_id",
        F.size("_toks").cast("long").alias("n_tokens"),
        # + 0 folds -0.0 to +0.0 (the batch query's signed-zero
        # discipline — stream must hash-match it)
        (score + F.lit(0.0)).alias("score"),
        F.when(score > 0, 1).otherwise(0).alias("keep_flag"),
    )

def _artifact_exists(spark: SparkSession, path: str) -> bool:
    """Probe run-artifact existence through the Hadoop FileSystem API
    so the freshness gate works on every filesystem Spark can write.
    ``os.path.exists`` answers for the driver's LOCAL disk only — for
    an ``hdfs://`` / ``s3a://`` artifact it is always False, so a
    local-path check would silently retrain and overwrite the frozen
    model/eval set on every rerun, reintroducing exactly the
    arrival-order dependence the artifacts exist to prevent (review
    finding). The probe resolves the path against ITS OWN scheme's
    filesystem (``Path.getFileSystem``), matching where the
    save_* writers land it."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(jpath))


def save_quality_model(
    spark: SparkSession, weights: dict, w_unseen: float, path: str
) -> None:
    """Land the trained model as a parquet run artifact (the
    save_centroids / ivf_index lifecycle): one (t, w) row per vocab
    token plus a NULL-token row holding the unseen default. The model
    an incremental streaming run serves must be FROZEN — retraining
    on each rerun's grown corpus would score new arrivals under a
    different model than already-landed rows (review finding)."""
    rows = [(t, float(w)) for t, w in weights.items()]
    rows.append((None, float(w_unseen)))
    spark.createDataFrame(rows, "t string, w double").coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)


def load_quality_model(
    spark: SparkSession, path: str
) -> tuple[dict, float] | None:
    """Load a frozen quality model saved by save_quality_model; None
    ONLY if no model has been landed at `path` yet. A read failure on
    an EXISTING artifact (corrupt footer from an interrupted
    overwrite, FS error) PROPAGATES — silently retraining there would
    overwrite the frozen model and reintroduce the arrival-order
    dependence the artifact exists to prevent (review finding).
    Existence probes through the Hadoop FS API (_artifact_exists) so
    the gate holds for hdfs://s3a:// artifacts, not just local
    paths."""
    if not _artifact_exists(spark, path):
        return None
    rows = spark.read.parquet(path).collect()
    weights = {r["t"]: r["w"] for r in rows if r["t"] is not None}
    wu = next(r["w"] for r in rows if r["t"] is None)
    return weights, wu


def train_langid_model(
    batch_docs: DataFrame,
) -> tuple[dict[str, dict[str, float]], dict[str, float]]:
    """Batch-train the char-trigram language-ID model
    (queries_llm.langid_model — same slices, smoothing, and
    log-probability closed form as the batch langid query) and
    collect it driver-side: ({lang: {trigram: w}}, {lang: wu}). The
    collect is charset^3 x n_languages bounded (trigram vocabulary is
    CHARSET-limited, unlike word vocab), so it rides to executors via
    closure capture like the quality model — corpus state trained
    once in batch, served to every arriving micro-batch."""
    from clinvar_pipeline_spark.queries_llm import (
        _lid_trigrams,
        langid_model,
    )

    lw, lwu = langid_model(_lid_trigrams(batch_docs))
    models: dict[str, dict[str, float]] = {}
    for r in lw.collect():
        models.setdefault(r["cand"], {})[r["t"]] = r["w"]
    wu = {r["cand"]: r["wu"] for r in lwu.collect()}
    return models, wu


def _round4_half_up(x: float) -> float:
    """Spark's round(col, 4): BigDecimal(x).setScale(4, HALF_UP) on
    the double's exact binary value — the decimal module reproduces
    it bit-for-bit, so the served score equals the batch twin's
    without leaning on floats near the boundary."""
    import decimal

    return float(
        decimal.Decimal(x).quantize(
            decimal.Decimal("0.0001"), rounding=decimal.ROUND_HALF_UP
        )
    )


def langid_stream(
    docs: DataFrame,
    models: dict[str, dict[str, float]],
    wu: dict[str, float],
) -> DataFrame:
    """Language-ID serving on a (possibly streaming) frame: per
    document, score every language under the captured model and emit
    the argmax — the serving half of the batch langid query (same
    normalization, trigrams, rounding, and tie rule; pinned equal by
    test). Map-only / append-safe: a document's prediction is a pure
    function of its own row plus the broadcast-captured model — the
    argmax happens INSIDE the kernel, so no (streaming-illegal)
    per-doc window is needed.

    The kernel scores with math.fsum over per-trigram-instance terms
    (the exactly-rounded direct sum — summation-order independent,
    the quality_stream discipline) and rounds with the exact
    BigDecimal HALF_UP twin, then breaks rounded-score ties by max
    language code, matching the batch query's ORDER BY score DESC,
    cand DESC in both engines."""
    import math

    from pyspark.sql.functions import pandas_udf

    from clinvar_pipeline_spark.functions.hashes import normalized_tokens

    langs = sorted(wu)

    @pandas_udf("pred_lang string, score double")
    def predict(s: pd.Series) -> pd.DataFrame:
        preds, scores = [], []
        for txt in s:
            tris = [txt[i : i + 3] for i in range(len(txt) - 2)]
            best = None
            for lang in langs:
                m, d = models.get(lang, {}), wu[lang]
                sc = _round4_half_up(
                    math.fsum(m.get(t, d) for t in tris)
                ) + 0.0  # fold -0.0 (the batch signed-zero discipline)
                if best is None or (sc, lang) > best:
                    best = (sc, lang)
            scores.append(best[0])
            preds.append(best[1])
        return pd.DataFrame({"pred_lang": preds, "score": scores})

    base = docs.select(
        "doc_id",
        "lang",
        F.concat_ws(" ", normalized_tokens(F.col("text"))).alias("_s"),
    ).filter(F.length("_s") >= 3)  # < 1 trigram: absent, as in batch
    return base.withColumn("_p", predict(F.col("_s"))).select(
        "doc_id",
        "lang",
        F.col("_p.pred_lang").alias("pred_lang"),
        F.col("_p.score").alias("score"),
        F.when(F.col("_p.pred_lang") == F.col("lang"), 1)
        .otherwise(0)
        .alias("is_correct"),
    )


def save_langid_model(
    spark: SparkSession,
    models: dict[str, dict[str, float]],
    wu: dict[str, float],
    path: str,
) -> None:
    """Land the trained langid model as a parquet run artifact (the
    quality-model lifecycle): one (cand, t, w) row per language x
    trigram plus a NULL-trigram row per language holding its unseen
    default. Frozen at first run for the same arrival-order-
    independence reason."""
    rows = [
        (lang, t, float(w))
        for lang, m in models.items()
        for t, w in m.items()
    ]
    rows += [(lang, None, float(v)) for lang, v in wu.items()]
    spark.createDataFrame(
        rows, "cand string, t string, w double"
    ).coalesce(1).write.mode("overwrite").parquet(path)


def load_langid_model(
    spark: SparkSession, path: str
) -> tuple[dict[str, dict[str, float]], dict[str, float]] | None:
    """Load a frozen langid model saved by save_langid_model; None
    ONLY if never landed (read failures on an existing artifact
    propagate — the load_quality_model contract)."""
    if not _artifact_exists(spark, path):
        return None
    models: dict[str, dict[str, float]] = {}
    wu: dict[str, float] = {}
    for r in spark.read.parquet(path).collect():
        if r["t"] is None:
            wu[r["cand"]] = r["w"]
        else:
            models.setdefault(r["cand"], {})[r["t"]] = r["w"]
    return models, wu


def save_eval_hashes(spark: SparkSession, hashes: set, path: str) -> None:
    """Freeze the decontamination benchmark's shingle-hash set as a
    run artifact — the same lifecycle as the quality model: ALL
    run-scoped corpus state an incremental streaming run serves must
    be frozen at first run, or contamination flags become a function
    of arrival order (run-1 docs were never checked against eval docs
    that arrive later; review finding)."""
    spark.createDataFrame(
        [(int(h),) for h in sorted(hashes)], "h long"
    ).coalesce(1).write.mode("overwrite").parquet(path)


def load_eval_hashes(spark: SparkSession, path: str) -> set | None:
    """Load a frozen eval shingle set; None only if never landed
    (read failures on an existing artifact propagate, and existence
    probes through the Hadoop FS API — the load_quality_model
    discipline)."""
    if not _artifact_exists(spark, path):
        return None
    return {r["h"] for r in spark.read.parquet(path).collect()}


# ---------------------------------------------------------------------
# Incremental near-dup flagging (the dedup family's streaming story)
# ---------------------------------------------------------------------

def corpus_shingle_index(docs: DataFrame, k: int = 3) -> DataFrame:
    """The frozen-corpus side of the incremental near-dup flagger:
    per distinct k-gram hash, how many documents carry it and the
    smallest carrier id — ``(h, n_docs, min_doc)``. The (n_docs,
    min_doc) pair is exactly what self-exclusion needs at serve time:
    a document d's shingle hits the REST of the corpus iff
    ``n_docs > 1 OR min_doc != d``.

    CORPUS-sized state, so unlike the eval shingle set it is never
    collected — it lands as parquet (save via ordinary distributed
    write) and serves through a per-micro-batch stream-static join,
    not closure capture. Building it is one explode + one groupBy on
    the hash."""
    from clinvar_pipeline_spark.functions.hashes import (
        normalized_tokens,
        shingles_of_tokens,
    )

    # project tokens FIRST: inlining the tokenizer into the shingle
    # lambda re-evaluates it per shingle (functions/hashes.py
    # shingles_of_tokens docstring; measured 6x)
    sh = docs.select(
        "doc_id", normalized_tokens(F.col("text")).alias("toks")
    ).select(
        "doc_id",
        F.explode(shingles_of_tokens(F.col("toks"), k=k)).alias("s"),
    ).select("doc_id", F.xxhash64("s").alias("h")).distinct()
    return sh.groupBy("h").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("min_doc"),
    )


def neardup_flag_batch(
    batch_docs: DataFrame, index: DataFrame, k: int = 3, flag: float = 0.5
) -> DataFrame:
    """One (micro-)batch's likely-dup verdicts against a frozen corpus
    shingle index: per document, the fraction of its distinct k-gram
    hashes carried elsewhere in the indexed corpus (n-gram
    CONTAINMENT — one-sided Jaccard, the early-warning statistic an
    ingest gate wants: a verbatim copy scores 1.0 whatever its
    length). Self-matches are excluded via the index's (n_docs,
    min_doc), so a document already in the index is scored against
    the REST of the corpus, and containment is MONOTONE in the index:
    flags raised against the frozen first-run index are a subset of
    the nightly batch pass's flags on the grown corpus (pinned by
    test). New-vs-new duplicates (both sides arriving after the
    freeze) are invisible until that nightly pass re-freezes — the
    documented trade of incremental flagging.

    Plan: explode the batch's distinct shingle hashes (JVM codegen,
    8-byte rows), ONE hash equi-join against the static index (at
    scale: sort/bucket the index by h so the micro-batch side streams
    through it; the batch side is micro-batch-sized), one per-doc
    aggregate."""
    from clinvar_pipeline_spark.functions.hashes import (
        normalized_tokens,
        shingles_of_tokens,
    )

    sh = batch_docs.select(
        "doc_id", normalized_tokens(F.col("text")).alias("toks")
    ).select(
        "doc_id",
        F.explode(shingles_of_tokens(F.col("toks"), k=k)).alias("s"),
    ).select("doc_id", F.xxhash64("s").alias("h")).distinct()
    hit = sh.join(index, "h").filter(
        (F.col("n_docs") > 1) | (F.col("min_doc") != F.col("doc_id"))
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    hits = hit.groupBy("doc_id").agg(F.count(F.lit(1)).alias("_nm"))
    ratio = F.col("n_matched").cast("double") / F.col("n_shingles")
    return (
        sizes.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce(F.col("_nm"), F.lit(0)).cast("long").alias(
                "n_matched"
            ),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_matched",
            F.round(ratio, 4).alias("containment"),
            F.when(ratio >= flag, 1).otherwise(0).alias("flag_neardup"),
        )
    )


def neardup_stream(
    docs: DataFrame,
    index: DataFrame,
    out_path: str,
    checkpoint: str,
    k: int = 3,
    flag: float = 0.5,
    compact_every: int | None = None,
):
    """Start the incremental near-dup flagger over a streaming
    document frame: each micro-batch runs neardup_flag_batch against
    the frozen index inside ``foreachBatch`` (the join + per-doc
    aggregate are batch-only operations — a streaming aggregation
    would demand watermarks the file-drop source doesn't have) and
    lands verdicts under ``out_path`` keyed by epoch. availableNow +
    checkpoint = the same incremental-rerun contract as the other
    streamed stages; the index is run-scoped frozen state (the
    quality-model lifecycle), so reruns score new arrivals under
    exactly the state already-landed verdicts saw.

    Replay safety: a plain append inside foreachBatch would
    DOUBLE-land a replayed epoch (at-least-once delivery) — verdicts
    land in an epoch-keyed dir overwritten per epoch instead, the
    cm_stream idempotent-sink pattern. Readers go through
    :func:`neardup_snapshot` (one extra ``epoch`` column).

    ``compact_every``: whenever more than this many live epoch dirs
    have accumulated, fold all but the newest (which may replay) into
    a manifest-committed base (compaction.compact, row-union fold),
    bounding the reader's dir count for a long-lived ingest."""

    def _do(batch_df: DataFrame, epoch_id: int) -> None:
        neardup_flag_batch(batch_df, index, k=k, flag=flag).write.mode(
            "overwrite"
        ).parquet(f"{out_path}/epoch={int(epoch_id)}")
        if compact_every:
            from clinvar_pipeline_spark.streaming.compaction import (
                compact,
                list_live_epochs,
            )

            spark = batch_df.sparkSession
            if len(list_live_epochs(spark, out_path)) > compact_every:
                compact(spark, out_path, epoch_col="epoch")

    return (
        docs.writeStream.foreachBatch(_do)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def neardup_snapshot(spark, out_path: str) -> DataFrame:
    """All landed near-dup verdicts: committed base + live epoch dirs
    not folded into it, the landing epoch as an ``epoch`` column —
    the reader for a neardup_stream sink, exactly-once under replay
    and mid-compaction interruption (compaction.snapshot_parts)."""
    from clinvar_pipeline_spark.streaming.compaction import snapshot_parts

    return snapshot_parts(spark, out_path, epoch_col="epoch")


def hll_merge_batch(
    batch_docs: DataFrame, state_path: str
) -> DataFrame:
    """Merge one (micro-)batch's HLL register frame into the
    persistent register state at ``state_path`` and return the merged
    frame. The merge is groupBy(lang, reg).max(m) — commutative,
    associative, and IDEMPOTENT, so at-least-once micro-batch
    delivery (foreachBatch's contract) cannot corrupt the state:
    re-processing a batch re-maxes the same registers.

    The register state is bounded at |langs| x 256 rows regardless of
    corpus size (the sketch's point), so it is collected to break the
    read-then-overwrite cycle on ``state_path`` — a bounded, documented
    driver hop, same class as the quality model's weight table."""
    from clinvar_pipeline_spark.queries_llm import hll_register_frame

    spark = batch_docs.sparkSession
    fresh = hll_register_frame(batch_docs)
    if _artifact_exists(spark, state_path):
        fresh = (
            fresh.unionByName(spark.read.parquet(state_path))
            .groupBy("lang", "reg")
            .agg(F.max("m").alias("m"))
        )
    schema = fresh.schema
    rows = fresh.collect()  # bounded: |langs| x 256
    merged = spark.createDataFrame(rows, schema)
    merged.write.mode("overwrite").parquet(state_path)
    return spark.read.parquet(state_path)


def hll_stream(
    docs: DataFrame, state_path: str, out_path: str, checkpoint: str
):
    """Streaming distinct-token counting: each micro-batch max-merges
    its HLL register frame into the persistent state (hll_merge_batch)
    and overwrites ``out_path`` with the per-language estimate
    SNAPSHOT under the merged state — after an availableNow drain the
    snapshot equals the whole-corpus batch hll_distinct exactly
    (pinned by tests/test_streaming_corpus.py; the register-merge
    equality itself by tests/test_dsir.py). This is the mergeability
    dividend: a running distinct count over an ingest stream with
    bounded state and NO dedup shuffle, where the batch-exact answer
    would need the full distinct token set as streaming state.

    Unlike the append-mode stages the estimate is a snapshot (current
    corpus-wide value, not per-arrival verdicts), so the sink
    overwrites per batch."""
    from clinvar_pipeline_spark.queries_llm import hll_estimate

    def _do(batch_df: DataFrame, _epoch: int) -> None:
        merged = hll_merge_batch(batch_df, state_path)
        hll_estimate(merged).write.mode("overwrite").parquet(out_path)

    return (
        docs.writeStream.foreachBatch(_do)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def train_dsir_weights(batch_docs: DataFrame) -> tuple[dict, float]:
    """Batch-train the DSIR bucket table (queries_llm.
    dsir_feature_frame -> dsir_bucket_weights — same hashing,
    smoothing, and log-ratio closed form as the batch dsir_weights
    query) and collect it driver-side: <= DSIR_B (4096) rows at ANY
    corpus size — the fixed-feature-dim property is exactly what
    makes DSIR the servable importance model (the quality model's
    vocab grows with the corpus; this table never does). Returns
    (bucket -> llr, llr_unseen) where the unseen default is the
    smoothed ratio of a zero-count bucket, ln((rt+B)/(tt+B)) — only
    reachable by post-training arrivals whose features hash to a
    bucket no training doc touched."""
    import math

    from clinvar_pipeline_spark.queries_llm import (
        DSIR_B,
        dsir_bucket_weights,
        dsir_feature_frame,
    )

    rows = dsir_bucket_weights(dsir_feature_frame(batch_docs)).collect()
    tt = sum(r["tc"] for r in rows)
    rt = sum(r["rc"] for r in rows)
    unseen = math.log((rt + DSIR_B) / (tt + DSIR_B))
    return {r["b"]: r["llr"] for r in rows}, unseen


def dsir_stream(
    docs: DataFrame, weights: dict, llr_unseen: float
) -> DataFrame:
    """DSIR importance scoring on a (possibly streaming) frame: per
    raw document, the sum of its hashed unigram+bigram features'
    bucket log-likelihood ratios under the captured table — the
    serving half of the batch dsir_weights query (same tokenizer,
    same md5-prefix bucketing, same rounding; pinned equal by test).
    Map-only / append-safe: a document's weight is a pure function of
    its own row plus the broadcast-captured 4096-entry table.

    math.fsum keeps the served sum summation-order independent (the
    quality_stream discipline), so stream/batch equality does not
    hinge on round(.,4) absorbing association drift."""
    import hashlib
    import math

    from pyspark.sql.functions import pandas_udf

    from clinvar_pipeline_spark.functions.hashes import normalized_tokens
    from clinvar_pipeline_spark.queries_llm import DSIR_B

    @pandas_udf("double")
    def weight_sum(toks: pd.Series) -> pd.Series:
        def bucket(f: str) -> int:
            # first 15 md5 hex chars as int — hashes.hex64's value,
            # recomputed in Python (pinned by test_dsir equality)
            return int(
                hashlib.md5(f.encode("utf-8")).hexdigest()[:15], 16
            ) % DSIR_B

        out = []
        for arr in toks:
            feats = list(arr) + [
                f"{a} {b}" for a, b in zip(arr, arr[1:])
            ]
            out.append(
                math.fsum(
                    weights.get(bucket(f), llr_unseen) for f in feats
                )
            )
        return pd.Series(out, dtype="float64")

    base = docs.select(
        "doc_id", normalized_tokens(F.col("text")).alias("_toks")
    ).filter((F.size("_toks") > 0) & (F.col("doc_id") % 97 != 0))
    n = F.size("_toks")
    return base.select(
        "doc_id",
        (n + n - 1).cast("long").alias("n_feats"),
        F.round(weight_sum(F.col("_toks")), 4).alias("log_weight"),
    )


def save_dsir_model(
    spark: SparkSession, weights: dict, llr_unseen: float, path: str
) -> None:
    """Land the trained DSIR bucket table as a parquet run artifact
    (the quality-model lifecycle): one (b, llr) row per bucket plus a
    NULL-bucket row holding the unseen default. Frozen at first run —
    rescoring arrivals under a retrained table would break
    arrival-order independence."""
    rows = [(int(b), float(w)) for b, w in weights.items()]
    rows.append((None, float(llr_unseen)))
    spark.createDataFrame(rows, "b bigint, llr double").coalesce(
        1
    ).write.mode("overwrite").parquet(path)


def load_dsir_model(
    spark: SparkSession, path: str
) -> tuple[dict, float] | None:
    """Load a frozen DSIR bucket table; None only if never landed.
    Read failures on an existing artifact propagate (the
    load_quality_model contract)."""
    if not _artifact_exists(spark, path):
        return None
    rows = spark.read.parquet(path).collect()
    weights = {r["b"]: r["llr"] for r in rows if r["b"] is not None}
    unseen = next(r["llr"] for r in rows if r["b"] is None)
    return weights, unseen


def cm_delta_batch(
    batch_docs: DataFrame, epoch_id: int, deltas_path: str
) -> None:
    """Land one micro-batch's Count-Min sketch as an EPOCH-KEYED delta
    dir (``deltas_path/epoch=<id>``). Counter cells merge by
    ADDITION, so the HLL stages' max-merge idempotency argument does
    NOT apply here — re-adding a replayed batch would double-count.
    Replay safety instead comes from keying the landed delta by the
    foreachBatch epoch id: a replay of epoch N overwrites
    ``epoch=N`` with the identical frame (the file source re-serves
    the same files per epoch), so the snapshot sum is exactly-once
    under at-least-once delivery — the standard idempotent-sink
    pattern for non-idempotent merges."""
    from clinvar_pipeline_spark.queries_curation import cm_sketch_frame

    cm_sketch_frame(batch_docs).write.mode("overwrite").parquet(
        f"{deltas_path}/epoch={int(epoch_id)}"
    )


def _cm_fold(df: DataFrame) -> DataFrame:
    # counters are linear, so the fold is the cellwise sum — the
    # folded base stays <= depth x width rows at any stream age
    return df.groupBy("j", "b").agg(F.sum("c").alias("c"))


def cm_snapshot(spark, deltas_path: str) -> DataFrame:
    """Cellwise sum over all landed state — the corpus-wide sketch
    (counters are linear: sum of disjoint slices' sketches IS the
    union's sketch). Reads through compaction.snapshot_parts: the
    committed base generation (if compact() has run) plus every live
    epoch delta not folded into it, so the read stays bounded by the
    compaction cadence instead of growing linearly with stream age.
    Each part is <= depth x width cells."""
    from clinvar_pipeline_spark.streaming.compaction import snapshot_parts

    return _cm_fold(snapshot_parts(spark, deltas_path))


def cm_compact(spark, deltas_path: str, keep_last: int = 1) -> int:
    """Fold committed Count-Min epoch deltas into one base generation
    (compaction.compact with the cellwise-sum fold): the snapshot
    keeps its exactly-once algebra — the fold is linear, the base is
    manifest-committed, and a replayed epoch that was already folded
    is excluded by the consumed-set check — while the per-snapshot
    dir count drops from O(stream age) to O(keep_last)."""
    from clinvar_pipeline_spark.streaming.compaction import compact

    return compact(spark, deltas_path, keep_last=keep_last, fold=_cm_fold)


def cm_stream(
    docs: DataFrame,
    deltas_path: str,
    out_path: str,
    checkpoint: str,
    compact_every: int | None = None,
):
    """Streaming Count-Min token-frequency sketch: per micro-batch,
    land the epoch-keyed delta (cm_delta_batch) and overwrite
    ``out_path`` with the summed SNAPSHOT — after an availableNow
    drain the snapshot equals the whole-corpus batch cm_sketch_frame
    cell-for-cell (pinned by tests/test_streaming_corpus.py, replay
    included). Snapshot semantics like hll_stream: current
    corpus-wide cells, not per-arrival verdicts, so the sink
    overwrites per batch.

    ``compact_every``: whenever more than this many live epoch dirs
    have accumulated, fold all but the newest (which may replay) into
    the committed base (cm_compact), bounding snapshot cost for a
    long-lived ingest; None keeps the land-only behavior."""

    def _do(batch_df: DataFrame, epoch_id: int) -> None:
        from clinvar_pipeline_spark.streaming.compaction import (
            list_live_epochs,
        )

        spark = batch_df.sparkSession
        cm_delta_batch(batch_df, epoch_id, deltas_path)
        if compact_every and len(
            list_live_epochs(spark, deltas_path)
        ) > compact_every:
            cm_compact(spark, deltas_path)
        cm_snapshot(spark, deltas_path).write.mode(
            "overwrite"
        ).parquet(out_path)

    return (
        docs.writeStream.foreachBatch(_do)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------
# Streamed token counts -> Zipf fit + source-KL drift (ADD-merge sink)
# ---------------------------------------------------------------------


def token_count_stream(
    docs: DataFrame,
    deltas_path: str,
    checkpoint: str,
    compact_every: int | None = None,
):
    """Streaming (source, token) count sink: per micro-batch, the
    batch's tokenized counts land as an epoch-keyed ADD-merge delta
    (the cm_stream algebra on the raw count table instead of sketch
    cells). One sink serves BOTH corpus-health reports — the Zipf
    fit (zipf_snapshot sums out source) and the per-source KL drift
    screen (divergence_snapshot) — each equal to its batch registry
    query after a drain. Compaction fold is the re-sum, linear by
    associativity of +; deltas are vocab × sources bounded per
    epoch."""
    from clinvar_pipeline_spark.functions.hashes import normalized_tokens

    def _do(batch_df: DataFrame, epoch_id: int) -> None:
        (
            batch_df.select(
                "source",
                F.explode(normalized_tokens(F.col("text"))).alias("t"),
            )
            .groupBy("source", "t")
            .agg(F.count(F.lit(1)).alias("cst"))
            .write.mode("overwrite")
            .parquet(f"{deltas_path}/epoch={int(epoch_id)}")
        )
        if compact_every:
            from clinvar_pipeline_spark.streaming.compaction import (
                compact,
                list_live_epochs,
            )

            spark = batch_df.sparkSession
            if len(list_live_epochs(spark, deltas_path)) > compact_every:
                compact(
                    spark,
                    deltas_path,
                    fold=lambda df: df.groupBy("source", "t").agg(
                        F.sum("cst").alias("cst")
                    ),
                )

    return (
        docs.writeStream.foreachBatch(_do)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def token_counts_snapshot(spark: SparkSession, deltas_path: str) -> DataFrame:
    """The merged (source, t, cst) table under everything drained."""
    from clinvar_pipeline_spark.streaming.compaction import snapshot_parts

    parts = snapshot_parts(spark, deltas_path)
    if parts is None:
        return spark.createDataFrame(
            [], "source string, t string, cst long"
        )
    return parts.groupBy("source", "t").agg(F.sum("cst").alias("cst"))


def zipf_snapshot(spark: SparkSession, deltas_path: str) -> DataFrame:
    """Zipf fit under everything drained — equals batch q_zipf_fit."""
    from clinvar_pipeline_spark.queries_llm import zipf_fit_from_counts

    cnt = (
        token_counts_snapshot(spark, deltas_path)
        .groupBy("t")
        .agg(F.sum("cst").alias("c"))
    )
    return zipf_fit_from_counts(cnt)


def divergence_snapshot(spark: SparkSession, deltas_path: str) -> DataFrame:
    """Per-source KL drift under everything drained — equals batch
    q_source_divergence."""
    from clinvar_pipeline_spark.queries_llm import (
        source_divergence_from_counts,
    )

    return source_divergence_from_counts(
        token_counts_snapshot(spark, deltas_path)
    )


def lexical_snapshot(spark: SparkSession, deltas_path: str) -> DataFrame:
    """Per-source lexical diversity under everything drained — equals
    batch q_lexical_diversity. Third report off the ONE token-count
    sink: (source, token) counts are sufficient statistics for
    tokens/types/hapax, so no new stream, schema, or state."""
    from clinvar_pipeline_spark.queries_text import (
        lexical_diversity_from_counts,
    )

    return lexical_diversity_from_counts(
        token_counts_snapshot(spark, deltas_path).select(
            "source", F.col("t").alias("w"), F.col("cst").alias("c")
        )
    )


def entropy_snapshot(spark: SparkSession, deltas_path: str) -> DataFrame:
    """Per-source unigram entropy/perplexity under everything drained
    — equals batch q_token_entropy; fourth report off the one
    token-count sink."""
    from clinvar_pipeline_spark.queries_text import (
        token_entropy_from_counts,
    )

    return token_entropy_from_counts(
        token_counts_snapshot(spark, deltas_path).select(
            "source", F.col("t").alias("w"), F.col("cst").alias("c")
        )
    )
