"""Incremental near-dup CLUSTER maintenance — the streaming completion
of the dedup story (r8 verdict stretch #8): neardup_stream flags
arrivals against a frozen index, but cluster LABELS (dedup_clusters)
recomputed per corpus. This module merges each micro-batch's new
near-dup edges into a persisted labeling, re-running connected
components ONLY over the affected edge closure.

The incremental-merge identity that makes this correct: a labeling
L = CC(E) compressed to star edges {(node, component)} preserves the
components of E, and new edges can only MERGE components (never
split), so

    CC(star(L) ∪ E_new) == CC(E ∪ E_new)

component-for-component — with identical min-id labels, since the node
set is unchanged. Components untouched by any new edge keep their old
labels verbatim; only the closure of components incident to a new edge
(typically a vanishing fraction of the corpus) enters the per-batch CC
(operators/graph.connected_components, the same large-star/small-star
machinery as the batch query).

State under ``out_path`` (all epoch-keyed, replay-safe):
- ``shingles/epoch=E``: the batch's distinct (doc_id, shingle-hash)
  rows; ``sizes/epoch=E``: per-doc distinct shingle counts. Row-union
  folds — compaction.compact-compatible (linear), bounding dir counts
  for a long-lived ingest.
- ``labels/epoch=E``: the FULL labeling after epoch E (mode=overwrite
  → idempotent under replay; Spark's _SUCCESS marker is the commit
  bit, so a crash mid-write leaves no half-readable newest epoch).
  Older label epochs are pruned best-effort once a newer one commits.

Replay safety without a manifest: label updates are IDEMPOTENT MERGES
— replaying epoch E against a labeling that already absorbed E's edges
is a no-op (the edges are already intra-component), so any committed
label epoch, including E itself, is a valid merge base.

Pair semantics mirror queries.q_ngram_jaccard_pairs (3-shingles,
xxhash64 keys, Jaccard >= 0.10, SHINGLE_DF_CAP stop-shingles) with one
documented drift: the df cap is evaluated against the corpus AS OF the
batch (the store including the batch), not the final corpus — a
shingle can only GAIN documents later, so the incremental pass may
keep an edge the end-state batch pass would cap away; it never misses
one the batch pass would keep at the same corpus state.

Re-ingestion contract (ADVICE r9): a doc_id delivered again in a later
epoch is safe — shingle df aggregates countDistinct(doc_id) (duplicate
(doc, shingle) rows across epochs can't inflate the stop-shingle cap)
and per-doc sizes resolve to the LATEST landed epoch (no duplicate or
stale-n Jaccard evaluations). Identical-text redelivery is therefore
fully idempotent. Changed-text re-ingest gets documented UNION
semantics: the shingle store is append-only, so a re-ingested doc
matches on the union of its versions' shingles while |set| uses the
newest version's count — labels can only over-merge, never split,
which is the conservative direction for dedup."""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

JACCARD_THRESHOLD = 0.10
SHINGLE_K = 3

LABELS_SCHEMA = "node long, component long"


def _batch_shingles(docs: DataFrame) -> DataFrame:
    """(doc_id, shingle): distinct 3-shingle xxhash64 keys — the exact
    key pipeline of q_ngram_jaccard_pairs (long keys in the exchange,
    never strings)."""
    from clinvar_pipeline_spark.functions.hashes import (
        normalized_tokens,
        shingles_of_tokens,
    )

    return (
        docs.select("doc_id", normalized_tokens(F.col("text")).alias("toks"))
        .select(
            "doc_id",
            F.explode(
                shingles_of_tokens(F.col("toks"), k=SHINGLE_K)
            ).alias("sh_str"),
        )
        .select("doc_id", F.xxhash64("sh_str").alias("shingle"))
        .distinct()
    )


def _labels_path(out_path: str, epoch: int) -> str:
    return f"{out_path}/labels/epoch={int(epoch)}"


def _committed_label_epochs(spark: SparkSession, out_path: str) -> list[int]:
    """Label epochs whose parquet commit marker (_SUCCESS) landed —
    the half-written newest dir after a crash is invisible."""
    from clinvar_pipeline_spark.streaming.compaction import (
        _exists,
        _ls_names,
    )

    root = f"{out_path}/labels"
    if not _exists(spark, root):
        return []
    out = []
    for name in _ls_names(spark, root):
        if name.startswith("epoch="):
            e = int(name.split("=", 1)[1])
            if _exists(spark, f"{root}/{name}/_SUCCESS"):
                out.append(e)
    return sorted(out)


def cluster_labels_snapshot(
    spark: SparkSession, out_path: str
) -> Optional[DataFrame]:
    """(node, component) — the newest COMMITTED labeling, or None
    before the first batch lands. Same contract as dedup_clusters:
    documents in no near-dup pair are absent."""
    epochs = _committed_label_epochs(spark, out_path)
    if not epochs:
        return None
    return spark.read.parquet(_labels_path(out_path, epochs[-1]))


def merge_batch_into_labels(
    spark: SparkSession,
    batch_docs: DataFrame,
    out_path: str,
    epoch_id: int,
    jaccard: float = JACCARD_THRESHOLD,
    df_cap: Optional[int] = None,
    compact_every: Optional[int] = None,
    keep_label_epochs: int = 2,
) -> None:
    """One batch's full maintenance step — shingle/size state landing,
    new-edge discovery against the grown store, affected-closure CC,
    label commit, state compaction. foreachBatch calls this; it is
    equally the nightly-batch entry point for a non-streaming caller."""
    from clinvar_pipeline_spark.operators.graph import connected_components
    from clinvar_pipeline_spark.queries import SHINGLE_DF_CAP
    from clinvar_pipeline_spark.streaming.compaction import (
        _delete,
        compact,
        list_live_epochs,
        snapshot_parts,
    )

    if df_cap is None:
        df_cap = SHINGLE_DF_CAP
    if keep_label_epochs < 1:
        # 0 would delete the labeling this very call just committed
        # (and the old negative-slice idiom silently pruned NOTHING)
        raise ValueError("merge_batch_into_labels: keep_label_epochs >= 1")
    e = int(epoch_id)
    sh_new = _batch_shingles(batch_docs)
    sh_new.write.mode("overwrite").parquet(
        f"{out_path}/shingles/epoch={e}"
    )
    # sizes from the LANDED rows (one lineage, no kernel re-run)
    landed = spark.read.parquet(f"{out_path}/shingles/epoch={e}")
    landed.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n")
    ).write.mode("overwrite").parquet(f"{out_path}/sizes/epoch={e}")

    store = snapshot_parts(spark, f"{out_path}/shingles")
    # latest landed epoch wins per doc: a re-ingested doc_id must not
    # contribute duplicate/stale-n size rows to the Jaccard join
    allsizes = (
        snapshot_parts(spark, f"{out_path}/sizes", epoch_col="_ep")
        .groupBy("doc_id")
        .agg(F.max_by("n", "_ep").alias("n"))
    )
    # candidate slice: only store rows sharing a shingle with the
    # batch can form a NEW edge; df cap evaluated on that slice.
    # countDistinct, not count: duplicate (doc, shingle) rows from a
    # re-ingested doc must not inflate df past the cap
    cand = store.join(landed.select("shingle").distinct(), "shingle")
    hot = (
        cand.groupBy("shingle")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") > df_cap)
        .select("shingle")
    )
    a = landed.join(F.broadcast(hot), "shingle", "left_anti").alias("a")
    b = cand.join(F.broadcast(hot), "shingle", "left_anti").alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .groupBy(
            F.least(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_a"),
            F.greatest(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_b"),
        )
        # batch-batch pairs surface from both (a,b) orientations —
        # distinct shingles, not row counts
        .agg(F.countDistinct("a.shingle").alias("i"))
    )
    sa = allsizes.alias("sa")
    sb = allsizes.alias("sb")
    jac = F.col("i").cast("double") / (
        F.col("sa.n") + F.col("sb.n") - F.col("i")
    )
    new_edges = (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .filter(jac >= jaccard)
        .select("doc_a", "doc_b")
    ).localCheckpoint()  # consumed by >=3 branches below

    old = cluster_labels_snapshot(spark, out_path)
    if new_edges.rdd.isEmpty():
        lab = (
            old
            if old is not None
            else spark.createDataFrame([], LABELS_SCHEMA)
        )
    elif old is None:
        lab = connected_components(new_edges, "doc_a", "doc_b")
    else:
        ends = (
            new_edges.select(F.col("doc_a").alias("node"))
            .unionByName(new_edges.select(F.col("doc_b").alias("node")))
            .distinct()
        )
        affected = (
            old.join(ends, "node").select("component").distinct()
        )
        # star edges of the touched components ∪ the new edges
        touched = old.join(F.broadcast(affected), "component")
        cc_in = new_edges.unionByName(
            touched.select(
                F.col("node").alias("doc_a"),
                F.col("component").alias("doc_b"),
            )
        )
        merged = connected_components(cc_in, "doc_a", "doc_b")
        untouched = old.join(F.broadcast(affected), "component", "left_anti")
        lab = untouched.select("node", "component").unionByName(
            merged.select("node", "component")
        )
    # materialize BEFORE the write: under replay the merge base IS
    # labels/epoch=e, and an overwrite of a lazily-read input deletes
    # the files mid-plan (FAILED_READ_FILE). Eager localCheckpoint
    # also cuts the CC loop's lineage out of the sink write.
    lab = lab.localCheckpoint()
    lab.write.mode("overwrite").parquet(_labels_path(out_path, e))
    # prune superseded committed labelings (best-effort; any one of
    # them is a valid merge base, so keeping the last few is purely
    # an operational courtesy for out-of-band readers)
    done = _committed_label_epochs(spark, out_path)
    for stale in done[: len(done) - keep_label_epochs]:
        _delete(spark, _labels_path(out_path, stale))
    if compact_every:
        # shingles fold = distinct (linear; prunes re-ingest row dups);
        # sizes fold = latest-epoch row per doc, keeping _ep so the
        # base still participates in snapshot-time max_by resolution
        def _sizes_fold(d: DataFrame) -> DataFrame:
            return (
                d.groupBy("doc_id")
                .agg(F.max(F.struct("_ep", "n")).alias("w"))
                .select("doc_id", F.col("w.n").alias("n"),
                        F.col("w._ep").alias("_ep"))
            )

        for sink, ecol, fold in (
            ("shingles", None, lambda d: d.distinct()),
            ("sizes", "_ep", _sizes_fold),
        ):
            if len(list_live_epochs(spark, f"{out_path}/{sink}")) > compact_every:
                compact(spark, f"{out_path}/{sink}", epoch_col=ecol, fold=fold)


def cluster_stream(
    docs: DataFrame,
    out_path: str,
    checkpoint: str,
    jaccard: float = JACCARD_THRESHOLD,
    df_cap: Optional[int] = None,
    compact_every: Optional[int] = None,
):
    """Start the incremental cluster maintainer over a streaming
    document frame: each micro-batch lands its shingle/size state,
    discovers new near-dup edges against the grown store, and merges
    them into the persisted labeling (affected-closure CC only) inside
    ``foreachBatch``. availableNow + checkpoint = the same
    incremental-rerun contract as the other streamed stages; read
    labels via :func:`cluster_labels_snapshot`."""

    def _do(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.rdd.isEmpty():
            return
        merge_batch_into_labels(
            batch_df.sparkSession, batch_df, out_path, epoch_id,
            jaccard=jaccard, df_cap=df_cap, compact_every=compact_every,
        )

    return (
        docs.writeStream.foreachBatch(_do)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
