"""Incremental near-dup cluster maintenance (streaming/clusters.py):
the two-batch drain pins that merging each batch's new edges into the
persisted labeling (affected-closure CC only) lands the SAME labels as
a batch connected-components run over the full pair set — including
the planted cross-batch chain A~B~C where A and C never pair directly
— and that a replayed batch is a no-op (idempotent merge)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clinvar_pipeline_spark.streaming.clusters import (
    cluster_labels_snapshot,
    cluster_stream,
    merge_batch_into_labels,
)
from clinvar_pipeline_spark.streaming.corpus import (
    DOCUMENT_SCHEMA,
    read_document_stream,
)

# 3-shingle design: A∩B and B∩C share the 4 shingles of their common
# half (Jaccard 0.4 each); A∩C share none. D/E are verbatim dups.
_A = "a1 a2 a3 a4 a5 a6"
_B = "a1 a2 a3 a4 a5 a6 c1 c2 c3 c4 c5 c6"
_C = "c1 c2 c3 c4 c5 c6"
_D = "d1 d2 d3 d4 d5"

BATCH1 = [
    (1, _A, "en", "s", len(_A)),
    (2, _B, "en", "s", len(_B)),
    (4, _D, "en", "s", len(_D)),
    (9, "u1 u2 u3 u4 u5 u6 unique", "en", "s", 25),
]
BATCH2 = [
    (3, _C, "en", "s", len(_C)),      # chains to A through B only
    (5, _D, "en", "s", len(_D)),      # cross-batch merge with 4
    (10, "v1 v2 v3 v4 v5 v6 lonely", "en", "s", 25),
]

EXPECTED = {1: 1, 2: 1, 3: 1, 4: 4, 5: 4}


def _labels(spark, out):
    snap = cluster_labels_snapshot(spark, str(out))
    assert snap is not None
    return {r["node"]: r["component"] for r in snap.collect()}


def test_two_batch_drain_equals_batch_cc(spark, tmp_path):
    drop = tmp_path / "docs"
    out = tmp_path / "clusters"
    ckpt = tmp_path / "ckpt"

    spark.createDataFrame(BATCH1, DOCUMENT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(drop))
    q = cluster_stream(
        read_document_stream(spark, str(drop)), str(out), str(ckpt)
    )
    q.awaitTermination(120)
    # after batch 1: A~B clustered, D alone has no pair yet
    assert _labels(spark, out) == {1: 1, 2: 1}

    spark.createDataFrame(BATCH2, DOCUMENT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(drop))
    q = cluster_stream(
        read_document_stream(spark, str(drop)), str(out), str(ckpt)
    )
    q.awaitTermination(120)
    got = _labels(spark, out)
    assert got == EXPECTED, got

    # batch twin: CC over the full pair set computed in one pass
    from clinvar_pipeline_spark.operators.graph import connected_components
    from clinvar_pipeline_spark.streaming.clusters import _batch_shingles

    all_docs = spark.createDataFrame(BATCH1 + BATCH2, DOCUMENT_SCHEMA)
    sh = _batch_shingles(all_docs)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("i"))
    )
    jac = F.col("i").cast("double") / (
        F.col("sa.n") + F.col("sb.n") - F.col("i")
    )
    pairs = (
        inter.join(sizes.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sizes.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .filter(jac >= 0.10)
        .select("doc_a", "doc_b")
    )
    batch_cc = {
        r["node"]: r["component"]
        for r in connected_components(pairs, "doc_a", "doc_b").collect()
    }
    assert got == batch_cc


def test_replayed_batch_is_a_noop(spark, tmp_path):
    out = tmp_path / "clusters"
    b1 = spark.createDataFrame(BATCH1, DOCUMENT_SCHEMA)
    b2 = spark.createDataFrame(BATCH2, DOCUMENT_SCHEMA)
    merge_batch_into_labels(spark, b1, str(out), 0)
    merge_batch_into_labels(spark, b2, str(out), 1)
    assert _labels(spark, out) == EXPECTED
    # replay epoch 1 (at-least-once delivery): same inputs, same dirs,
    # merge base already contains the edges -> labels unchanged
    merge_batch_into_labels(spark, b2, str(out), 1)
    assert _labels(spark, out) == EXPECTED


def test_label_epoch_pruning_keeps_a_committed_base(spark, tmp_path):
    out = tmp_path / "clusters"
    for e, rows in enumerate([BATCH1, BATCH2, BATCH2]):
        merge_batch_into_labels(
            spark, spark.createDataFrame(rows, DOCUMENT_SCHEMA),
            str(out), e, keep_label_epochs=1,
        )
    from clinvar_pipeline_spark.streaming.clusters import (
        _committed_label_epochs,
    )

    assert _committed_label_epochs(spark, str(out)) == [2]
    assert _labels(spark, out) == EXPECTED


def test_keep_label_epochs_zero_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="keep_label_epochs"):
        merge_batch_into_labels(
            spark, spark.createDataFrame(BATCH1, DOCUMENT_SCHEMA),
            str(tmp_path / "c"), 0, keep_label_epochs=0,
        )


def test_reingested_doc_is_idempotent_and_df_cap_uninflated(spark, tmp_path):
    """ADVICE r9: a doc_id redelivered in a LATER epoch (identical
    text — at-least-once delivery across epoch boundaries) must not
    duplicate size rows (stale-n Jaccard) nor double-count shingle df
    toward the stop-shingle cap. Labels after the redelivery epoch ==
    labels without it; a cap sized so that double-counting WOULD trip
    it (df_cap=3, A/B/C + redelivered B = 4 raw rows on the shared
    shingles but only 3 distinct docs) still finds the chain."""
    out = tmp_path / "clusters"
    merge_batch_into_labels(
        spark, spark.createDataFrame(BATCH1, DOCUMENT_SCHEMA),
        str(out), 0, df_cap=3,
    )
    merge_batch_into_labels(
        spark, spark.createDataFrame(BATCH2, DOCUMENT_SCHEMA),
        str(out), 1, df_cap=3,
    )
    # epoch 2 redelivers doc 2 (B) verbatim: with raw-row df the shared
    # a*/c* shingles would hit df=4 > cap and the A~B~C edges would be
    # capped away on any later evaluation; with countDistinct they stay
    redelivery = [r for r in BATCH1 if r[0] == 2]
    merge_batch_into_labels(
        spark, spark.createDataFrame(redelivery, DOCUMENT_SCHEMA),
        str(out), 2, df_cap=3,
    )
    assert _labels(spark, out) == EXPECTED


def test_compaction_folds_preserve_labels_and_reingest_safety(spark, tmp_path):
    """The r10 compaction folds (shingles -> distinct, sizes ->
    latest-epoch row per doc keeping _ep) must leave the maintained
    labels identical to the uncompacted run — including across a
    verbatim re-ingest whose duplicate rows the folds prune. Four
    epochs with compact_every=2 force at least one fold of each sink;
    a fifth epoch after compaction proves the folded base still
    participates in df/size resolution."""
    out = tmp_path / "clusters"
    epochs = [
        BATCH1,
        BATCH2,
        [r for r in BATCH1 if r[0] == 2],  # verbatim redelivery of B
        [(20, "w1 w2 w3 w4 w5 w6 fresh", "en", "s", 25)],
    ]
    for e, rows in enumerate(epochs):
        merge_batch_into_labels(
            spark, spark.createDataFrame(rows, DOCUMENT_SCHEMA),
            str(out), e, compact_every=2,
        )
    # a sink got folded: fewer live epoch dirs than epochs landed
    from clinvar_pipeline_spark.streaming.compaction import (
        list_live_epochs,
    )

    assert len(list_live_epochs(spark, str(out / "shingles"))) < len(epochs)
    assert _labels(spark, out) == EXPECTED
    # post-compaction epoch: the new near-dup of A must still chain in
    # through the FOLDED store (A's shingles now live in the base)
    a_dup = [(21, _A, "en", "s", len(_A))]
    merge_batch_into_labels(
        spark, spark.createDataFrame(a_dup, DOCUMENT_SCHEMA),
        str(out), len(epochs), compact_every=2,
    )
    got = _labels(spark, out)
    assert got == {**EXPECTED, 21: 1}, got
