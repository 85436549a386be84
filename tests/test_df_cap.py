"""Skew guards for the exact pair-generation queries: shingles/blocks
above the document-frequency cap must be excluded from the candidate
join (quadratic-in-bucket work otherwise), while genuinely similar
pairs sharing rare keys still surface."""

import pytest
from pyspark.sql import functions as F

import clinvar_pipeline_spark.queries as q


@pytest.fixture()
def doc_dir(spark, tmp_path):
    # "common one two" appears in 5 docs (hot); d6/d7 share rare
    # shingles and are near-identical
    rows = [
        (1, "common one two alpha beta gamma"),
        (2, "common one two delta epsilon zeta"),
        (3, "common one two eta theta iota"),
        (4, "common one two kappa lab mu"),
        (5, "common one two nu xi omicron"),
        (6, "quick brown fox jumps over dog"),
        (7, "quick brown fox jumps over cat"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_hot_shingle_dropped_rare_pairs_survive(spark, doc_dir, monkeypatch):
    monkeypatch.setattr(q, "SHINGLE_DF_CAP", 2)
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in q.q_ngram_jaccard_pairs(spark, doc_dir).collect()
    }
    # docs 1-5 only share the hot shingle -> no pair may come from it
    assert not any(a <= 5 and b <= 5 for a, b in pairs), pairs
    # 6/7 share 3 of 4+4 shingles through rare keys -> pair survives
    assert (6, 7) in pairs


def test_uncapped_hot_shingle_pairs_present(spark, doc_dir, monkeypatch):
    monkeypatch.setattr(q, "SHINGLE_DF_CAP", 1000)
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in q.q_ngram_jaccard_pairs(spark, doc_dir).collect()
    }
    # sanity: with the cap not binding, the hot-shingle pairs exist
    assert (1, 2) in pairs and (6, 7) in pairs


def test_oversize_block_dropped(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(q, "BLOCK_CAP", 3)
    rows = [
        # block 'big': 5 members (over cap) of identical vectors
        *[(i, "big", [1.0, 0.0]) for i in range(1, 6)],
        # block 'ok': 2 identical vectors -> one pair
        (10, "ok", [0.0, 1.0]),
        (11, "ok", [0.0, 1.0]),
    ]
    spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<double>"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    pairs = {
        (r["vec_a"], r["vec_b"])
        for r in q.q_embedding_neardup_pairs(spark, str(tmp_path)).collect()
    }
    assert pairs == {(10, 11)}
