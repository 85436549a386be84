"""MinHash+LSH verified pairs must equal the exact Jaccard pair set at
the verify threshold — the property that makes minhash_lsh_pairs
oracle-checkable (LSH generates candidates; banding is parameterized so
a qualifying pair's miss probability is negligible, see
queries.q_minhash_lsh_pairs)."""

from pyspark.sql import functions as F

from clinvar_pipeline_spark.functions.hashes import (
    jaccard,
    normalized_tokens,
    shingles_of_tokens,
)
from clinvar_pipeline_spark.operators.dedup import minhash_lsh_candidate_pairs

THRESHOLD = 0.5


def _exact_pairs(docs):
    """Brute-force all-pairs exact Jaccard (fine at sf0.001 size)."""
    sh = docs.select(
        F.col("doc_id").alias("id"),
        normalized_tokens(F.col("text")).alias("toks"),
    ).select("id", shingles_of_tokens(F.col("toks"), 3).alias("sh"))
    a = sh.withColumnsRenamed({"id": "id_a", "sh": "sh_a"})
    b = sh.withColumnsRenamed({"id": "id_b", "sh": "sh_b"})
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("j", F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 4))
        .filter(F.col("j") >= THRESHOLD)
        .select("id_a", "id_b", "j")
    )


def test_lsh_pairs_invariant_under_partitioning(spark):
    # band buckets come from an Arrow kernel; at scale different
    # executors hash different partitions, so the kernel must be a
    # pure function of the row — the pair set cannot depend on how
    # the input was split
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    outs = []
    for parts in (1, 7):
        got = minhash_lsh_candidate_pairs(
            docs.repartition(parts),
            id_col="doc_id",
            text_col="text",
            num_hashes=207,
            bands=69,
            threshold=THRESHOLD,
        )
        outs.append({tuple(r) for r in got.collect()})
    assert outs[0] == outs[1] and outs[0]


def test_short_and_empty_docs_do_not_crash_or_pair(spark):
    # docs with fewer than k tokens used to crash the stage:
    # sequence(1, n-k+1) descends for n < k and slice(toks, 0, k)
    # raises INVALID_PARAMETER_VALUE. They must instead shingle to an
    # empty set (matching the DuckDB oracle's empty range) and NEVER
    # emit candidate pairs — empty signatures are constant, so without
    # the pre-band filter every short-doc pair collides in all bands.
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta iota"),
        (3, "two tokens"),
        (4, "one"),
        (5, ""),
        (6, None),
        (7, "   "),
        (8, "two tokens"),  # exact dup of 3, still shingle-less
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string")

    sh = docs.select(
        "doc_id",
        shingles_of_tokens(normalized_tokens(F.col("text")), 3).alias("sh"),
    ).collect()
    by_id = {r["doc_id"]: r["sh"] for r in sh}
    assert len(by_id[1]) > 0 and len(by_id[2]) > 0
    for short_id in (3, 4, 5, 6, 7, 8):
        assert by_id[short_id] == [], short_id

    got = minhash_lsh_candidate_pairs(
        docs, id_col="doc_id", text_col="text",
        num_hashes=64, bands=32, threshold=THRESHOLD,
    )
    pairs = {(r["id_a"], r["id_b"]) for r in got.collect()}
    assert pairs == {(1, 2)}  # the real near-dup; no short-doc pairs


def test_lsh_verified_equals_exact_pair_set(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = minhash_lsh_candidate_pairs(
        docs,
        id_col="doc_id",
        text_col="text",
        num_hashes=64,
        bands=32,
        threshold=THRESHOLD,
    )
    got_set = {(r["id_a"], r["id_b"], r["jaccard_sim"]) for r in got.collect()}
    want_set = {(r["id_a"], r["id_b"], r["j"]) for r in _exact_pairs(docs).collect()}
    assert got_set == want_set
    assert len(want_set) > 0  # the fixture plants near-duplicates
