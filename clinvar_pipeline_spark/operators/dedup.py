"""Deduplication operators for large-scale corpora.

Four tiers, cheapest-first (the standard 100 TB dedup funnel):
1. exact: hash-groupBy on a content fingerprint — one shuffle.
2. SimHash: 8-byte signature per doc; near-dups = small Hamming
   distance (bit-bucket join on rotated signatures for scale).
3. MinHash + LSH: banded signature buckets; candidate pairs come from
   an equi-join on (band, bucket) — never an all-pairs product; exact
   Jaccard verified on candidates only.
4. n-gram Jaccard (exact): inverted shingle index self-join — precise
   but hot-shingle skew; use as verification or small-corpus path.

JVM-side expressions where they win (fingerprints, pigeonhole chunks);
Arrow-batched numpy kernels for the hash-matrix work (MinHash, SimHash)
where interpreted higher-order expressions measured 10-1000x slower.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clinvar_pipeline_spark.caching import register_persist
from clinvar_pipeline_spark.functions.hashes import (
    jaccard,
    md5_fingerprint,
    minhash_band_buckets_batch,
    normalized_tokens,
    shingles_of_tokens,
    simhash64_batch,
)


def exact_duplicates(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Groups of byte-identical documents: (fingerprint, n_docs,
    keeper_id = min id). Shuffle carries only (fp, id)."""
    keyed = df.select(
        F.col(id_col).alias("id"), md5_fingerprint(F.col(text_col)).alias("fp")
    )
    return (
        keyed.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("id").alias("keeper_id"))
        .filter(F.col("n_docs") > 1)
    )


def dedup_exact(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Return df minus non-keeper exact duplicates (keeper = min id)."""
    keyed = df.withColumn("_fp", md5_fingerprint(F.col(text_col)))
    w_keep = (
        keyed.groupBy("_fp").agg(F.min(id_col).alias("_keeper"))
    )
    return (
        keyed.join(w_keep, on="_fp")
        .filter(F.col(id_col) == F.col("_keeper"))
        .drop("_fp", "_keeper")
    )


def minhash_lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    shingle_k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate pairs via MinHash + LSH banding, Jaccard-verified.

    Plan shape (scale-critical):
      docs → (id, shingles, band buckets)        map-only (one kernel)
           → posexplode `bands` bucket longs     map-only
           → self-join on (band, bucket)         shuffle on band hash
           → distinct candidate (a, b)           dedup across bands
           → join back shingle sets, verify      2 joins on id
    The only quadratic-ish step is within-bucket pairing; bucket sizes
    are bounded by LSH collision probability, and AQE splits skewed
    buckets. Returns (id_a, id_b, jaccard_sim) with id_a < id_b and
    verified sim ≥ threshold.
    """
    # two-step tokenize → shingle so the tokenizer is evaluated once
    # per row, not once per shingle (see shingles_of_tokens); MinHash
    # and LSH banding are fused in one Arrow kernel — the row carries
    # `bands` bucket longs, not the full signature, and no per-band
    # slice/concat expression chains run JVM-side
    sig = (
        df.select(
            F.col(id_col).alias("id"),
            normalized_tokens(F.col(text_col)).alias("toks"),
        )
        .select("id", shingles_of_tokens(F.col("toks"), shingle_k).alias("sh"))
        .withColumn(
            "bks",
            minhash_band_buckets_batch(num_hashes, bands, seed)(F.col("sh")),
        )
    )
    # the signature table feeds four plan branches (both sides of the
    # band self-join + the two jaccard-verify joins); without a persist
    # Spark recomputes tokenize->shingle->minhash once per branch
    # (released between repeated invocations via release_cached).
    # eager: the branches are INDEPENDENT stages submitted concurrently,
    # so a lazy cache still races — each sibling stage that starts
    # before the blocks exist recomputes the Arrow kernel (r11
    # stage_profile measurement; see register_persist docstring)
    sig = register_persist(sig, eager=True)
    # empty-shingle docs (shorter than shingle_k tokens) all map to the
    # SAME constant signature in the kernel, so without this filter
    # every such pair collides in every band — O(n^2) candidates among
    # empty docs at scale, shuffled before the verify can drop them.
    # They can never verify anyway (Jaccard over two empty sets is
    # null), so excluding them from banding changes nothing in the
    # output and keeps the candidate set linear.
    banded = sig.filter(F.size("sh") > 0).select(
        "id", F.posexplode("bks").alias("band", "bucket")
    )

    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    sh = sig.select("id", "sh")
    verified = (
        cand.join(sh.withColumnsRenamed({"id": "id_a", "sh": "sh_a"}), on="id_a")
        .join(sh.withColumnsRenamed({"id": "id_b", "sh": "sh_b"}), on="id_b")
        .withColumn("jaccard_sim", F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 4))
        .filter(F.col("jaccard_sim") >= threshold)
        .select("id_a", "id_b", "jaccard_sim")
    )
    return verified


def simhash_signatures(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, simhash) — 8 bytes per document regardless of length.

    Arrow-batched kernel (functions.hashes.simhash64_batch): one
    vectorized pass per batch, map-only, no shuffle. Two earlier
    formulations are kept for the record: the higher-order-function
    scalar `simhash64` (interpreted; catastrophic re-evaluation under
    project collapse, ~30x slower) and an explode -> groupBy with 63
    vote-sum aggregates (codegen-safe but its 64-wide aggregate takes
    seconds to compile and shuffles one 64-long row per doc). The
    kernel beats both and scales linearly with corpus bytes."""
    return df.select(
        F.col(id_col).alias("id"),
        simhash64_batch()(F.col(text_col)).alias("simhash"),
    )


def simhash_neardup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    max_hamming: int = 8,
    blocks: int = 4,
) -> DataFrame:
    """SimHash near-dup pairs via the pigeonhole block trick: split the
    64-bit signature into ``blocks`` chunks; any pair within Hamming
    distance < blocks must agree on ≥1 chunk → candidates come from an
    equi-join on (block_idx, chunk_value), then exact Hamming verify.
    """
    sigs = simhash_signatures(df, id_col, text_col)
    width = 64 // blocks
    chunks = sigs.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftright(F.col("simhash"), i * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("val"),
                    )
                    for i in range(blocks)
                ]
            )
        ).alias("c"),
    ).select("id", "simhash", F.col("c.blk").alias("blk"), F.col("c.val").alias("val"))
    a, b = chunks.alias("a"), chunks.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            ham.alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
