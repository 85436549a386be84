"""Similarity search over embedding columns.

Brute-force cosine top-k (the exact baseline; queries.q_topk_cosine has
the oracle-checked formulation) plus the scale path: hyperplane-LSH
bucketed ANN — candidates come from an equi-join on bucket ids, never a
cross product. Multi-probe widens recall by also probing buckets at
Hamming distance 1 from the query's bucket.

Scale: the bucket join shuffles both sides once on (bucket); with P
planes the expected candidate set shrinks ~2^P-fold. Skewed buckets
(dense regions) are the known cost — AQE skew-join or a second-level
salt handles them; recall/cost tunes with (num_planes, n_probes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from clinvar_pipeline_spark.functions.hashes import (
    cosine_similarity,
    random_hyperplane_buckets,
)


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k neighbors of every query over the full corpus
    (cross join + window). O(|Q|*|C|) — the correctness baseline and
    the right choice when |Q| is small and the corpus is broadcast."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(F.col(id_col).alias("nn_id"), F.col(vec_col).alias("cv"))
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("nn_id"))
        .select(
            "query_id",
            "nn_id",
            F.round(cosine_similarity(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("nn_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "nn_id", "cos_sim", "rk")
    )


def ann_topk_hyperplane(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    num_planes: int = 8,
    n_probes: int = 3,
    seed: int = 42,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: sign-LSH bucket join + exact re-rank inside
    candidate buckets. ``n_probes`` > 1 additionally probes the buckets
    whose id differs in one bit (multi-probe LSH), trading shuffle
    volume for recall."""
    def bucketed(df: DataFrame, role: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(f"{role}_id"),
            F.col(vec_col).alias(f"{role}_v"),
            random_hyperplane_buckets(
                F.col(vec_col), num_planes=num_planes, seed=seed, dim=dim
            ).alias("bucket"),
        )

    c = bucketed(corpus, "nn")
    q = bucketed(queries, "query")
    if n_probes > 1:
        # probe own bucket + (n_probes-1) single-bit flips
        flips = F.array(
            F.col("bucket"),
            *[
                F.col("bucket").bitwiseXOR(F.lit(1 << b))
                for b in range(min(n_probes - 1, num_planes))
            ],
        )
        q = q.select(
            "query_id", "query_v", F.explode(flips).alias("bucket")
        )
    cand = q.join(c, "bucket").filter(F.col("query_id") != F.col("nn_id"))
    scored = cand.select(
        "query_id",
        "nn_id",
        F.round(
            cosine_similarity(F.col("query_v"), F.col("nn_v")), 6
        ).alias("cos_sim"),
    ).dropDuplicates(["query_id", "nn_id"])
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("nn_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "nn_id", "cos_sim", "rk")
    )
