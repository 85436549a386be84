#!/usr/bin/env python
"""Observability for the documented skew caps (no silent truncation).

The pair-generation queries guard against quadratic hot keys by
excluding them from their candidate joins:
  - ngram_jaccard_pairs drops shingles with document frequency
    > SHINGLE_DF_CAP ('stop-shingles');
  - embedding_neardup_pairs drops label blocks larger than BLOCK_CAP.

Counting those drops inline forced an extra eager job per query run
(round-2 bench: +93% / +22% cold), so the query paths stay lazy and
this tool reports the same counts on demand.

Usage: python tools/skew_report.py [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    import clinvar_pipeline_spark.queries as q
    from clinvar_pipeline_spark.functions.hashes import (
        normalized_tokens,
        shingles_of_tokens,
    )
    from clinvar_pipeline_spark.session import get_spark

    spark = get_spark()

    d = q._t(spark, args.sf, "documents")
    sh = d.select(
        "doc_id",
        F.explode(
            shingles_of_tokens(normalized_tokens(F.col("text")), k=3)
        ).alias("sh_str"),
    ).select("doc_id", F.xxhash64("sh_str").alias("shingle"))
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    hot = dfreq.filter(F.col("df") > q.SHINGLE_DF_CAP)
    n_hot, n_total = hot.count(), dfreq.count()
    print(
        f"ngram_jaccard_pairs: {n_hot}/{n_total} shingles over "
        f"SHINGLE_DF_CAP={q.SHINGLE_DF_CAP} dropped from the candidate join"
    )

    e = q._t(spark, args.sf, "embeddings")
    blocks = e.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    over = blocks.filter(F.col("n") > q.BLOCK_CAP)
    n_over, n_blocks = over.count(), blocks.count()
    print(
        f"embedding_neardup_pairs: {n_over}/{n_blocks} label blocks over "
        f"BLOCK_CAP={q.BLOCK_CAP} dropped from the pair join"
    )


if __name__ == "__main__":
    main()
