#!/usr/bin/env python
"""Interleaved same-session A/B: r10 two-pass tokenizer vs the r11
one-pass tokenizer, timed on the queries VERDICT r11 flagged
(ngram_jaccard_pairs cold −22% at the driver). Alternates A/B per
round inside ONE session so tier noise hits both arms equally.

Usage: python tools/ab_tokenizer.py [--rounds 5] [name ...]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens_r10(col) -> Column:
    """The pre-r11 spelling: replace + trim + split (two regex passes)."""
    c = F.col(col) if isinstance(col, str) else col
    cleaned = F.trim(F.regexp_replace(F.lower(c), "[^a-z0-9\\s]", " "))
    return F.array_remove(F.split(cleaned, "\\s+"), "")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("names", nargs="*",
                    default=["ngram_jaccard_pairs", "shingle_containment"])
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import clinvar_pipeline_spark.functions.hashes as hashes
    from clinvar_pipeline_spark import queries as q
    from clinvar_pipeline_spark.session import get_spark

    import clinvar_pipeline_spark.operators.dedup as dedup
    import clinvar_pipeline_spark.queries_curation as qc
    import clinvar_pipeline_spark.queries_llm as qllm
    import clinvar_pipeline_spark.queries_text as qtext

    new_fn = hashes.normalized_tokens
    # consumers bind the name at import time — patch every reference
    patch_sites = [hashes, q, qllm, qtext, qc, dedup]

    spark = get_spark(app_name="ab-tokenizer")
    spark.sparkContext.setLogLevel("ERROR")
    registry = q.queries()
    spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100).write.format(
        "noop").mode("overwrite").save()

    out: dict[str, dict[str, list[float]]] = {
        n: {"r10_twopass": [], "r11_onepass": []} for n in args.names
    }
    for rnd in range(args.rounds):
        for arm, fn in (("r10_twopass", tokens_r10), ("r11_onepass", new_fn)):
            for site in patch_sites:
                site.normalized_tokens = fn
            for name in args.names:
                t0 = time.time()
                registry[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite").save()
                out[name][arm].append(round(time.time() - t0, 3))
                q.release_cached()
    for site in patch_sites:
        site.normalized_tokens = new_fn
    summary = {
        n: {
            arm: {
                "median": round(statistics.median(ts), 3),
                "min": min(ts),
                "passes": ts,
            }
            for arm, ts in arms.items()
        }
        for n, arms in out.items()
    }
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
