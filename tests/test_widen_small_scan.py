"""_widen_small_scan (r12): the data-driven under-split-scan spread.

Two properties pinned, mirroring test_pagerank_fast's branch-equality
discipline for data-driven plan branches:

- branch OFF (the 100 TB shape: scan splits >= cores) produces
  bit-identical vcf_export rows to branch ON (the local shape) — the
  repartition is placement-only, never semantic;
- the gate itself: a frame whose split count already meets the width
  is returned untouched (no exchange added at scale).
"""

from __future__ import annotations

from clinvar_pipeline_spark import queries as q
from clinvar_pipeline_spark.queries import _widen_small_scan

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_vcf_export_identical_with_branch_forced_off(spark, monkeypatch):
    reg = q.queries()
    on = _rows(reg["vcf_export"](spark, SF))
    # force the at-scale branch: pretend the scan arrived multi-split
    import clinvar_pipeline_spark.queries as qmod

    monkeypatch.setattr(
        qmod, "_scan_splits", lambda *_a, **_k: 10**6
    )
    off = _rows(reg["vcf_export"](spark, SF))
    assert on == off


def test_gate_is_noop_when_scan_is_wide_enough(spark):
    width = spark.sparkContext.defaultParallelism
    df = spark.range(1000, numPartitions=width + 4)
    # a frame already wider than the session: helper must not touch it
    import clinvar_pipeline_spark.queries as qmod

    orig = qmod._scan_splits
    try:
        qmod._scan_splits = lambda *_a, **_k: width + 4
        out = _widen_small_scan(df, spark, SF, "lineitem")
    finally:
        qmod._scan_splits = orig
    assert out is df
