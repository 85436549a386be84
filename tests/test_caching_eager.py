"""register_persist's eager mark is a deployment profile: the count()
materialization job runs only under SPARK_GRAFT_EAGER_PERSIST=1 (the
cluster profile); the local default leaves the persist lazy (the r11
A/B measured the eager barrier as a wall-time loss on idle cores —
see the register_persist docstring)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from clinvar_pipeline_spark.caching import register_persist, release_cached


def _touch_counter(spark, df):
    """Wrap df so every row evaluation bumps an accumulator."""
    acc = spark.sparkContext.accumulator(0)

    @F.udf("long")
    def bump(x):
        acc.add(1)
        return x

    return df.select(bump(F.col("id")).alias("id")), acc


def test_lazy_by_default(spark, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_EAGER_PERSIST", raising=False)
    df, acc = _touch_counter(spark, spark.range(7))
    out = register_persist(df, eager=True)
    assert acc.value == 0  # no materialization job ran
    assert out.count() == 7
    assert acc.value > 0
    release_cached()


def test_eager_under_cluster_profile(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_EAGER_PERSIST", "1")
    df, acc = _touch_counter(spark, spark.range(7))
    out = register_persist(df, eager=True)
    assert acc.value == 7  # the count() pass filled the cache NOW
    # consumers read the cached blocks, not the lineage
    assert out.count() == 7
    assert acc.value == 7
    release_cached()


def test_plain_persist_never_eager(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_EAGER_PERSIST", "1")
    df, acc = _touch_counter(spark, spark.range(5))
    register_persist(df)  # unmarked frames stay lazy in every profile
    assert acc.value == 0
    release_cached()
    assert os.environ.get("SPARK_GRAFT_EAGER_PERSIST") == "1"


def test_r12_marked_queries_identical_under_eager(spark, sf_dir, monkeypatch):
    """r12 marked seven multi-consumer persists eager (profile-driven:
    decontaminate, filter_funnel, quality voc, eval_leak_report,
    class_centroid_outliers, bloom_decontaminate, hll_overlap). The
    mark must be result-invariant: same rows in both profiles."""
    from clinvar_pipeline_spark import queries as q

    reg = q.queries()
    for name in ("hll_overlap", "class_centroid_outliers"):
        monkeypatch.delenv("SPARK_GRAFT_EAGER_PERSIST", raising=False)
        lazy = sorted(map(tuple, reg[name](spark, sf_dir).collect()))
        q.release_cached()
        monkeypatch.setenv("SPARK_GRAFT_EAGER_PERSIST", "1")
        eager = sorted(map(tuple, reg[name](spark, sf_dir).collect()))
        q.release_cached()
        assert eager == lazy, name
