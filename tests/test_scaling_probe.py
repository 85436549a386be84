"""Scaling-probe replica builder (tools/scaling_probe.py build_sf1):
the sf1 replication must produce DISJOINT entities, not duplicate
keys — otherwise the probe's exponents measure artificial key skew
instead of data growth. Pinned on a 3x replication of sf0.001."""

from __future__ import annotations

import importlib
import sys


def _probe_module():
    sys.path.insert(0, "/root/repo")
    return importlib.import_module("tools.scaling_probe")


def test_build_sf1_key_shifts_and_vocab_growth(spark, tmp_path, monkeypatch):
    sp = _probe_module()
    monkeypatch.setattr(sp, "SF_MID", "/root/testdata/sf0.001")
    monkeypatch.setattr(sp, "SF1_DIR", str(tmp_path / "rep"))
    monkeypatch.setattr(sp, "REPLICAS", 3)
    (tmp_path / "rep").mkdir()
    sp.build_sf1(spark)

    src_li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    rep_li = spark.read.parquet(str(tmp_path / "rep" / "lineitem.parquet"))
    assert rep_li.count() == 3 * src_li.count()
    # key-shifted replicas are DISJOINT order-key ranges
    from pyspark.sql import functions as F

    per_band = (
        rep_li.groupBy((F.col("l_orderkey") / sp.OFFSET).cast("int").alias("b"))
        .count()
        .collect()
    )
    assert {r["b"] for r in per_band} == {0, 1, 2}
    assert len({r["count"] for r in per_band}) == 1  # equal-size replicas
    # the ER name vocabulary truly grows: replica i>0 part names differ
    src_names = {
        r["p_name"]
        for r in spark.read.parquet(
            "/root/testdata/sf0.001/part.parquet"
        ).collect()
    }
    rep_names = {
        r["p_name"]
        for r in spark.read.parquet(
            str(tmp_path / "rep" / "part.parquet")
        ).collect()
    }
    assert len(rep_names) == 3 * len(src_names)
    # dims are copied through unchanged
    assert (
        spark.read.parquet(str(tmp_path / "rep" / "nation.parquet")).count()
        == spark.read.parquet("/root/testdata/sf0.001/nation.parquet").count()
    )
