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


def test_build_sf1_perturbed_texts_diverge(spark, tmp_path, monkeypatch):
    """Perturbed replica (r11, duplicate-rate control): replica 0 keeps
    the source texts verbatim; replicas i>0 have every >=4-char token
    suffixed, so cross-replica shingle overlap collapses while the
    token COUNT per document is preserved (same doc shape, different
    vocabulary)."""
    from pyspark.sql import functions as F

    sp = _probe_module()
    monkeypatch.setattr(sp, "SF_MID", "/root/testdata/sf0.001")
    monkeypatch.setattr(sp, "REPLICAS", 3)
    out = tmp_path / "repp"
    out.mkdir()
    sp.build_sf1(spark, out_dir=str(out), perturb_docs=True)

    src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rep = spark.read.parquet(str(out / "documents.parquet"))
    assert rep.count() == 3 * src.count()
    src_texts = {r["text"] for r in src.select("text").collect()}
    by_band = {
        b: {r["text"] for r in rep.filter(
            (F.col("doc_id") / sp.OFFSET).cast("int") == b
        ).select("text").collect()}
        for b in (0, 1, 2)
    }
    assert by_band[0] == src_texts            # replica 0 verbatim
    assert not (by_band[1] & src_texts)       # i>0 fully diverged
    assert not (by_band[1] & by_band[2])      # and from each other
    # token counts preserved (suffixing, not deletion/insertion)
    n_src = src.select(
        F.sum(F.size(F.split("text", r"\s+"))).alias("n")
    ).first()["n"]
    n_rep1 = rep.filter((F.col("doc_id") / sp.OFFSET).cast("int") == 1).select(
        F.sum(F.size(F.split("text", r"\s+"))).alias("n")
    ).first()["n"]
    assert n_rep1 == n_src
