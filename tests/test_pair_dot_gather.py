"""_scored_pair_dots (r12): the gather-kernel vs join-attach branch.

The re-rank family ships id pairs only and gathers vectors from a
broadcast matrix when the corpus fits the session's broadcast bound;
at scale it falls back to the r11 join-attach shape. Both branches
must produce BIT-IDENTICAL rows (the exact-integer-dot argument: the
gather feeds einsum the same integer-valued float64 rows the join
would attach, every partial sum < 2^53). Pinned here by forcing the
join branch and diffing against the default, for both a top-k rerank
consumer (ann_topk) and a filter consumer (embedding_neardup_lsh).
"""

from __future__ import annotations

from clinvar_pipeline_spark import queries as q

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _with_join_branch(monkeypatch):
    import clinvar_pipeline_spark.operators.similarity as sim

    monkeypatch.setattr(sim, "_gather_qv_matrix", lambda *_a, **_k: None)


def test_ann_topk_gather_matches_join_attach(spark, monkeypatch):
    reg = q.queries()
    gathered = _rows(reg["ann_topk"](spark, SF))
    _with_join_branch(monkeypatch)
    joined = _rows(reg["ann_topk"](spark, SF))
    assert gathered == joined


def test_neardup_gather_matches_join_attach(spark, monkeypatch):
    reg = q.queries()
    gathered = _rows(reg["embedding_neardup_lsh"](spark, SF))
    _with_join_branch(monkeypatch)
    joined = _rows(reg["embedding_neardup_lsh"](spark, SF))
    assert gathered == joined
    # the threshold filter must survive both branches non-vacuously
    assert len(gathered) > 0


def test_gather_declines_when_broadcast_disabled(spark):
    """thresh <= 0 (broadcast disabled) must select the join branch —
    the same signal the planner itself uses."""
    from clinvar_pipeline_spark.operators.similarity import (
        _gather_qv_matrix,
    )

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = spark.range(3).selectExpr(
            "id as _id", "array(1.0d, 2.0d) as _qv"
        )
        assert _gather_qv_matrix(df) is None
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
