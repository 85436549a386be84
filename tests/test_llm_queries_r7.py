"""Round-7 LLM-pipeline additions: the applied SHINGLE_DF_CAP guard
in eval_leak_report, percentile-true CCNet bands, and the
keep-first-occurrence ExactSubstr policy — exact contracts on
handcrafted fixtures plus the invariants the oracle check can't see.
"""

from __future__ import annotations

import clinvar_pipeline_spark.queries_llm as ql


def _write_docs(spark, path, rows, parts=2):
    """rows: [(doc_id, text, lang)] -> a documents.parquet table dir."""
    spark.createDataFrame(
        [(i, t, lg, "s", len(t)) for i, t, lg in rows],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).repartition(parts).write.mode("overwrite").parquet(
        str(path / "documents.parquet")
    )
    return str(path)


# ---------------------------------------------------------------------
# eval_leak_report: the df cap is applied, observable, and exact
# ---------------------------------------------------------------------

def test_eval_leak_cap_excludes_hot_shingles(spark, tmp_path, monkeypatch):
    """A boilerplate shingle above the df cap must not count as
    leakage; the exclusion is surfaced per eval doc via n_capped and
    the ratio keeps the uncapped denominator (lower-bound
    semantics)."""
    monkeypatch.setattr(ql, "_SHINGLE_DF_CAP", 3)
    # doc 0 is the eval doc (id % 97 == 0); shingle "hot hot hot"
    # appears in 4 train docs (> cap) + the eval doc; shingle
    # "cold cold cold" appears in exactly 1 train doc
    rows = [
        (0, "hot hot hot cold cold cold", "en"),
        (1, "hot hot hot a1 a2 a3", "en"),
        (2, "hot hot hot b1 b2 b3", "en"),
        (3, "hot hot hot c1 c2 c3", "en"),
        (4, "hot hot hot d1 d2 d3", "en"),
        (5, "cold cold cold e1 e2 e3", "en"),
    ]
    d = _write_docs(spark, tmp_path, rows)
    out = {r["eval_doc"]: r for r in
           ql.q_eval_leak_report(spark, d).collect()}
    assert set(out) == {0}
    r = out[0]
    # doc 0's distinct 3-shingles: hot³, hot²cold, hotcold², cold³
    assert r["n_shingles"] == 4
    # only "hot hot hot" exceeds df cap 3 (df=5 > 3)
    assert r["n_capped"] == 1
    # leaked: "cold cold cold" via doc 5 only; the hot shingle's four
    # carriers are invisible to the join
    assert r["n_leaked_shingles"] == 1
    assert r["n_train_docs"] == 1
    assert r["leak_ratio"] == round(1 / 4, 4)


def test_eval_leak_all_capped_doc_reports_zero(spark, tmp_path, monkeypatch):
    """An eval doc wholly made of stop-shingles: n_capped ==
    n_shingles, zero leakage rows reported, ratio 0 — present in the
    report, not silently dropped."""
    monkeypatch.setattr(ql, "_SHINGLE_DF_CAP", 2)
    rows = [(0, "x x x x", "en")] + [
        (i, "x x x x", "en") for i in range(1, 5)
    ]
    d = _write_docs(spark, tmp_path, rows)
    out = {r["eval_doc"]: r for r in
           ql.q_eval_leak_report(spark, d).collect()}
    r = out[0]
    assert r["n_shingles"] == 1  # distinct shingle "x x x"
    assert r["n_capped"] == 1
    assert r["n_leaked_shingles"] == 0
    assert r["n_train_docs"] == 0
    assert r["leak_ratio"] == 0.0
