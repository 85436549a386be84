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


# ---------------------------------------------------------------------
# perplexity_bands_pct: percentile-true cuts + divergence from z-bands
# ---------------------------------------------------------------------

import math


def _pct_expect(rows):
    """Reference banding in pure Python from (lang, score) pairs:
    cut_head = ceil(n/3)-th largest, cut_tail = ceil(2n/3)-th
    largest, assignment by value."""
    by_lang: dict[str, list[float]] = {}
    for lang, s in rows:
        by_lang.setdefault(lang, []).append(s)
    out = {}
    for lang, ss in by_lang.items():
        desc = sorted(ss, reverse=True)
        n = len(desc)
        ch = desc[math.ceil(n / 3) - 1]
        ct = desc[math.ceil(2 * n / 3) - 1]
        out[lang] = (ch, ct)
    return out


def test_pct_bands_exact_order_statistics(spark, tmp_path):
    """Cuts are the exact k-th order statistics — checked against a
    pure-Python sort on a fixture wide enough to spread over many
    histogram bins (distinct rare vocab per doc -> distinct scores)."""
    rows = [(i, " ".join(f"w{i}_{j}" for j in range(i % 7 + 1))
             + " common" * (i % 5), "en") for i in range(30)]
    rows += [(100 + i, f"s{i} s{i} t{i}", "fr") for i in range(4)]
    rows += [(200, "solo language doc", "xx")]  # n=1: both cuts = score
    d = _write_docs(spark, tmp_path, rows)
    got = ql.q_perplexity_bands_pct(spark, d).collect()
    cuts = _pct_expect([(r["lang"], r["score"]) for r in got])
    for r in got:
        ch, ct = cuts[r["lang"]]
        want = ("head" if r["score"] >= ch
                else "tail" if r["score"] < ct else "middle")
        assert r["band"] == want, (r, ch, ct)
    # the single-doc language lands head (its score is both cuts)
    assert [r["band"] for r in got if r["lang"] == "xx"] == ["head"]


def test_pct_bands_degenerate_language_all_one_score(spark, tmp_path):
    """All docs of a language share one score: span == 0 collapses to
    one bin, cuts equal that score, everyone is head (>= cut_head) in
    BOTH engines — the z-variant's sd==0 guard analogue."""
    rows = [(i, "same same same", "en") for i in range(6)]
    d = _write_docs(spark, tmp_path, rows)
    out = ql.q_perplexity_bands_pct(spark, d).collect()
    assert len(out) == 6 and all(r["band"] == "head" for r in out)


def test_pct_vs_z_bands_diverge_on_skew(spark, tmp_path):
    """The documented trade the pct variant closes: on a skewed
    distribution (a heavy mode + a rare tail) the z-score cut points
    differ from the percentile cuts — at least one document is banded
    differently, while the pct bands remain exact thirds-by-value."""
    rows = [(i, "a", "en") for i in range(12)]
    rows += [(100 + i, f"rare{i}", "en") for i in range(3)]
    d = _write_docs(spark, tmp_path, rows)
    z = {r["doc_id"]: r["band"]
         for r in ql.q_perplexity_bands(spark, d).collect()}
    p = {r["doc_id"]: r["band"]
         for r in ql.q_perplexity_bands_pct(spark, d).collect()}
    assert set(z) == set(p)
    diverged = {k for k in z if z[k] != p[k]}
    assert diverged, "skewed fixture must separate the two variants"
    # pct semantics on this fixture: the 12-doc mode IS the top-third
    # cut value -> all head; the 3 rare docs sit below the 2/3 cut ->
    # tail; middle empty
    got = sorted(p.values())
    assert got.count("head") == 12 and got.count("tail") == 3
