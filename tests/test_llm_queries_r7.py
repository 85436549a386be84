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


# ---------------------------------------------------------------------
# duplicate_spans_keep_first: one canonical copy survives
# ---------------------------------------------------------------------

def _apply_cut(rows, spans):
    """Pure-Python cut application: tokens outside any span survive.
    Returns {doc_id: (n_tokens, kept_tokens)}."""
    cut = {}
    for r in spans:
        cut.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"])
        )
    out = {}
    for doc_id, text, _ in rows:
        toks = text.split()
        spans_d = cut.get(doc_id, [])
        kept = [
            t for i, t in enumerate(toks)
            if not any(s <= i < e for s, e in spans_d)
        ]
        out[doc_id] = (len(toks), kept)
    return out


def test_keep_first_one_occurrence_survives(spark, tmp_path, monkeypatch):
    """The contract: exactly ONE occurrence of each duplicated string
    survives the keep-first cut (the globally-first by (doc_id, pos)),
    and per-document token mass is conserved (kept + cut ==
    n_tokens)."""
    monkeypatch.setattr(ql, "SPAN_W", 3)
    rows = [
        (0, "b0 b1 b2 u0 u1 u2 u3", "en"),
        (1, "v0 v1 v2 b0 b1 b2", "en"),
        (2, "b0 b1 b2 w0 w1", "en"),
        # self-repeat: first copy at pos 0 survives, second (pos 7) cut
        (3, "x0 x1 x2 q0 q1 q2 q3 x0 x1 x2", "en"),
        (4, "z0 z1 z2 z3", "en"),  # unique -> untouched
    ]
    d = _write_docs(spark, tmp_path, rows)
    spans = ql.q_duplicate_spans_keep_first(spark, d).collect()
    got = {(r["doc_id"], r["span_start"], r["span_end"], r["n_windows"])
           for r in spans}
    assert got == {(1, 3, 6, 1), (2, 0, 3, 1), (3, 7, 10, 1)}
    applied = _apply_cut(rows, spans)
    # token-mass conservation per doc
    for doc_id, text, _ in rows:
        n, kept = applied[doc_id]
        n_cut = sum(
            r["span_end"] - r["span_start"] for r in spans
            if r["doc_id"] == doc_id
        )
        assert len(kept) + n_cut == n
    # exactly one occurrence of each duplicated trigram survives
    all_kept = {doc: " ".join(k) for doc, (_, k) in applied.items()}
    survivors_b = sum(s.count("b0 b1 b2") for s in all_kept.values())
    survivors_x = sum(s.count("x0 x1 x2") for s in all_kept.values())
    assert survivors_b == 1 and survivors_x == 1
    # the survivor is the globally-first occurrence
    assert all_kept[0].startswith("b0 b1 b2")
    assert all_kept[3].startswith("x0 x1 x2")


def test_keep_first_marked_subset_of_cut_all(spark, tmp_path, monkeypatch):
    """keep_first's marked-window mass equals cut-all's minus one
    window per distinct duplicated string — the policies differ by
    exactly the surviving occurrences."""
    monkeypatch.setattr(ql, "SPAN_W", 3)
    boiler = "b0 b1 b2 b3 b4"
    rows = [
        (0, f"u0 u1 {boiler} u2 u3", "en"),
        (1, f"{boiler} v0 v1 v2 v3", "en"),
        (2, f"w0 {boiler} w1 w2", "en"),
    ]
    d = _write_docs(spark, tmp_path, rows)
    n_all = sum(r["n_windows"] for r in
                ql.q_duplicate_spans(spark, d).collect())
    n_kf = sum(r["n_windows"] for r in
               ql.q_duplicate_spans_keep_first(spark, d).collect())
    # 3 duplicated trigrams inside boiler, each with one survivor
    assert n_all - n_kf == 3
    # the surviving doc is doc 0? no -- doc 1 holds the globally
    # smallest (doc_id, pos) only when its pos is irrelevant: order is
    # lexicographic on (doc_id, pos), so doc 0's occurrences win
    kf_docs = {r["doc_id"] for r in
               ql.q_duplicate_spans_keep_first(spark, d).collect()}
    assert 0 not in kf_docs and kf_docs == {1, 2}
