"""Language identification (round 7): the char-trigram Naive-Bayes
langid stage — model learns on a fixture with genuinely distinct
languages, determinism, degenerate docs, and the held-out report.

The registry instance runs on the synthetic corpus whose text is
language-independent by construction (near-chance accuracy, exercised
for oracle determinism); these tests use a fixture where languages DO
differ so the model's discriminative behavior is pinned too.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from clinvar_pipeline_spark.queries_llm import (
    LID_MOD,
    LID_TEST_RES,
    _lid_trigrams,
    langid_model,
    q_langid,
    q_langid_report,
)

# Three "languages" with disjoint character inventories — any sane
# trigram model separates them perfectly.
_LANG_TEXT = {
    "aa": "abba baab abab aabb babb abba baba abab",
    "kk": "kppk pkkp kpkp kkpp pkpp kppk pkpk kpkp",
    "zz": "zyyz yzzy zyzy zzyy yzyy zyyz yzyz zyzy",
}


def _fixture(spark, tmp_path, n_per_lang=10):
    rows = []
    doc_id = 0
    for lang, text in _LANG_TEXT.items():
        for i in range(n_per_lang):
            # mild per-doc variation so docs are not byte-identical
            rows.append((doc_id, f"{text} {text.split()[i % 8]}", lang,
                         "s", len(text)))
            doc_id += 1
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_langid_separable_fixture_is_fully_correct(spark, tmp_path):
    """On disjoint character inventories the held-out slice must be
    classified perfectly — the model genuinely learns, it is not a
    deterministic coin."""
    sf = _fixture(spark, tmp_path)
    out = q_langid(spark, sf).collect()
    assert len(out) == 30  # every doc has >= 1 trigram
    held = [r for r in out if r["doc_id"] % LID_MOD == LID_TEST_RES]
    assert held and all(r["is_correct"] == 1 for r in held)
    # train slice too, on this fixture
    assert all(r["pred_lang"] == r["lang"] for r in out)


def test_langid_report_is_diagonal_on_separable_fixture(spark, tmp_path):
    sf = _fixture(spark, tmp_path)
    rep = q_langid_report(spark, sf).collect()
    assert all(r["true_lang"] == r["pred_lang"] for r in rep)
    # every language present in the held-out residue class appears
    assert {r["true_lang"] for r in rep} == set(_LANG_TEXT)
    assert sum(r["n"] for r in rep) == sum(
        1 for d in range(30) if d % LID_MOD == LID_TEST_RES
    )


def test_langid_deterministic_across_invocations(spark, sf_dir):
    a = {tuple(r) for r in q_langid(spark, sf_dir).collect()}
    b = {tuple(r) for r in q_langid(spark, sf_dir).collect()}
    assert a == b and len(a) > 0


def test_langid_short_docs_vanish(spark, tmp_path):
    """Docs with fewer than 3 normalized chars have no trigram and no
    prediction (matches the oracle's empty range())."""
    spark.createDataFrame(
        [(1, "ab", "en", "s", 2), (2, "?!", "fr", "s", 2),
         (3, "abcdef ghij", "en", "s", 11), (4, None, "de", "s", 0)],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    out = q_langid(spark, str(tmp_path)).collect()
    assert {r["doc_id"] for r in out} == {3}


def test_langid_model_frames_are_charset_bounded(spark, tmp_path):
    """The weight frame is bounded by distinct trigrams x languages
    and every weight is a finite negative log-probability."""
    sf = _fixture(spark, tmp_path)
    d = spark.read.parquet(f"{sf}/documents.parquet")
    tri = _lid_trigrams(d)
    lw, lwu = langid_model(tri)
    w = lw.collect()
    langs = {r["cand"] for r in w}
    assert langs == set(_LANG_TEXT)
    assert all(r["w"] < 0 for r in w)
    wu = {r["cand"]: r["wu"] for r in lwu.collect()}
    # unseen default is strictly below every seen weight of that lang
    for r in w:
        assert wu[r["cand"]] < r["w"]


def test_langid_trigrams_match_python_reference(spark, tmp_path):
    """The Spark trigram extraction equals a pure-Python reference on
    the normalized join string."""
    import re

    texts = ["Hello, World! 42", "a b", "", "  x  ", "ab-cd_ef"]
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    d = spark.read.parquet(f"{tmp_path}/documents.parquet")
    got = sorted(
        (r["doc_id"], r["t"]) for r in _lid_trigrams(d).collect()
    )
    want = []
    for i, t in enumerate(texts):
        toks = [w for w in re.sub(r"[^a-z0-9\s]", " ", t.lower()).split()
                if w]
        s = " ".join(toks)
        want += [(i, s[j : j + 3]) for j in range(max(len(s) - 2, 0))]
    assert got == sorted(want)


# ---------------------------------------------------------------------
# novelty_score / embedding_int8 (round 7)
# ---------------------------------------------------------------------


def test_novelty_score_extremes(spark, tmp_path):
    """Two identical docs share every shingle (novelty 0); a doc with
    corpus-unique shingles scores 1."""
    from clinvar_pipeline_spark.queries_llm import q_novelty_score

    rows = [
        (1, "alpha bravo charlie delta echo", "en", "s", 30),
        (2, "alpha bravo charlie delta echo", "en", "s", 30),
        (3, "zulu yankee xray whiskey victor", "en", "s", 31),
        (4, "xy", "en", "s", 2),  # < 3 tokens: absent
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    out = {r["doc_id"]: r for r in
           q_novelty_score(spark, str(tmp_path)).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["novelty"] == 0.0 and out[2]["novelty"] == 0.0
    assert out[1]["mean_df"] == 2.0
    assert out[3]["novelty"] == 1.0 and out[3]["mean_df"] == 1.0
    assert out[3]["n_shingles"] == out[3]["n_unique"] == 3


def test_embedding_int8_codes_and_reconstruction(spark, tmp_path):
    """Known vectors quantize to the expected codes; on real data the
    reconstruction error is bounded by half a quantization step."""
    from clinvar_pipeline_spark.queries_llm import q_embedding_int8

    vecs = [
        (1, [1.0, -0.5, 0.0, 0.25], 0),
        (2, [0.0, 0.0, 0.0, 0.0], 0),  # all-zero: codes 0, scale 0
    ]
    spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label int"
    ).write.parquet(str(tmp_path / "embeddings.parquet"))
    out = {(r["vec_id"], r["i"]): r for r in
           q_embedding_int8(spark, str(tmp_path)).collect()}
    assert [out[(1, i)]["q"] for i in range(4)] == [127, -64, 0, 32]
    assert all(out[(2, i)]["q"] == 0 for i in range(4))
    assert out[(2, 0)]["scale"] == 0.0
    # round-trip bound: |q/scale - x| <= 0.5/scale (+ scale rounding)
    s = out[(1, 0)]["scale"]
    for i, x in enumerate([1.0, -0.5, 0.0, 0.25]):
        assert abs(out[(1, i)]["q"] / s - x) <= 0.5 / s + 1e-6


def test_embedding_int8_real_corpus_bound(spark, sf_dir):
    from clinvar_pipeline_spark.queries_llm import q_embedding_int8

    emb = {
        r["vec_id"]: r["embedding"]
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .limit(50).collect()
    }
    rows = q_embedding_int8(spark, sf_dir).collect()
    for r in rows:
        if r["vec_id"] not in emb or r["scale"] == 0:
            continue
        x = emb[r["vec_id"]][r["i"]]
        assert abs(r["q"] / r["scale"] - x) <= 0.5 / r["scale"] + 1e-5
