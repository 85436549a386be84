"""ExactSubstr rolling-hash kernel (r7): the linear window pass must
partition stride-1 windows EXACTLY like the r6 per-window
``xxhash64(concat_ws(slice(...)))`` materialization it replaced — same
duplicated-position set, same spans — on adversarial fixtures, the
real sf0.001 corpus, and a 10x replication of it (the
tools/corpus_probe.py scheme; the same check ran once at sf0.01 x10 =
50k docs: marked-set count + signature identical).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

import clinvar_pipeline_spark.queries_llm as ql
from clinvar_pipeline_spark.functions.hashes import (
    ROLL_BASE,
    ROLL_BASE_INV,
    rolling_window_hashes_batch,
)

SF0001 = "/root/testdata/sf0.001"


def _write_docs(spark, path, rows, parts=2):
    spark.createDataFrame(
        [(i, t, lg, "s", len(t)) for i, t, lg in rows],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).repartition(parts).write.mode("overwrite").parquet(
        str(path / "documents.parquet")
    )
    return str(path)


def _legacy_win(spark, sf_dir, w):
    """The r6 O(n*W) window builder: per-window string concat then
    xxhash64 — kept here as the equality reference for the rolling
    kernel."""
    from clinvar_pipeline_spark.functions.hashes import normalized_tokens

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = d.select(
        "doc_id", normalized_tokens(F.col("text")).alias("toks")
    ).filter(F.size("toks") >= w)
    return base.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(toks) - {w} + 1),"
                f" i -> struct(cast(i - 1 as bigint) as pos,"
                f" xxhash64(concat_ws(' ', slice(toks, i, {w})))"
                f" as h))"
            )
        ).alias("x"),
    ).select("doc_id", F.col("x.pos").alias("pos"), F.col("x.h").alias("h"))


def _marked(win):
    """The duplicated-(doc_id, pos) set — the sufficient statistic for
    both the span list and the apply manifest."""
    dup = (
        win.groupBy("h")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .select("h")
    )
    return {
        (r["doc_id"], r["pos"])
        for r in win.join(dup, "h", "left_semi").collect()
    }


def test_rolling_kernel_window_algebra(spark):
    """The normalized prefix-sum closed form: equal token-hash
    subsequences at ANY offset hash equal; any single-token change
    flips the window hash."""
    roll = rolling_window_hashes_batch(3)
    f = roll.func  # the underlying pandas function
    t = [11, 22, 33, 44, 22, 33, 44, 55]
    out = f(pd.Series([np.asarray(t, dtype=np.int64)]))[0]
    assert len(out) == 6
    # windows [1..4)=(22,33,44) and [4..7)=(22,33,44) must collide
    assert out[1] == out[4]
    # all other pairs distinct
    assert len({int(x) for x in out}) == 5
    # sub-window docs emit no windows
    short = f(pd.Series([np.asarray([1, 2], dtype=np.int64), None]))
    assert list(short[0]) == [] and list(short[1]) == []


def test_rolling_base_invertible():
    assert (ROLL_BASE * ROLL_BASE_INV) % (1 << 64) == 1
    assert ROLL_BASE % 2 == 1


def test_rolling_matches_legacy_on_fixture(spark, tmp_path, monkeypatch):
    """Adversarial fixture: shared boilerplate at different offsets,
    self-repeats, short docs — marked sets identical between the r6
    string kernel and the rolling kernel."""
    monkeypatch.setattr(ql, "SPAN_W", 3)
    boiler = "b0 b1 b2 b3 b4 b5 b6 b7 b8 b9"
    rows = [
        (0, f"u0 u1 {boiler} u2 u3", "en"),
        (1, f"v0 v1 v2 v3 v4 {boiler}", "en"),
        (2, "r0 r1 r2 x0 x1 x2 x3 x4 x5 x6 r0 r1 r2 y0", "en"),
        (3, "w0 w1", "en"),
        (4, "q0 q1 q2 q3 q4 q5 q6 q7 q8 q9 q10", "en"),
    ]
    d = _write_docs(spark, tmp_path, rows)
    new = _marked(ql._window_hash_frame(spark, d))
    old = _marked(_legacy_win(spark, d, 3))
    assert new == old and len(new) > 0


def test_rolling_matches_legacy_at_10x(spark, tmp_path):
    """Replication probe (tools/corpus_probe.py scheme): every sf0.001
    doc copied 10x with shifted ids — replication makes every window
    duplicated ACROSS replicas, so the marked set is maximal and any
    hash-family divergence between the kernels would surface."""
    d = spark.read.parquet(f"{SF0001}/documents.parquet")
    reps = spark.range(10).select(F.col("id").alias("_r"))
    d10 = d.crossJoin(reps).select(
        (F.col("doc_id") + F.col("_r") * 10**9).alias("doc_id"),
        "text", "lang", "source", "n_chars",
    )
    d10.write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    sf = str(tmp_path)
    new = _marked(ql._window_hash_frame(spark, sf))
    old = _marked(_legacy_win(spark, sf, ql.SPAN_W))
    assert new == old and len(new) > 0


def test_rolling_matches_legacy_at_sf0001(spark):
    """Full-corpus equality on the real 500-doc table at the
    production SPAN_W: identical duplicated-position sets, identical
    span output."""
    new = _marked(ql._window_hash_frame(spark, SF0001))
    old = _marked(_legacy_win(spark, SF0001, ql.SPAN_W))
    assert new == old
    spans = {
        (r["doc_id"], r["span_start"], r["span_end"], r["n_windows"])
        for r in ql.q_duplicate_spans(spark, SF0001).collect()
    }
    # spans re-derived from the legacy marked set must agree
    by_doc: dict[int, list[int]] = {}
    for doc, pos in sorted(old):
        by_doc.setdefault(doc, []).append(pos)
    expect = set()
    for doc, ps in by_doc.items():
        start, prev, n = ps[0], ps[0], 1
        for p in ps[1:]:
            if p - prev > ql.SPAN_W:
                expect.add((doc, start, prev + ql.SPAN_W, n))
                start, n = p, 0
            prev = p
            n += 1
        expect.add((doc, start, prev + ql.SPAN_W, n))
    assert spans == expect


# ---------------------------------------------------------------------
# rolling-hash property: window equality == subsequence equality
# ---------------------------------------------------------------------

from hypothesis import given, settings, strategies as st


def _roll_py(t, w):
    """Driver-side reference of the kernel's closed form — the same
    wraparound mod-2^64 arithmetic in pure Python ints."""
    n = len(t)
    mask = (1 << 64) - 1
    P = [0]
    for j, x in enumerate(t):
        P.append((P[-1] + (x & mask) * pow(ROLL_BASE_INV, j, 1 << 64)) & mask)
    return [
        ((P[i + w] - P[i]) * pow(ROLL_BASE, i, 1 << 64)) & mask
        for i in range(n - w + 1)
    ]


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        min_size=0, max_size=40,
    ),
    st.integers(min_value=1, max_value=6),
)
def test_rolling_hash_kernel_matches_python_reference(spark, toks, w):
    """The numpy kernel equals the pure-Python closed form on
    arbitrary int64 token-hash streams, and equal subsequences always
    collide (no false negatives — the property the dedup semantics
    rely on; false positives are the documented 2^-64 residual)."""
    import numpy as np
    import pandas as pd

    f = rolling_window_hashes_batch(w).func
    got = [int(x) & ((1 << 64) - 1) for x in
           f(pd.Series([np.asarray(toks, dtype=np.int64)]))[0]]
    want = _roll_py(toks, w) if len(toks) >= w else []
    assert got == want
    # no false negatives: every repeated subsequence shares a hash
    for i in range(len(got)):
        for j in range(i + 1, len(got)):
            if toks[i:i + w] == toks[j:j + w]:
                assert got[i] == got[j]
