"""Round-8 corpus queries: group_sample (exact-k deterministic
per-group sample, map-side-pruned) and zipf_fit (token power-law
least squares), pinned against naive recomputations."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from clinvar_pipeline_spark.queries_llm import (
    GROUP_SAMPLE_K,
    ZIPF_TOP,
    q_group_sample,
    q_zipf_fit,
)

SF = "/root/testdata/sf0.001"


def test_group_sample_exact_k_and_pure_python_twin(spark):
    got = q_group_sample(spark, SF).collect()
    # exactly k per group (every lang here has >= k docs)
    bylang = {}
    for r in got:
        bylang.setdefault(r["lang"], []).append(r)
    for lang, rows in bylang.items():
        assert len(rows) == GROUP_SAMPLE_K, lang
        assert sorted(r["rn"] for r in rows) == list(
            range(1, GROUP_SAMPLE_K + 1)
        )
    # pure-python twin: first k doc_ids per lang in md5-hex order
    pdf = pd.read_parquet(f"{SF}/documents.parquet")[["doc_id", "lang"]]
    pdf["hk"] = pdf["doc_id"].map(
        lambda i: hashlib.md5(str(i).encode()).hexdigest()
    )
    for lang, g in pdf.groupby("lang"):
        want = set(
            g.sort_values(["hk", "doc_id"]).head(GROUP_SAMPLE_K)["doc_id"]
        )
        assert {r["doc_id"] for r in bylang[lang]} == want, lang
    # and the emitted hash is the real md5
    for r in got[:5]:
        assert r["hk"] == hashlib.md5(str(r["doc_id"]).encode()).hexdigest()


def test_group_sample_prune_is_exact_across_partitionings(spark):
    # the map-side prune must not change the pick under adversarial
    # partitioning (many small partitions -> many local top-k unions)
    base = {
        (r["lang"], r["doc_id"])
        for r in q_group_sample(spark, SF).collect()
    }

    # naive unpruned twin computed straight from the table
    d = spark.read.parquet(f"{SF}/documents.parquet")
    h = d.select(
        "lang", "doc_id", F.md5(F.col("doc_id").cast("string")).alias("hk")
    )
    w = Window.partitionBy("lang").orderBy("hk", "doc_id")
    naive = {
        (r["lang"], r["doc_id"])
        for r in h.select(
            "lang", "doc_id", F.row_number().over(w).alias("rn")
        )
        .filter(F.col("rn") <= GROUP_SAMPLE_K)
        .collect()
    }
    assert base == naive


def test_zipf_fit_vs_numpy(spark):
    row = q_zipf_fit(spark, SF).collect()[0]
    # numpy twin: tokenize identically, count, rank, polyfit
    pdf = pd.read_parquet(f"{SF}/documents.parquet")
    import re

    cnt: dict[str, int] = {}
    for t in pdf["text"]:
        for tok in re.sub(r"[^a-z0-9\s]", " ", t.lower()).split():
            cnt[tok] = cnt.get(tok, 0) + 1
    head = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:ZIPF_TOP]
    # the synthetic corpus vocab may be smaller than the head cap
    assert row["n_terms"] == min(ZIPF_TOP, len(cnt))
    x = np.log(np.arange(1, len(head) + 1))
    y = np.log(np.array([c for _, c in head], dtype=float))
    slope, intercept = np.polyfit(x, y, 1)
    assert abs(row["zipf_slope"] - slope) < 1e-3
    assert abs(row["zipf_intercept"] - intercept) < 1e-3
    # natural-ish text: slope is negative and non-degenerate
    assert -3.0 < row["zipf_slope"] < -0.05


def test_source_divergence_vs_scipy_free_python(spark):
    import math
    import re

    from clinvar_pipeline_spark.queries_llm import q_source_divergence

    got = {
        r["source"]: (r["n_tokens"], r["kl_divergence"])
        for r in q_source_divergence(spark, SF).collect()
    }
    pdf = pd.read_parquet(f"{SF}/documents.parquet")
    cst: dict[tuple[str, str], int] = {}
    for src, txt in zip(pdf["source"], pdf["text"]):
        for tok in re.sub(r"[^a-z0-9\s]", " ", txt.lower()).split():
            cst[(src, tok)] = cst.get((src, tok), 0) + 1
    ct: dict[str, int] = {}
    tsum: dict[str, int] = {}
    for (src, tok), c in cst.items():
        ct[tok] = ct.get(tok, 0) + c
        tsum[src] = tsum.get(src, 0) + c
    tot = sum(ct.values())
    for src in tsum:
        kl = sum(
            (c / tsum[src]) * math.log((c / tsum[src]) / (ct[tok] / tot))
            for (s_, tok), c in cst.items()
            if s_ == src
        )
        assert got[src][0] == tsum[src]
        assert abs(got[src][1] - kl) < 1e-3, src
        assert got[src][1] >= 0  # KL is non-negative


def test_token_count_stream_zipf_and_kl_equal_batch(spark, tmp_path):
    """Streamed (source, token) counts: two-batch drain with
    compaction on; zipf_snapshot and divergence_snapshot equal their
    batch registry queries."""
    from clinvar_pipeline_spark.queries import _t
    from clinvar_pipeline_spark.queries_llm import (
        q_source_divergence,
        q_zipf_fit,
    )
    from clinvar_pipeline_spark.streaming.corpus import (
        divergence_snapshot,
        token_count_stream,
        zipf_snapshot,
    )

    docs = _t(spark, SF, "documents").select("doc_id", "source", "text")
    drop = tmp_path / "docs"
    docs.repartition(2).write.parquet(str(drop))

    stream = (
        spark.readStream.schema("doc_id long, source string, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(drop))
    )
    deltas, ckpt = str(tmp_path / "tok"), str(tmp_path / "ckpt_tok")
    q = token_count_stream(stream, deltas, ckpt, compact_every=1)
    q.awaitTermination(120)

    zs = zipf_snapshot(spark, deltas).collect()[0]
    zb = q_zipf_fit(spark, SF).collect()[0]
    assert (zs["n_terms"], zs["zipf_slope"], zs["zipf_intercept"]) == (
        zb["n_terms"], zb["zipf_slope"], zb["zipf_intercept"]
    )

    ds = {
        r["source"]: (r["n_tokens"], r["kl_divergence"])
        for r in divergence_snapshot(spark, deltas).collect()
    }
    db = {
        r["source"]: (r["n_tokens"], r["kl_divergence"])
        for r in q_source_divergence(spark, SF).collect()
    }
    assert ds == db and len(db) > 0


def test_token_count_stream_serves_lexical_diversity(spark, tmp_path):
    """Third report off the same sink: lexical_snapshot equals the
    batch q_lexical_diversity after a two-batch drain (compaction
    on), including the hapax counts — the statistic most sensitive
    to a double-landed epoch (every re-added count turns a hapax
    into a non-hapax)."""
    from clinvar_pipeline_spark.queries import _t
    from clinvar_pipeline_spark.queries_text import q_lexical_diversity
    from clinvar_pipeline_spark.streaming.corpus import (
        lexical_snapshot,
        token_count_stream,
    )

    docs = _t(spark, SF, "documents").select("doc_id", "source", "text")
    drop = tmp_path / "docs"
    docs.repartition(2).write.parquet(str(drop))

    stream = (
        spark.readStream.schema("doc_id long, source string, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(drop))
    )
    deltas, ckpt = str(tmp_path / "tok"), str(tmp_path / "ckpt_tok")
    q = token_count_stream(stream, deltas, ckpt, compact_every=1)
    q.awaitTermination(120)

    key = lambda r: (
        r["n_tokens"], r["n_types"], r["n_hapax"], r["ttr"], r["hapax_ratio"]
    )
    got = {r["source"]: key(r) for r in lexical_snapshot(spark, deltas).collect()}
    exp = {r["source"]: key(r) for r in q_lexical_diversity(spark, SF).collect()}
    assert got == exp and len(exp) > 0


def test_token_count_stream_serves_entropy(spark, tmp_path):
    """Fourth report off the same sink: entropy_snapshot equals batch
    q_token_entropy after a two-batch drain."""
    from clinvar_pipeline_spark.queries import _t
    from clinvar_pipeline_spark.queries_text import q_token_entropy
    from clinvar_pipeline_spark.streaming.corpus import (
        entropy_snapshot,
        token_count_stream,
    )

    docs = _t(spark, SF, "documents").select("doc_id", "source", "text")
    drop = tmp_path / "docs"
    docs.repartition(2).write.parquet(str(drop))
    stream = (
        spark.readStream.schema("doc_id long, source string, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(drop))
    )
    deltas, ckpt = str(tmp_path / "tok"), str(tmp_path / "ckpt_tok")
    q = token_count_stream(stream, deltas, ckpt, compact_every=1)
    q.awaitTermination(120)

    key = lambda r: (r["n_tokens"], r["entropy_nats"], r["unigram_ppl"])
    got = {r["source"]: key(r) for r in entropy_snapshot(spark, deltas).collect()}
    exp = {r["source"]: key(r) for r in q_token_entropy(spark, SF).collect()}
    assert got == exp and len(exp) > 0
