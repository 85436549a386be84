"""DSIR importance resampling + the HLL distinct sketch: directional
and selection contracts on handcrafted fixtures (the oracle check
pins engine-exactness; these pin the semantics the hash can't see),
and the sketch's accuracy bound on the real testdata."""

from __future__ import annotations

from pyspark.sql import functions as F

import clinvar_pipeline_spark.queries_llm as ql
from clinvar_pipeline_spark.functions.hashes import normalized_tokens


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
# dsir_weights: direction, feature accounting, target exclusion
# ---------------------------------------------------------------------

def test_dsir_target_like_raw_docs_outscore(spark, tmp_path):
    """A raw document sharing the target slice's n-gram profile must
    carry a strictly higher importance weight than one that shares
    nothing with it."""
    rows = [
        # doc 0 is the target slice (0 % 97 == 0)
        (0, "quantum flux capacitor resonance field", "en"),
        # raw doc with the target's vocabulary (bigrams included)
        (1, "quantum flux capacitor resonance", "en"),
        # raw doc fully disjoint from the target
        (2, "banana smoothie recipe blender", "en"),
        # raw doc mixing both
        (3, "quantum flux banana smoothie", "en"),
    ]
    d = _write_docs(spark, tmp_path, rows)
    w = {r["doc_id"]: r["log_weight"]
         for r in ql.q_dsir_weights(spark, d).collect()}
    assert set(w) == {1, 2, 3}  # target doc 0 never appears
    assert w[1] > w[3] > w[2]


def test_dsir_n_feats_is_unigrams_plus_bigrams(spark, tmp_path):
    rows = [
        (0, "t1 t2 t3", "en"),
        (1, "a b c d", "en"),   # 4 unigrams + 3 bigrams
        (2, "solo", "en"),      # 1 unigram, no bigram
    ]
    d = _write_docs(spark, tmp_path, rows)
    nf = {r["doc_id"]: r["n_feats"]
          for r in ql.q_dsir_weights(spark, d).collect()}
    assert nf == {1: 7, 2: 1}


# ---------------------------------------------------------------------
# dsir_select: top-K cut, rank order, deterministic tiebreak
# ---------------------------------------------------------------------

def test_dsir_select_takes_top_k_by_weight(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(ql, "DSIR_K", 2)
    rows = [
        (0, "alpha beta gamma delta", "en"),
        (1, "alpha beta gamma delta", "en"),  # identical to target
        (2, "alpha beta unrelated words", "en"),
        (3, "totally disjoint vocabulary here", "en"),
    ]
    d = _write_docs(spark, tmp_path, rows)
    sel = ql.q_dsir_select(spark, d).orderBy("sel_rank").collect()
    assert [r["doc_id"] for r in sel] == [1, 2]
    assert [r["sel_rank"] for r in sel] == [1, 2]
    w = {r["doc_id"]: r["log_weight"]
         for r in ql.q_dsir_weights(spark, d).collect()}
    assert sel[0]["log_weight"] == w[1] and sel[1]["log_weight"] == w[2]


def test_dsir_select_tie_breaks_on_doc_id(spark, tmp_path, monkeypatch):
    """Identical raw docs carry identical (rounded) weights; the cut
    inside the tie must fall deterministically on the smaller id."""
    monkeypatch.setattr(ql, "DSIR_K", 1)
    rows = [
        (0, "alpha beta gamma", "en"),
        (2, "alpha beta gamma", "en"),
        (1, "alpha beta gamma", "en"),
    ]
    d = _write_docs(spark, tmp_path, rows)
    sel = ql.q_dsir_select(spark, d).collect()
    assert [(r["doc_id"], r["sel_rank"]) for r in sel] == [(1, 1)]


# ---------------------------------------------------------------------
# hll_distinct: accuracy vs exact on the real testdata + determinism
# ---------------------------------------------------------------------

def test_hll_estimate_within_error_bound(spark):
    """m=256 gives ~6.5% relative standard error; assert every
    language's estimate lands within 4 sigma (26%) of the exact
    distinct-token count at sf0.001."""
    sf = "/root/testdata/sf0.001"
    est = {r["lang"]: r["est_distinct"]
           for r in ql.q_hll_distinct(spark, sf).collect()}
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    exact = {
        r["lang"]: r["n"]
        for r in docs.select(
            "lang", F.explode(normalized_tokens(F.col("text"))).alias("t")
        ).groupBy("lang").agg(F.countDistinct("t").alias("n")).collect()
    }
    assert set(est) == set(exact)
    for lang, n in exact.items():
        assert abs(est[lang] - n) / n < 0.26, (lang, est[lang], n)


def test_hll_register_merge_equals_whole_corpus(spark, tmp_path):
    """Mergeability — THE sketch property: max-combining two disjoint
    shards' register frames must reproduce the whole corpus's
    estimates exactly, so incremental/sharded corpus builds never
    rescan history."""
    rows = [(i, f"w{i} w{i + 1} w{i + 2} common", "en") for i in range(1, 41)]
    tmp_path.mkdir(exist_ok=True)
    d_all = (tmp_path / "all"); d_all.mkdir()
    d_a = (tmp_path / "a"); d_a.mkdir()
    d_b = (tmp_path / "b"); d_b.mkdir()
    docs_all = spark.read.parquet(
        f"{_write_docs(spark, d_all, rows)}/documents.parquet")
    docs_a = spark.read.parquet(
        f"{_write_docs(spark, d_a, rows[:20])}/documents.parquet")
    docs_b = spark.read.parquet(
        f"{_write_docs(spark, d_b, rows[20:])}/documents.parquet")

    merged = (
        ql.hll_register_frame(docs_a)
        .unionByName(ql.hll_register_frame(docs_b))
        .groupBy("lang", "reg")
        .agg(F.max("m").alias("m"))
    )
    got = sorted(map(tuple, ql.hll_estimate(merged).collect()))
    want = sorted(map(tuple, ql.hll_estimate(
        ql.hll_register_frame(docs_all)).collect()))
    assert got == want


def test_hll_deterministic_across_runs(spark):
    sf = "/root/testdata/sf0.001"
    a = sorted(map(tuple, ql.q_hll_distinct(spark, sf).collect()))
    b = sorted(map(tuple, ql.q_hll_distinct(spark, sf).collect()))
    assert a == b


def test_hll_stream_snapshot_equals_batch(spark, tmp_path):
    """The streamed register-merge drained over a two-batch drop must
    land the SAME per-language estimates as the batch query on the
    whole corpus — the mergeability contract, through the actual
    Structured Streaming plumbing."""
    from clinvar_pipeline_spark.streaming.corpus import (
        DOCUMENT_SCHEMA,
        hll_stream,
        read_document_stream,
    )

    rows1 = [(i, f"alpha w{i} w{i + 1} shared", "en", "s", 20)
             for i in range(1, 11)]
    rows2 = [(i, f"beta w{i} w{i + 3} shared", "de" if i % 2 else "en",
              "s", 20) for i in range(11, 21)]
    drop = tmp_path / "docs"

    def drain():
        q = hll_stream(
            read_document_stream(spark, str(drop)),
            str(tmp_path / "_hll_registers"),
            str(tmp_path / "hll_distinct"),
            str(tmp_path / "ckpt_hll"),
        )
        q.awaitTermination(120)

    # two sequential availableNow drains over a shared checkpoint so
    # the second provably runs the merge-with-prior-state path (one
    # drain over both files could land them in a single micro-batch)
    spark.createDataFrame(rows1, DOCUMENT_SCHEMA).coalesce(1).write.mode(
        "append").parquet(str(drop))
    drain()
    spark.createDataFrame(rows2, DOCUMENT_SCHEMA).coalesce(1).write.mode(
        "append").parquet(str(drop))
    drain()
    got = sorted(map(tuple, spark.read.parquet(
        str(tmp_path / "hll_distinct")).collect()))

    want = sorted(map(tuple, ql.hll_estimate(ql.hll_register_frame(
        spark.read.parquet(str(drop)))).collect()))
    assert got == want


# ---------------------------------------------------------------------
# dsir_resample: the Gumbel keys are exactly the documented function
# ---------------------------------------------------------------------

def test_dsir_resample_keys_match_python_reference(spark, tmp_path,
                                                   monkeypatch):
    """gumbel_key must equal round(log_weight - ln(-ln(u)), 4) with
    u = (md5-prefix(doc_id)%1e6 + 0.5)/1e6 — recomputed independently
    in pure Python — and the top-K cut must order by that key."""
    import hashlib
    import math

    monkeypatch.setattr(ql, "DSIR_K", 3)
    rows = [
        (0, "alpha beta gamma delta", "en"),
        (1, "alpha beta gamma delta", "en"),
        (2, "alpha beta unrelated words", "en"),
        (3, "totally disjoint vocabulary here", "en"),
        (4, "alpha gamma mixed disjoint", "en"),
    ]
    d = _write_docs(spark, tmp_path, rows)
    w = {r["doc_id"]: r["log_weight"]
         for r in ql.q_dsir_weights(spark, d).collect()}

    def key(doc_id):
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)
        u = (h % 1_000_000 + 0.5) / 1_000_000.0
        return round(w[doc_id] - math.log(-math.log(u)), 4)

    want = sorted(
        ((key(i), i) for i in w), key=lambda t: (-t[0], t[1])
    )[:3]
    got = ql.q_dsir_resample(spark, d).orderBy("sel_rank").collect()
    assert [(r["gumbel_key"], r["doc_id"]) for r in got] == want
    assert [r["sel_rank"] for r in got] == [1, 2, 3]


# ---------------------------------------------------------------------
# hll_overlap: inclusion-exclusion directional contracts
# ---------------------------------------------------------------------

def test_hll_overlap_identical_vocab_equals_single_estimate(spark,
                                                            tmp_path):
    """Two languages with IDENTICAL token sets have identical register
    frames, so est_union == est_a == est_b and the overlap estimate
    equals the single-language estimate exactly."""
    text = "red green blue cyan magenta yellow umber teal"
    rows = [(i, text, "en" if i % 2 else "de") for i in range(1, 21)]
    d = _write_docs(spark, tmp_path, rows)
    r = ql.q_hll_overlap(spark, d).collect()
    assert len(r) == 1
    row = r[0]
    assert (row["lang_a"], row["lang_b"]) == ("de", "en")
    assert row["est_a"] == row["est_b"] == row["est_union"]
    assert row["est_overlap"] == row["est_a"]


def test_hll_overlap_disjoint_vocab_near_zero(spark, tmp_path):
    """Disjoint vocabularies: the union estimate absorbs both sides,
    so inclusion-exclusion leaves only sketch noise — bounded well
    below either side's estimate."""
    rows = [(i, " ".join(f"en{i}w{j}" for j in range(6)), "en")
            for i in range(1, 41)]
    rows += [(i, " ".join(f"de{i}w{j}" for j in range(6)), "de")
             for i in range(41, 81)]
    d = _write_docs(spark, tmp_path, rows)
    row = ql.q_hll_overlap(spark, d).collect()[0]
    assert row["est_overlap"] <= 0.25 * min(row["est_a"], row["est_b"])


# ---------------------------------------------------------------------
# dsir_stream: the served weights equal the batch query
# ---------------------------------------------------------------------

def test_dsir_stream_equals_batch_query(spark, tmp_path):
    """Served DSIR scores over a file stream must hash-equal the
    batch dsir_weights query on the same corpus (same tokenizer,
    bucketing, rounding), through a frozen saved/loaded model."""
    from clinvar_pipeline_spark.streaming.corpus import (
        dsir_stream,
        load_dsir_model,
        read_document_stream,
        save_dsir_model,
        train_dsir_weights,
    )

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    w, wu = train_dsir_weights(docs)
    assert len(w) <= ql.DSIR_B
    save_dsir_model(spark, w, wu, str(tmp_path / "_dsir_model"))
    w2, wu2 = load_dsir_model(spark, str(tmp_path / "_dsir_model"))
    assert w2 == w and wu2 == wu

    q = (
        dsir_stream(
            read_document_stream(spark, f"{sf}/documents.parquet"),
            w2, wu2,
        )
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.read.parquet(
        str(tmp_path / "out")).collect()))
    want = sorted(map(tuple, ql.q_dsir_weights(spark, sf).collect()))
    assert got == want


def test_dsir_unseen_bucket_default(spark, tmp_path):
    """A post-training arrival whose features hash to buckets no
    training doc touched scores with the smoothed zero-count default,
    not a join dropout."""
    import math

    from clinvar_pipeline_spark.streaming.corpus import (
        dsir_stream,
        train_dsir_weights,
    )

    rows = [(0, "seed target text", "en"), (1, "plain raw text", "en")]
    d = _write_docs(spark, tmp_path, rows)
    docs = spark.read.parquet(f"{d}/documents.parquet")
    w, wu = train_dsir_weights(docs)
    new = spark.createDataFrame(
        [(5, "zzqx9 vvkm7 qqpl3", "en", "s", 17)],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    out = dsir_stream(new, w, wu).collect()
    assert len(out) == 1
    # 3 unigrams + 2 bigrams; every bucket may be seen or unseen, but
    # if all five are unseen the weight is exactly 5 * wu
    r = out[0]
    assert r["n_feats"] == 5
    seen = [b for b in w]  # sanity: tiny corpus -> sparse table
    assert len(seen) < 50
    # recompute expected in Python via the kernel's own hash rule
    import hashlib

    def bucket(f):
        return int(hashlib.md5(f.encode()).hexdigest()[:15], 16) % ql.DSIR_B

    toks = "zzqx9 vvkm7 qqpl3".split()
    feats = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    want = round(math.fsum(w.get(bucket(f), wu) for f in feats), 4)
    assert r["log_weight"] == want
