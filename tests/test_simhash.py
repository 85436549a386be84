"""SimHash operator coverage (previously attested rows-only + untested):
exact agreement with an independent pure-Python reference, determinism,
and the semantic property that near-duplicate documents land at small
Hamming distance while unrelated documents don't."""

import hashlib
import re

from pyspark.sql import functions as F

from clinvar_pipeline_spark.operators.dedup import simhash_signatures

_TOK = re.compile(r"[a-z0-9]+")


def _ref_simhash(text: str) -> int:
    """Independent reference implementation of the kernel's contract:
    distinct lowercase alnum tokens, md5-prefix 64-bit per token (the
    engine-portable family — late r6, was blake2b), majority vote per
    bit over positions 0..62 (sign bit stays clear)."""
    toks = set(_TOK.findall((text or "").lower()))
    if not toks:
        return 0
    sig = 0
    hashes = [
        int(hashlib.md5(t.encode("utf-8")).hexdigest()[:16], 16)
        for t in toks
    ]
    for bit in range(63):
        votes = sum((h >> bit) & 1 for h in hashes)
        if votes * 2 > len(toks):
            sig |= 1 << bit
    return sig


def _hamming(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def test_simhash_matches_pure_python_reference(spark):
    texts = [
        (1, "The quick brown fox jumps over the lazy dog"),
        (2, "pack my box with five dozen liquor jugs!"),
        (3, ""),
        (4, None),
        (5, "Numbers 123 and CASE folding MiXeD"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        r["id"]: r["simhash"]
        for r in simhash_signatures(df, "doc_id", "text").collect()
    }
    for i, t in texts:
        assert got[i] == _ref_simhash(t or ""), i


def test_simhash_neardup_pairs_match_bruteforce_contract(spark):
    """simhash_neardup_pairs == brute force over signatures with the
    operator's exact contract: hamming <= max_hamming AND >= 1 agreeing
    16-bit chunk (the pigeonhole candidate condition)."""
    import itertools

    from clinvar_pipeline_spark.operators.dedup import simhash_neardup_pairs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in simhash_neardup_pairs(
            docs, "doc_id", "text", max_hamming=8, blocks=4
        ).collect()
    }
    sig = {
        r["id"]: r["simhash"]
        for r in simhash_signatures(docs, "doc_id", "text").collect()
    }

    def chunks(v):
        return [(v >> (i * 16)) & 0xFFFF for i in range(4)]

    want = set()
    for a, b in itertools.combinations(sorted(sig), 2):
        h = _hamming(sig[a], sig[b])
        if h <= 8 and any(x == y for x, y in zip(chunks(sig[a]), chunks(sig[b]))):
            want.add((a, b, h))
    assert got == want
    assert want, "fixture must contain simhash near-dups"
    # pigeonhole guarantee: every pair with hamming <= 3 IS in the set
    for a, b in itertools.combinations(sorted(sig), 2):
        if _hamming(sig[a], sig[b]) <= 3:
            assert (a, b, _hamming(sig[a], sig[b])) in got


def test_simhash_near_dups_have_small_hamming_distance(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sig = {
        r["id"]: r["simhash"]
        for r in simhash_signatures(docs, "doc_id", "text").collect()
    }
    # planted near-duplicates: pairs sharing a 3-token prefix key per
    # the exact_dedup contract are verbatim-ish copies
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    import itertools

    near, far = [], []
    ids = sorted(sig)
    for a, b in itertools.combinations(ids, 2):
        ta, tb = (texts[a] or ""), (texts[b] or "")
        sa = set(_TOK.findall(ta.lower()))
        sb = set(_TOK.findall(tb.lower()))
        if not sa or not sb:
            continue
        j = len(sa & sb) / len(sa | sb)
        d = _hamming(sig[a], sig[b])
        if j >= 0.8:
            near.append(d)
        elif j <= 0.1:
            far.append(d)
    assert near and far, "fixture must contain both pair classes"
    # deterministic on the fixed fixture + the md5 family: measured
    # near max=20 / mean 8.0 vs far min=18 / mean 28.2 — the bulk of
    # the two classes separates by ~20 bits (random 63-bit pairs
    # concentrate near 31.5); the extreme tails touch (20 vs 18),
    # which is simhash's nature, not a defect — the near-dup JOIN
    # carries an exact Hamming verify for exactly this reason
    assert max(near) <= 20, max(near)
    assert min(far) >= 18, min(far)
    assert sum(near) / len(near) <= 10, sum(near) / len(near)
    assert sum(far) / len(far) >= 25, sum(far) / len(far)
