"""Fuzz the VCV XML front door (S2 framing + S4 fixup + S5 parse).

The golden tests (test_vcv_xml.py) pin correct extraction on
well-formed releases; nothing exercised MALFORMED input. The contract
under corruption mirrors the reference's DryRun canary philosophy
(DryRun.java:98-135) and the csvq/warc front doors: never crash a
task, and conserve the record count — every framed fragment yields
exactly one output row (a corrupt one surfaces as null fields /
record_kind, so downstream counters see every drop; nothing silently
multiplies or vanishes between framing and extraction).

Framing conservation is checked against a pure-Python byte-level
mirror of the frame rule: split on the closing tag, count segments
containing an opening tag — exactly what the lineSep text scan +
instr guard compute distributively.

Hypothesis generates corrupted releases from the golden record pool:
truncation mid-record, illegal control bytes, invalid UTF-8
sequences, duplicated/nested SimpleAllele and VariationArchive
elements, broken attribute quoting, dropped closing tags, unicode
minus injection, and random inter-record junk. Each example embeds
one UNTOUCHED sentinel record and asserts it still extracts cleanly —
corruption must stay isolated to the record it hits.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.test_vcv_xml import (
    FULL_RECORD,
    GENOTYPE,
    HAPLOTYPE,
    HEADER,
    MINUS_RECORD,
    MULTI_ALLELE,
    TRAILER,
)

SENTINEL = """<VariationArchive Accession="VCV000999999" VariationID="999999">
  <RecordStatus>current</RecordStatus><Species>Homo sapiens</Species>
  <ClassifiedRecord>
    <SimpleAllele AlleleID="77" VariationID="999999"><Name>sentinel</Name><VariantType>SNV</VariantType></SimpleAllele>
  </ClassifiedRecord>
</VariationArchive>
"""

BASE_RECORDS = [FULL_RECORD, MULTI_ALLELE, GENOTYPE, HAPLOTYPE, MINUS_RECORD]

ILLEGAL_BYTES = [b"\x00", b"\x08", b"\x1b", b"\x80", b"\xe2\x88", b"\xff\xfe"]


def _truncate(doc: bytes, frac: float) -> bytes:
    # cut inside the record body (never before the opening tag — that
    # is the "no record here" case, covered by junk segments)
    start = doc.find(b"<VariationArchive")
    cut = start + max(1, int((len(doc) - start) * frac))
    return doc[:cut]


def _inject(doc: bytes, frac: float, payload: bytes) -> bytes:
    pos = max(doc.find(b">") + 1, int(len(doc) * frac))
    return doc[:pos] + payload + doc[pos:]


def _dup_allele(doc: bytes, n: int) -> bytes:
    payload = b'<SimpleAllele AlleleID="1" VariationID="1"><Name>dup</Name></SimpleAllele>' * n
    return _inject(doc, 0.5, payload)


def _nest_archive(doc: bytes, frac: float) -> bytes:
    return _inject(doc, frac, b'<VariationArchive Accession="VCV_NESTED">')


def _break_attr(doc: bytes) -> bytes:
    return doc.replace(b'Accession="', b"Accession=", 1)


def _drop_closer(doc: bytes) -> bytes:
    return doc.replace(b"</SimpleAllele>", b"", 1).replace(
        b"</ClassifiedRecord>", b"", 1
    )


def _unicode_minus(doc: bytes) -> bytes:
    return doc.replace(b"<Name>", "<Name>−x−".encode("utf-8"), 1)


CORRUPTIONS = st.sampled_from(
    [
        ("truncate", _truncate),
        ("illegal", None),  # handled inline (needs the byte payload)
        ("dup_allele", _dup_allele),
        ("nest", _nest_archive),
        ("attr", _break_attr),
        ("close", _drop_closer),
        ("minus", _unicode_minus),
    ]
)


@st.composite
def corrupted_release(draw) -> bytes:
    parts = [HEADER.encode("utf-8")]
    n_docs = draw(st.integers(min_value=1, max_value=3))
    for _ in range(n_docs):
        doc = draw(st.sampled_from(BASE_RECORDS)).encode("utf-8")
        for _ in range(draw(st.integers(min_value=0, max_value=2))):
            name, op = draw(CORRUPTIONS)
            frac = draw(st.floats(min_value=0.05, max_value=0.95))
            if name == "truncate":
                doc = _truncate(doc, frac)
            elif name == "illegal":
                doc = _inject(doc, frac, draw(st.sampled_from(ILLEGAL_BYTES)))
            elif name in ("dup_allele",):
                doc = _dup_allele(doc, draw(st.integers(min_value=1, max_value=4)))
            elif name == "nest":
                doc = _nest_archive(doc, frac)
            else:
                doc = op(doc)
        parts.append(doc)
        # inter-record junk: outside any record, must be dropped by the
        # instr guard without shifting counts
        junk = draw(
            st.binary(max_size=40).filter(
                lambda b: b"<VariationArchive" not in b
                and b"</VariationArchive>" not in b
            )
        )
        parts.append(junk)
    # a bare closing tag fences the sentinel off from any truncated
    # record before it (a record that lost its closer absorbs the next
    # record into its fragment — correct framing behavior, but the
    # sentinel assertions need the sentinel in its OWN fragment). When
    # the previous record closed properly this adds an empty segment
    # with no opening tag, which the instr guard drops — count-neutral
    # either way, and the mirror runs on the final bytes regardless.
    parts.append(b"</VariationArchive>")
    parts.append(SENTINEL.encode("utf-8"))
    parts.append(TRAILER.encode("utf-8"))
    return b"".join(parts)


def _expected_fragments(data: bytes) -> int:
    """Mirror of read_vcv_fragments' frame rule: byte-level split on
    the closing tag (the lineSep scan splits raw bytes), then a
    replacement-decoding pass before the tag search (the reader's
    encode/decode roundtrip — invalid UTF-8 becomes U+FFFD, so a
    bit-rotted lead byte can never swallow the '<' of the tag)."""
    return sum(
        "<VariationArchive" in seg.decode("utf-8", errors="replace")
        for seg in data.split(b"</VariationArchive>")
    )


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=corrupted_release())
def test_fuzz_conservation(spark, tmp_path_factory, data):
    from clinvar_pipeline_spark.sources.vcv_xml import (
        extract_records,
        parse_vcv,
        read_vcv_fragments,
    )

    p = tmp_path_factory.mktemp("fuzz") / "release.xml"
    p.write_bytes(data)

    frags = read_vcv_fragments(spark, str(p))
    n_frags = frags.count()
    assert n_frags == _expected_fragments(data)

    rows = extract_records(parse_vcv(frags)).collect()  # must not raise
    # conservation: one output row per framed fragment, corrupt or not
    assert len(rows) == n_frags

    # the untouched sentinel still extracts cleanly — corruption is
    # isolated to the fragment it hit (records are independent rows)
    sent = [r for r in rows if r["vcv_accession"] == "VCV000999999"]
    assert len(sent) == 1
    assert sent[0]["record_kind"] == "simple"
    assert sent[0]["record_status"] == "current"


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    name=st.text(
        alphabet=st.characters(
            blacklist_categories=("Cs",),  # no lone surrogates in utf-8
            blacklist_characters="<>&\x00",
        ),
        max_size=40,
    )
)
def test_fuzz_unicode_names(spark, tmp_path_factory, name):
    """Arbitrary unicode content (astral planes, combining marks, the
    U+2212 minus) round-trips through framing + parse without a crash;
    U+2212 always arrives as '-' (S4)."""
    from clinvar_pipeline_spark.sources.vcv_xml import read_vcv_xml

    doc = SENTINEL.replace("<Name>sentinel</Name>", f"<Name>x{name}</Name>")
    p = tmp_path_factory.mktemp("fuzzu") / "release.xml"
    p.write_text(HEADER + doc + TRAILER, encoding="utf-8")
    rows = read_vcv_xml(spark, str(p)).collect()
    assert len(rows) == 1
    got = rows[0]["name"]
    if got is not None:
        assert "−" not in got
