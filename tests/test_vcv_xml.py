"""Golden tests for the VCV XML extractor (S5 + S2 framing + S4
fixup). Pins document-order semantics: first-wins picks (primary RCV,
SO acc), last-wins setters (molecular consequence, ref/alt VCF), and
array order preservation through from_xml (SURVEY.md §7.3 risk (a))."""

import textwrap

import pytest

from clinvar_pipeline_spark.sources.vcv_xml import read_vcv_xml

HEADER = '<?xml version="1.0" encoding="UTF-8"?>\n<ClinVarVariationRelease ReleaseDate="2026-01-01">\n'
TRAILER = "</ClinVarVariationRelease>\n"

FULL_RECORD = textwrap.dedent("""\
    <VariationArchive Accession="VCV000000011" VariationID="11" RecordType="classified">
      <RecordStatus>current</RecordStatus>
      <Species>Homo sapiens</Species>
      <ClassifiedRecord>
        <SimpleAllele AlleleID="26042" VariationID="11">
          <Name>NM_014855.3(AP5Z1):c.80_83delinsTGCTGTAAACTGTAACTGTAAA</Name>
          <VariantType>Indel</VariantType>
          <OtherNameList><Name>AP5Z1, 4-BP DEL/22-BP INS</Name><Name>second-alt</Name></OtherNameList>
          <GeneList>
            <Gene Symbol="AP5Z1" GeneID="9907" HGNC_ID="HGNC:22197"/>
            <Gene Symbol="OTHER" GeneID="1111" HGNC_ID="HGNC:9999"/>
          </GeneList>
          <Location>
            <CytogeneticLocation>7p22.1</CytogeneticLocation>
            <SequenceLocation Assembly="GRCh38" Accession="NC_000007.14" Chr="7" start="4775623" stop="4775648" referenceAlleleVCF="GGAT" alternateAlleleVCF="TGCTGTAAACTGTAACTGTAAA"/>
            <SequenceLocation Assembly="GRCh37" Accession="NC_000007.13" Chr="7" start="4815254" stop="4815279" referenceAlleleVCF="GGAT2" alternateAlleleVCF="ALT2"/>
          </Location>
          <HGVSlist>
            <HGVS Type="coding"><NucleotideExpression><Expression>NM_014855.3:c.80_83del</Expression></NucleotideExpression>
              <MolecularConsequence Type="frameshift variant" ID="SO:0001589"/></HGVS>
            <HGVS Type="HGVS, protein, RefSeq"><ProteinExpression><Expression>NP_055670.1:p.Arg27fs</Expression></ProteinExpression>
              <MolecularConsequence Type="missense variant" ID="SO:0001583"/></HGVS>
          </HGVSlist>
          <XRefList>
            <XRef DB="OMIM" ID="613653.0001" Type="Allelic variant"/>
            <XRef DB="dbSNP" ID="397704705" Type="rs"/>
          </XRefList>
        </SimpleAllele>
        <RCVList>
          <RCVAccession Accession="RCV000000012">
            <ClassifiedConditionList><ClassifiedCondition>Hereditary spastic paraplegia 48</ClassifiedCondition></ClassifiedConditionList>
          </RCVAccession>
          <RCVAccession Accession="RCV000000013"/>
        </RCVList>
        <ClinicalAssertionList>
          <ClinicalAssertion>
            <ClinVarAccession SubmitterName="OMIM" OrgAbbreviation="OMIM"/>
            <Classification DateLastEvaluated="2010-06-29">
              <ReviewStatus>no assertion criteria provided</ReviewStatus>
              <GermlineClassification>Pathogenic</GermlineClassification>
              <Citation><ID Source="PubMed">20613862</ID><ID Source="DOI">10.1/x</ID></Citation>
            </Classification>
            <ObservedInList><ObservedIn><Method><MethodType>Literature only</MethodType></Method></ObservedIn></ObservedInList>
            <Comment>a note from OMIM</Comment>
          </ClinicalAssertion>
          <ClinicalAssertion>
            <ClinVarAccession SubmitterName="Paris Brain Institute" OrgAbbreviation="PBI"/>
            <AdditionalSubmitters><SubmitterDescription SubmitterName="Extra Lab"/></AdditionalSubmitters>
            <Classification DateLastEvaluated="2021-05-28">
              <ReviewStatus>criteria provided, single submitter</ReviewStatus>
              <SomaticClinicalImpact>Tier I</SomaticClinicalImpact>
            </Classification>
            <AttributeSet><Citation><ID Source="PubMed">33098801</ID></Citation></AttributeSet>
          </ClinicalAssertion>
        </ClinicalAssertionList>
        <TraitMappingList>
          <TraitMapping MappingRef="Preferred" MappingValue="Hereditary spastic paraplegia 48">
            <MedGen CUI="C3150901" Name="Hereditary spastic paraplegia 48"/>
          </TraitMapping>
          <TraitMapping MappingRef="XRef" MappingValue="OMIM:613647">
            <MedGen CUI="None" Name="unassigned"/>
          </TraitMapping>
        </TraitMappingList>
      </ClassifiedRecord>
    </VariationArchive>
""")

MULTI_ALLELE = """<VariationArchive Accession="VCV000000200" VariationID="200">
  <RecordStatus>current</RecordStatus><Species>Homo sapiens</Species>
  <ClassifiedRecord>
    <SimpleAllele AlleleID="1" VariationID="200"><Name>a1</Name></SimpleAllele>
    <SimpleAllele AlleleID="2" VariationID="200"><Name>a2</Name></SimpleAllele>
  </ClassifiedRecord>
</VariationArchive>
"""

GENOTYPE = """<VariationArchive Accession="VCV000000300" VariationID="300">
  <RecordStatus>current</RecordStatus><Species>Homo sapiens</Species>
  <ClassifiedRecord><Genotype VariationID="300"><SimpleAllele AlleleID="9" VariationID="301"/></Genotype></ClassifiedRecord>
</VariationArchive>
"""

HAPLOTYPE = """<VariationArchive Accession="VCV000000400" VariationID="400">
  <RecordStatus>current</RecordStatus><Species>Homo sapiens</Species>
  <ClassifiedRecord><Haplotype VariationID="400"><SimpleAllele AlleleID="8" VariationID="401"/></Haplotype></ClassifiedRecord>
</VariationArchive>
"""

# U+2212 minus in the name; non-current status; minimal content
MINUS_RECORD = """<VariationArchive Accession="VCV000000500" VariationID="500">
  <RecordStatus>replaced</RecordStatus><Species>Mus musculus</Species>
  <ClassifiedRecord>
    <SimpleAllele AlleleID="55" VariationID="500"><Name>NM_1:c.−45del</Name><VariantType>Deletion</VariantType></SimpleAllele>
  </ClassifiedRecord>
</VariationArchive>
"""


@pytest.fixture(scope="module")
def extracted(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("vcv") / "release.xml"
    p.write_text(
        HEADER + FULL_RECORD + MULTI_ALLELE + GENOTYPE + HAPLOTYPE + MINUS_RECORD + TRAILER,
        encoding="utf-8",
    )
    df = read_vcv_xml(spark, str(p))
    rows = {r["vcv_accession"]: r for r in df.collect()}
    assert len(rows) == 5
    return rows


def test_record_kinds(extracted):
    kinds = {k: v["record_kind"] for k, v in extracted.items()}
    assert kinds == {
        "VCV000000011": "simple",
        "VCV000000200": "multi_allele",
        "VCV000000300": "genotype",
        "VCV000000400": "haplotype",
        "VCV000000500": "simple",
    }


def test_full_record_fields(extracted):
    r = extracted["VCV000000011"]
    assert r["allele_id"] == "26042"
    assert r["variation_id"] == "11"
    assert r["variant_type"] == "indel"
    assert r["name"].startswith("NM_014855.3(AP5Z1)")
    # first-wins (O4): first OtherName, first SO acc, first RCV
    assert r["alt_name"] == "AP5Z1, 4-BP DEL/22-BP INS"
    assert r["so_acc_xml"] == "SO:0001589"
    assert r["rcv_accessions"] == ["RCV000000012", "RCV000000013"]
    # last-wins setters: molecular consequence, ref/alt VCF
    assert r["molecular_consequence"] == "missense variant"
    assert r["ref_nuc"] == "GGAT2"
    assert r["var_nuc"] == "ALT2"
    # document order of arrays
    assert [g["symbol"] for g in r["genes"]] == ["AP5Z1", "OTHER"]
    assert [loc["assembly"] for loc in r["locations"]] == ["GRCh38", "GRCh37"]
    assert r["cyto_locations"] == ["7p22.1"]
    assert r["classified_condition"] == "Hereditary spastic paraplegia 48"


def test_hgvs_pairs_normalized(extracted):
    r = extracted["VCV000000011"]
    hgvs = [(h["type"], h["expression"]) for h in r["hgvs"]]
    # "HGVS, protein, RefSeq" -> "protein_refseq" (Parser.java:195-197)
    assert hgvs == [
        ("coding", "NM_014855.3:c.80_83del"),
        ("protein_refseq", "NP_055670.1:p.Arg27fs"),
    ]


def test_xrefs(extracted):
    r = extracted["VCV000000011"]
    assert [(x["db"], x["id"]) for x in r["xrefs"]] == [
        ("OMIM", "613653.0001"),
        ("dbSNP", "397704705"),
    ]


def test_assertions(extracted):
    r = extracted["VCV000000011"]
    a0, a1 = r["assertions"]
    assert a0["submitter"] == "OMIM"
    assert a0["classification"] == "pathogenic"
    assert a0["classification_kind"] == "GermlineClassification"
    assert a0["review_status"] == "no assertion criteria provided"
    assert a0["date_last_evaluated"] == "2010-06-29"
    assert a0["method_types"] == ["literature only"]
    assert a0["comments"] == ["a note from OMIM"]
    assert a0["pmids"] == ["20613862"]  # DOI filtered out
    assert a1["classification"] == "somatic clinical impact: tier i"
    assert a1["classification_kind"] == "SomaticClinicalImpact"
    assert a1["pmids"] == ["33098801"]  # from AttributeSet citation


def test_trait_mappings(extracted):
    r = extracted["VCV000000011"]
    tm = r["trait_mappings"]
    assert tm[0]["mapping_ref"] == "Preferred"
    assert tm[0]["medgen_cui"] == "C3150901"
    assert tm[1]["mapping_value"] == "OMIM:613647"


def test_unicode_minus_fixup_and_guards(extracted):
    r = extracted["VCV000000500"]
    assert "−" not in r["name"]
    assert "-45del" in r["name"]
    # F3 guard inputs surface as columns
    assert r["record_status"] == "replaced"
    assert r["species"] == "Mus musculus"
