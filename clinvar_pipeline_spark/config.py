"""Engine configuration constants (domain semantics from the reference).

Each constant cites the reference file:line it models; values are part of
the observable contract (golden outputs depend on them), the code around
them is all-new Spark.
"""

from __future__ import annotations

# --- Column byte budgets (Oracle VARCHAR2 parity; Dao.java:183-189,
# Manager.java:148-183). Keys are snapshot column names; values are the
# UTF-8 byte budgets enforced by the byte-trim expression (functions.text).
COLUMN_BYTE_BUDGETS: dict[str, int] = {
    "notes": 4000,
    "submitter": 4000,
    "trait_name": 4000,
    "clinical_significance": 1000,
    "review_status": 1000,
    "method_type": 200,
    "molecular_consequence": 200,
    "age_of_onset": 200,
    "prevalence": 200,
}
TRIM_SUFFIX = " ..."

# --- Annotation field width packing (AnnotCache.java:136-167,213-244).
XREF_SOURCE_WIDTH = 4000
WITH_INFO_WIDTH = 1700

# --- Stale-delete guard thresholds (AppConfigure.xml:14,46;
# Dao.java:409-436,690-729).
STALE_XDB_DELETE_THRESHOLD = 0.08
STALE_ANNOT_DELETE_THRESHOLD = 0.05

# --- Clinical-significance severity ranking (QC.java:160-197).
# Lower rank = more severe; unknown values sort after known ones but
# before 'not provided'. The merged pipe-set is ordered by (rank, value).
CLINSIG_RANK: dict[str, int] = {
    "pathogenic": 0,
    "likely pathogenic": 10,
    "risk factor": 20,
    "association": 30,
    "established risk allele": 31,
    "likely risk allele": 32,
    "oncogenic": 33,
    "affects": 35,
    "likely oncogenic": 37,
    "benign": 40,
    "likely benign": 50,
    "conflicting interpretations of pathogenicity": 60,
    "somatic clinical impact: tier i - strong": 61,
    "somatic clinical impact: tier ii - potential": 62,
    "somatic clinical impact: tier iii - unknown": 63,
    "somatic clinical impact: tier iv - benign": 64,
    "drug response": 70,
    "protective": 80,
    "evidence_only": 81,
    "confers sensitivity": 85,
    "uncertain risk allele": 87,
    "vus-high": 88,
    "vus-mid": 89,
    "uncertain significance": 90,
    "vus-low": 91,
    "low penetrance": 95,
    "conflicting data from submitters": 100,
    "association not found": 110,
    "no classifications from unflagged records": 115,
    "other": 120,
    "not provided": 2000,
}
CLINSIG_UNKNOWN_RANK = 999

# --- Assembly name → map_key (MapPositions.java:49-64).
ASSEMBLY_TO_MAP_KEY: dict[str, int] = {
    "NCBI36": 13,
    "GRCh37": 17,
    "GRCh38": 38,
}

# --- XRef DB name → xdb_key dispatch (Parser.java:485-585). A mapping
# table broadcast-joined against extracted xrefs; names absent here fall
# through to the unknown-db counter unless explicitly ignored.
# Plain key dispatch; OMIM allele-split (53 + 6), 'OMIM phenotypic
# series' MIM: prefix (66), dbSNP rs-type check (48) and Orphanet ORPHA
# strip (62) are transform rules applied with the join (plans/load.py).
XREF_DB_TO_XDB_KEY: dict[str, int] = {
    "OMIM": 6,
    "OMIM phenotypic series": 66,
    "dbSNP": 48,
    "MedGen": 54,
    "MONDO": 145,
    "MeSH": 47,
    "MSH": 47,
    "HP": 166,
    "HPO": 166,
    "Human Phenotype Ontology": 166,
    "EFO": 93,
    "EFO: The Experimental Factor Ontology": 93,
    "NCI": 74,
    "COSMIC": 45,
    "Orphanet": 62,
    "SNOMED CT": 55,
}
XDB_KEY_OMIM_ALLELE = 53
XDB_KEY_PUBMED = 2
XDB_KEY_NCBI_GENE = 3  # rgdcore XdbId.XDB_KEY_NCBI_GENE
XDB_KEY_HGNC = 21  # rgdcore XdbId.XDB_KEY_HGNC
XDB_KEY_CLINVAR = 52
XDB_KEY_MEDGEN = 54
XREF_DB_IGNORED: set[str] = {
    "ADAM",
    "BRCA1-HCI",
    "Breast Cancer Information Core (BIC) (BRCA1)",
    "Breast Cancer Information Core (BIC) (BRCA2)",
    "ClinGen",
    "ClinPGx Clinical Annotation",
    "ClinVar",
    "dbRBC",
    "dbVar",
    "Decipher",
    "GeneReviews",
    "Genetic Alliance",
    "GeneTests",
    "Genetic Testing Registry (GTR)",
    "HBVAR",
    "LOVD 3",
    "MESH",
    "MYBPC3 homepage - Leiden Muscular Dystrophy pages",
    "NCBI for submitter",
    "New Leaf Center",
    "PharmGKB Clinical Annotation",
    "RettBASE (CDKL5)",
    "Tuberous sclerosis database (TSC1)",
    "Tuberous sclerosis database (TSC2)",
    "UniProtKB",
    "UniProtKB/Swiss-Prot",
}
# Junk-db prefix/substring filters (silently dropped before dispatch)
XREF_DB_JUNK_PATTERNS: tuple[str, ...] = (
    ", ",  # contains
    " @ LOVD",  # contains
)
XREF_DB_JUNK_PREFIXES: tuple[str, ...] = (
    "Leiden Muscular Dystrophy (",
    "GenomeConnect",
)

# --- Variant type → Sequence Ontology accession (Parser.java:610-702).
VARIANT_TYPE_TO_SO: dict[str, str] = {
    "deletion": "SO:0000159",
    "duplication": "SO:1000035",
    "insertion": "SO:0000667",
    "indel": "SO:1000032",
    "single nucleotide variant": "SO:0001483",
    "copy number gain": "SO:0001742",
    "copy number loss": "SO:0001743",
    "inversion": "SO:1000036",
    "microsatellite": "SO:0000289",
    "structural variant": "SO:0001537",
    "fusion": "SO:0000806",
    "translocation": "SO:0000199",
    "complex": "SO:0001784",
    "tandem duplication": "SO:1000173",
    "protein only": "SO:0001816",  # non-synonymous change
}
# 'variation' subcases (Parser.java:664-693): molecular consequence →
# SO, else alt-name exon-duplication heuristic, else sequence alteration
VARIATION_MC_TO_SO: dict[str, str] = {
    "synonymous variant": "SO:0001819",
    "missense variant": "SO:0001583",
    "exon loss": "SO:0001572",
}
SO_SEQUENCE_ALTERATION = "SO:0001059"
SO_DUPLICATION = "SO:1000035"
# obsolete SO with no replacement, dropped pre-derivation (Parser.java:612-616)
SO_OBSOLETE_NO_REPLACEMENT = "SO:1000064"
SO_OBSOLETE_HARDCODED: dict[str, str] = {"SO:1000184": "SO:0001572"}

# --- Annotator compliance sets (AppConfigure.xml:49-78,
# VariantAnnotator.java:245-266).
ANNOTATABLE_VARIANT_TYPES: set[str] = {
    "single nucleotide variant",
    "deletion",
    "duplication",
    "insertion",
}
EXCLUDED_CLINSIG: set[str] = {
    "benign",
    "likely benign",
    "uncertain significance",
    "not provided",
}
EXCLUDED_CONDITION_NAMES: set[str] = {
    "not provided",
    "not specified",
    "none provided",
    "see cases",
    "variant of unknown significance",
}
UNCERTAIN_EXCLUDED_SUBMITTER = "Leeds Institute of Molecular Medicine (LIMM)"

# --- Species keys (rgdcore convention).
SPECIES_HUMAN = 3
SEARCHABLE_SPECIES_KEYS: set[int] = {1, 2, 3}  # rat, mouse, human
