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
    "drug response": 20,
    "confers sensitivity": 30,
    "risk factor": 40,
    "association": 50,
    "affects": 60,
    "conflicting interpretations of pathogenicity": 65,
    "conflicting data from submitters": 70,
    "uncertain significance": 80,
    "protective": 90,
    "likely benign": 100,
    "benign": 110,
    "no interpretation for the single variant": 115,
    "association not found": 120,
    "not provided": 2000,
    "other": 1000,
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
XREF_DB_TO_XDB_KEY: dict[str, int] = {
    "OMIM": 53,
    "dbSNP": 48,
    "MedGen": 54,
    "Orphanet": 55,
    "GeneReviews": 66,
    "PubMed": 2,
    "ClinVar": 52,
    "UniProtKB": 14,
    "MONDO": 145,
    "Office of Rare Diseases": 62,
    "Genetic Testing Registry (GTR)": 74,
    "OMIM phenotypic series": 93,
    "Human Phenotype Ontology": 166,
}
XREF_DB_IGNORED: set[str] = {
    "Genetic Alliance",
    "SNOMED CT",
    "GeneTests",
    "MeSH",
    "EBI",
    "Tumor Gene Database",
}

# --- Variant type → Sequence Ontology accession (Parser.java:610-702).
VARIANT_TYPE_TO_SO: dict[str, str] = {
    "single nucleotide variant": "SO:0001483",
    "deletion": "SO:0000159",
    "duplication": "SO:1000035",
    "insertion": "SO:0000667",
    "indel": "SO:1000032",
    "inversion": "SO:1000036",
    "copy number gain": "SO:0001742",
    "copy number loss": "SO:0001743",
    "microsatellite": "SO:0000289",
    "translocation": "SO:0000199",
    "tandem duplication": "SO:1000173",
    "complex": "SO:0001784",
    "fusion": "SO:0000806",
    "protein only": "SO:0001580",
    "variation": "SO:0001060",
}
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
