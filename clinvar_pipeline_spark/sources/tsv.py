"""TSV concept-map source (S8, VariantAnnotator.java:636-688).

The reference downloads NCBI's ``gene_condition_source_id`` file and
parses it by hand (8 tab columns, '#' comment lines). Here it is a
declarative csv scan — header-less, tab-separated, comments dropped by
the reader, schema declared (no inference pass over the file).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CONCEPT_TO_OMIM_SCHEMA = T.StructType(
    [
        T.StructField("gene_id", T.StringType()),
        T.StructField("gene_symbol", T.StringType()),
        T.StructField("concept_id", T.StringType()),
        T.StructField("disease_name", T.StringType()),
        T.StructField("source_name", T.StringType()),
        T.StructField("source_id", T.StringType()),
        T.StructField("disease_mim", T.StringType()),
        T.StructField("last_updated", T.StringType()),
    ]
)


def read_concept_to_omim(spark: SparkSession, path: str) -> DataFrame:
    """(concept CUI, gene) -> OMIM id rows, filtered to usable entries
    (MIM number present). The result is small (<1M rows) — consumers
    broadcast it (J8)."""
    df = spark.read.csv(
        path, sep="\t", comment="#", header=False, schema=CONCEPT_TO_OMIM_SCHEMA
    )
    return df.filter(
        F.col("disease_mim").isNotNull() & (F.trim("disease_mim") != "")
    )
