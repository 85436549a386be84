"""clinvar_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, DataFrame/Catalyst-first engine providing the query and
data-processing capabilities of the reference ClinVar ETL pipeline
(rat-genome-database/clinvar-pipeline), re-expressed Spark-first:

- Every per-row DB lookup in the reference becomes a (broadcast) join.
- Every hand-written diff-sync (insert/update/delete/match) becomes one
  generic full-outer-join classification operator (`operators.diff_sync`).
- Every TreeSet-sorted pipe-joined string becomes ArrayType internally,
  serialized with ``concat_ws('|', array_sort(...))`` at the boundary.
- The global "collection" passes become groupBy aggregations.
- The nightly batch becomes a pure snapshot→snapshot transformation.

On top of the reference surface, the engine ships large-scale
training-data-pipeline operators: deduplication (exact / MinHash-LSH /
SimHash / n-gram Jaccard), similarity search over embeddings, text
analysis (language-ID, quality scoring, token counting, fingerprinting),
multimodal column plumbing, and Structured-Streaming window analytics.
"""

__version__ = "0.1.0"
