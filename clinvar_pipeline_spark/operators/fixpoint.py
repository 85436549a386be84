"""Transitive / fixpoint resolution (F13, reference Dao.java:542-574).

The reference resolves obsolete ontology terms by following
``replaced_by`` synonyms recursively until a non-obsolete term is
reached. The new engine expresses this as a bounded pointer-doubling
join over a (src, dst) mapping table: each iteration composes the
mapping with itself, so chains of depth d resolve in O(log d)
iterations instead of d per-row recursive lookups.

Scale: the mapping is tiny relative to the fact tables (ontology
synonyms), so every join is a broadcast; the resolved map is computed
once per run and broadcast to consumers — the distributed analogue of
the reference's per-run HashMap cache.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_transitive(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """Resolve every ``src`` to the end of its ``src -> dst`` chain.

    ``edges`` must be functional (out-degree <= 1 per src, like the
    reference's replaced_by links). Cycles are cut by ``max_iter``
    (2^max_iter chain depth — the reference errors on unresolvable
    terms; we simply stop advancing). Returns (src, dst) with dst the
    terminal node of each chain.
    """
    m = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    for _ in range(max_iter):
        a, b = m.alias("a"), m.alias("b")
        nxt = a.join(b, F.col("a.dst") == F.col("b.src"), "left").select(
            F.col("a.src").alias("src"),
            F.coalesce(F.col("b.dst"), F.col("a.dst")).alias("dst"),
            F.col("b.dst").isNotNull().alias("_hop"),
        )
        nxt = nxt.localCheckpoint(eager=True)  # truncate doubling lineage
        progressed = nxt.agg(F.max("_hop")).first()[0]
        m = nxt.drop("_hop")
        if not progressed:
            break
    return m
