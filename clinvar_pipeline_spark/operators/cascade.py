"""Priority-cascade lookup with ambiguity guard.

Models the reference's staged lookups (J1 Dao.java:80-127: RCV → symbol
→ name; J2 GeneAssociations.java:38-72: gene-id → symbol): try each
stage in order, a stage matching **more than one** row counts as
no-match (with its own counter), first successful stage wins.

Spark-first shape: every stage is a broadcast-able left join against a
pre-deduplicated lookup (multiplicity computed by a groupBy, not a
per-row query); the cascade is a ``coalesce`` across stage results plus
a ``matched_by`` provenance column. No per-row lookups anywhere.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class CascadeStage:
    """One lookup stage: join ``lookup`` on base.probe_col == lookup.key_col,
    yielding lookup.value_col. Stages with a >1-row key are ambiguous →
    treated as no-match (Dao.java:103-124 semantics)."""

    name: str
    lookup: DataFrame
    key_col: str
    probe_col: str
    value_col: str


def cascade_lookup(
    base: DataFrame,
    stages: Sequence[CascadeStage],
    result_col: str = "matched_value",
    provenance_col: str = "matched_by",
    broadcast: bool = True,
) -> DataFrame:
    """Left-join each stage in priority order; first unambiguous hit
    wins. Adds ``result_col`` (the matched value, null if no stage hit)
    and ``provenance_col`` (stage name, or 'AMBIGUOUS_<stage>' if the
    first hitting stage was ambiguous — mirroring the reference's
    distinct multi-match counters, or null)."""
    out = base
    val_cols: list[str] = []
    amb_cols: list[str] = []
    for st in stages:
        # multiplicity pre-aggregation: one row per key, ambiguity flag
        lk = (
            st.lookup.groupBy(F.col(st.key_col).alias(f"_k_{st.name}"))
            .agg(
                F.count(F.lit(1)).alias(f"_n_{st.name}"),
                F.min(st.value_col).alias(f"_v_{st.name}"),
            )
        )
        if broadcast:
            lk = F.broadcast(lk)
        out = out.join(
            lk, on=out[st.probe_col] == lk[f"_k_{st.name}"], how="left"
        ).drop(f"_k_{st.name}")
        # ambiguous (>1) → value suppressed, flag kept
        out = out.withColumn(
            f"_amb_{st.name}", F.coalesce(F.col(f"_n_{st.name}") > 1, F.lit(False))
        ).withColumn(
            f"_hit_{st.name}",
            F.when(F.col(f"_n_{st.name}") == 1, F.col(f"_v_{st.name}")),
        )
        val_cols.append(f"_hit_{st.name}")
        amb_cols.append(f"_amb_{st.name}")

    result = F.coalesce(*[F.col(c) for c in val_cols], F.lit(None))
    prov: Column = F.lit(None).cast("string")
    # build provenance: first stage whose hit is non-null; if none hit,
    # first ambiguous stage is reported as AMBIGUOUS_<stage>
    for st, vc in zip(reversed(stages), reversed(val_cols)):
        prov = F.when(F.col(vc).isNotNull(), F.lit(st.name)).otherwise(prov)
    amb_prov: Column = F.lit(None).cast("string")
    for st, ac in zip(reversed(stages), reversed(amb_cols)):
        amb_prov = F.when(F.col(ac), F.lit(f"AMBIGUOUS_{st.name}")).otherwise(amb_prov)
    prov = F.coalesce(prov, amb_prov)

    out = out.withColumn(result_col, result).withColumn(provenance_col, prov)
    drop = [c for st in stages for c in (f"_n_{st.name}", f"_v_{st.name}", f"_amb_{st.name}", f"_hit_{st.name}")]
    return out.drop(*drop)
