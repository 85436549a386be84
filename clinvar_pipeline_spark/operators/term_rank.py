"""J14 duplicate-term rank-pick (reference TermNameMatcher.java:33-133,
188-213).

When one normalized term name maps to several ontology terms, the
reference adjudicates instead of just reporting:

- a name arriving via a ``narrow_synonym``/``broad_synonym`` is
  demoted — the (more specific) term already indexed wins
  (TermNameMatcher.java:96-100);
- if the conflicting terms sit on SEPARATE ontology branches (neither
  is an ancestor of the other), both are kept
  (TermNameMatcher.java:104-109, 129-133);
- otherwise the higher-ranked term wins: more annotated objects for
  term+children, then more child terms, then fewer parent terms
  (TermNameMatcher.java:198-213).

The reference walks a HashMap sequentially, so its outcome can depend
on iteration order for 3+-way collisions. This operator is the
order-independent set formulation: within a group, a candidate is
eliminated iff some strictly higher-ranked candidate shares its
ontology branch. For 2-way collisions (the overwhelming case) this is
exactly the reference policy; for n-way groups it is its deterministic
closure.

Scale: duplicate groups are a vanishing fraction of an ontology and
group sizes are tiny, so the within-group self-join is narrow; the
ancestor closure is the only potentially large input and is joined on
(desc, anc) keys. All joins hash-partition on group/acc keys — no
driver loops, no windows over a single partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pick_duplicate_terms(
    candidates: DataFrame,
    term_stats: DataFrame,
    ancestors: DataFrame,
) -> DataFrame:
    """Adjudicate duplicate-name groups.

    Parameters
    ----------
    candidates : (group_key string, acc, is_narrow_broad boolean)
        One row per (normalized name, term) pair; ``is_narrow_broad``
        marks names contributed by narrow/broad synonyms.
    term_stats : (acc, annot_count, child_count, parent_count)
        TermWithStats equivalents (annotated-object count for
        term+children, child term count, parent term count).
    ancestors : (acc, anc)
        Strict-ancestor closure pairs (anc is an ancestor of acc).
        Build with operators.fixpoint pointer-doubling or any closure.

    Returns (group_key, acc, annot_count, child_count, parent_count)
    for every candidate that SURVIVES adjudication in a group that had
    more than one distinct term.
    """
    cand = candidates.select("group_key", "acc", "is_narrow_broad")

    grp = (
        cand.groupBy("group_key")
        .agg(
            F.countDistinct("acc").alias("_n_acc"),
            F.max(~F.col("is_narrow_broad")).alias("_has_plain"),
        )
        .filter(F.col("_n_acc") > 1)
    )
    # narrow/broad demotion: drop nb candidates when a plain one exists
    kept = (
        cand.join(grp, "group_key")
        .filter(~(F.col("is_narrow_broad") & F.col("_has_plain")))
        .drop("_n_acc", "_has_plain")
        .join(term_stats, "acc")
    )

    # rank key: lower sorts better (annot desc, child desc, parent asc,
    # acc asc as the total-order tiebreak — struct comparison is
    # lexicographic in both Spark and the SQL oracle)
    rank = F.struct(
        (-F.col("annot_count")).alias("r1"),
        (-F.col("child_count")).alias("r2"),
        F.col("parent_count").alias("r3"),
        F.col("acc").alias("r4"),
    )
    # consumed three times (both pair sides + the final anti-join base);
    # Spark has no cross-branch common-subplan elimination, so persist
    ranked = kept.withColumn("_rank", rank).persist()

    a = ranked.select(
        F.col("group_key"),
        F.col("acc").alias("_a_acc"),
        F.col("_rank").alias("_a_rank"),
    )
    b = ranked.select(
        F.col("group_key"),
        F.col("acc").alias("_b_acc"),
        F.col("_rank").alias("_b_rank"),
    )
    pairs = a.join(b, "group_key").filter(
        (F.col("_a_acc") != F.col("_b_acc"))
        & (F.col("_a_rank") < F.col("_b_rank"))
    )

    anc = ancestors.select(F.col("acc").alias("_d"), F.col("anc").alias("_an"))
    # same branch: a ancestor-of b or b ancestor-of a
    a_over_b = pairs.join(
        anc,
        (F.col("_d") == F.col("_b_acc")) & (F.col("_an") == F.col("_a_acc")),
        "left_semi",
    )
    b_over_a = pairs.join(
        anc,
        (F.col("_d") == F.col("_a_acc")) & (F.col("_an") == F.col("_b_acc")),
        "left_semi",
    )
    dominated = (
        a_over_b.unionByName(b_over_a)
        .select("group_key", F.col("_b_acc").alias("acc"))
        .distinct()
    )

    return (
        ranked.join(dominated, ["group_key", "acc"], "left_anti")
        .select(
            "group_key", "acc", "annot_count", "child_count", "parent_count"
        )
    )
