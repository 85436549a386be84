"""J14 rank-pick policy unit tests (reference TermNameMatcher.java:
33-133, 188-213): narrow/broad demotion, separate-branch keep-both,
same-branch higher-rank pick across all three rank tiers."""

import pytest
from pyspark.sql import functions as F

from clinvar_pipeline_spark.operators.term_rank import pick_duplicate_terms


@pytest.fixture(scope="module")
def adjudicated(spark):
    # ontology: 1 -> 2 -> 4, 1 -> 3 (2 and 3 on separate branches)
    candidates = spark.createDataFrame(
        [
            # g1: same branch (2 is ancestor of 4) -> rank decides
            ("g1", 2, False),
            ("g1", 4, False),
            # g2: separate branches -> both kept
            ("g2", 2, False),
            ("g2", 3, False),
            # g3: narrow/broad demoted in favor of the plain candidate
            ("g3", 5, True),
            ("g3", 6, False),
            # g4: only narrow/broad candidates -> no demotion applies
            ("g4", 7, True),
            ("g4", 8, True),
            # g5: singleton -> not a duplicate group, absent from output
            ("g5", 9, False),
        ],
        "group_key string, acc long, is_narrow_broad boolean",
    )
    term_stats = spark.createDataFrame(
        [
            (2, 10, 0, 0),  # higher annot count than 4 -> wins g1
            (3, 1, 0, 0),
            (4, 3, 9, 0),
            (5, 0, 0, 0),
            (6, 0, 0, 0),
            (7, 2, 0, 0),  # same annot as 8; fewer children than 8
            (8, 2, 5, 0),  # wins g4 on child count (tier 2)
            (9, 0, 0, 0),
        ],
        "acc long, annot_count int, child_count int, parent_count int",
    )
    ancestors = spark.createDataFrame(
        [(2, 1), (3, 1), (4, 2), (4, 1), (7, 1), (8, 7)],
        "acc long, anc long",
    )
    rows = pick_duplicate_terms(candidates, term_stats, ancestors).collect()
    return {(r["group_key"], r["acc"]) for r in rows}


def test_same_branch_higher_rank_wins(adjudicated):
    assert ("g1", 2) in adjudicated and ("g1", 4) not in adjudicated


def test_separate_branches_keep_both(adjudicated):
    assert ("g2", 2) in adjudicated and ("g2", 3) in adjudicated


def test_narrow_broad_demoted(adjudicated):
    assert ("g3", 6) in adjudicated and ("g3", 5) not in adjudicated


def test_all_narrow_broad_rank_pick_applies(adjudicated):
    # 7 is an ancestor of 8 (same branch); 8 outranks on child count
    assert ("g4", 8) in adjudicated and ("g4", 7) not in adjudicated


def test_singleton_group_absent(adjudicated):
    assert not any(g == "g5" for g, _ in adjudicated)
