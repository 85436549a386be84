"""salted_join (operators/skew.py): result-equality with the plain
join under every supported mode, and the guardrails."""

from __future__ import annotations

import pytest

from clinvar_pipeline_spark.operators.skew import SALT_COL, salted_join


@pytest.fixture(scope="module")
def frames(spark):
    # skewed left: one hot key (1) with many rows, plus singletons
    left = spark.createDataFrame(
        [(1, f"e{i}") for i in range(200)]
        + [(2, "x"), (3, "y"), (5, "unmatched")],
        "k int, payload string",
    )
    right = spark.createDataFrame(
        [(1, "hot"), (2, "two"), (3, "three"), (4, "right_only")],
        "k int, dim string",
    )
    return left, right


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_inner_equals_plain_join(spark, frames):
    left, right = frames
    got = salted_join(left, right, on=["k"], n_salts=8)
    want = left.join(right, ["k"])
    assert _rows(got) == _rows(want)
    assert got.columns == [c for c in want.columns]


def test_left_join_unmatched_rows_surface_exactly_once(spark, frames):
    left, right = frames
    got = salted_join(left, right, on=["k"], how="left", n_salts=8)
    want = left.join(right, ["k"], "left")
    assert _rows(got) == _rows(want)
    unmatched = [r for r in got.collect() if r["k"] == 5]
    assert len(unmatched) == 1 and unmatched[0]["dim"] is None


def test_hot_key_spreads_across_salts(spark, frames):
    """The point of the operator: the 200-row hot key must occupy
    several distinct salt values, not funnel into one."""
    from clinvar_pipeline_spark.operators.skew import with_salt

    left, _ = frames
    salts = (
        with_salt(left, 8, "k", "payload")
        .filter("k = 1")
        .select(SALT_COL)
        .distinct()
        .count()
    )
    assert salts >= 4


def test_salt_is_deterministic_across_runs(spark, frames):
    from clinvar_pipeline_spark.operators.skew import with_salt

    left, _ = frames
    a = _rows(with_salt(left, 8, "k", "payload"))
    b = _rows(with_salt(left.repartition(7), 8, "k", "payload"))
    assert a == b


def test_right_and_full_joins_refused(spark, frames):
    left, right = frames
    for how in ("right", "full", "outer"):
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(left, right, on=["k"], how=how)


def test_ambiguous_non_key_columns_refused(spark):
    l = spark.createDataFrame([(1, "a")], "k int, v string")
    r = spark.createDataFrame([(1, "b")], "k int, v string")
    with pytest.raises(ValueError, match="ambiguous"):
        salted_join(l, r, on=["k"])
