"""Skew mitigation: salted two-phase aggregation and salted broadcast
join helpers.

AQE's skew-join splitting covers sort-merge joins, but a skewed
``groupBy`` still funnels every row of a hot key through one task's
partial-merge chain, and a skewed *broadcast* join fan-out (one hot key
matching a large dim slice) isn't AQE-splittable at all. These helpers
make the mitigation explicit and composable:

- :func:`salted_groupby_agg` — phase 1 groups on (key, salt) so a hot
  key's rows spread over ``n_salts`` tasks; phase 2 merges the per-salt
  partials. Correct for any algebraic aggregate (sum/count/min/max and
  set-unions via flatten∘collect).
- :func:`with_salt` — deterministic row salt for co-partitioning
  experiments.

At 100 TB the salt count is sized to the executor count, not the data:
the phase-2 shuffle moves ``n_salts`` rows per distinct key.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def with_salt(df: DataFrame, n_salts: int, *cols: str) -> DataFrame:
    """Deterministic per-row salt in [0, n_salts): xxhash64 of the given
    columns (or of all columns when none given) — stable across runs,
    unlike rand()-based salting, so results stay reproducible."""
    basis = [F.col(c) for c in (cols or df.columns)]
    return df.withColumn(
        SALT_COL,
        F.pmod(F.xxhash64(*basis), F.lit(n_salts)).cast("int"),
    )


def salted_groupby_agg(
    df: DataFrame,
    key_cols: list[str],
    partial_aggs: Mapping[str, Column],
    final_aggs: Mapping[str, Column],
    n_salts: int = 16,
    salt_basis: list[str] | None = None,
) -> DataFrame:
    """Two-phase skew-tolerant groupBy.

    ``partial_aggs``: name -> aggregate over the raw rows (phase 1,
    grouped on key+salt). ``final_aggs``: name -> aggregate over the
    phase-1 columns (phase 2, grouped on key alone). E.g. a skew-proof
    count is ``partial={"c": F.count("*")}, final={"c": F.sum("c")}``;
    a set-union is ``partial={"s": F.collect_set(col)},
    final={"s": F.array_sort(F.array_distinct(F.flatten(F.collect_list("s"))))}``.

    The hot key's rows hash-spread over ``n_salts`` phase-1 tasks; the
    phase-2 input is ``n_salts`` rows per distinct key regardless of
    skew."""
    salted = with_salt(df, n_salts, *(salt_basis or df.columns))
    phase1 = salted.groupBy(*key_cols, SALT_COL).agg(
        *[expr.alias(name) for name, expr in partial_aggs.items()]
    )
    return phase1.groupBy(*key_cols).agg(
        *[expr.alias(name) for name, expr in final_aggs.items()]
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "inner",
    n_salts: int = 16,
    salt_basis: list[str] | None = None,
) -> DataFrame:
    """Skew-tolerant large×large equi-join: salt the skewed LEFT side,
    replicate the RIGHT side across every salt, join on (key, salt).

    The shape AQE's skew split can't always save: a sort-merge join
    whose hot key overflows one task both sides at once (AQE splits
    the left partition but each split still matches the full right
    slice), or a join forced to shuffle-hash where AQE skew handling
    doesn't apply. Salting makes the spread explicit and planner-
    independent: the hot key's left rows land on ``n_salts`` tasks,
    each seeing the complete right slice for that key.

    Cost model (the reason this is opt-in, not default): the right
    side is replicated ``n_salts``× through the exchange — correct
    sizing is ``n_salts ≈ hot-key rows / target-task rows``, with the
    right side the SMALLER (but non-broadcastable) relation. Both
    sides shuffle once, exactly like the unsalted join, just on the
    wider (key, salt) key.

    Semantics: inner and left joins are supported (each left row
    carries exactly one salt, so no duplication and no lost rows;
    for ``left`` joins an unmatched row surfaces exactly once because
    its single salt pairs with the one replica holding its salt
    value). Right/full joins would surface unmatched RIGHT rows once
    per replica — refused.

    The salt is deterministic (xxhash64 over ``salt_basis`` or all
    left columns): reruns and retries see identical placement, the
    engine's reproducibility discipline."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join: how={how!r} not in ('inner','left')")
    overlap = set(left.columns) & set(right.columns) - set(on)
    if overlap:
        raise ValueError(
            f"salted_join: ambiguous non-key columns {sorted(overlap)}"
        )
    lhs = with_salt(left, n_salts, *(salt_basis or left.columns))
    rhs = right.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn(SALT_COL, F.col(SALT_COL).cast("int"))
    return lhs.join(rhs, [*on, SALT_COL], how).drop(SALT_COL)
