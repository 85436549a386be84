"""Temporal joins Spark lacks natively: as-of join and bucketed range
join, both expressed as compositions of built-in DataFrame ops (no
UDFs, no driver loops).

- :func:`asof_join` — for each left row, the nearest right row at or
  before (``backward``) / at or after (``forward``) its event time,
  per key group: pandas ``merge_asof`` / kdb+ ``aj`` / DuckDB
  ``ASOF JOIN`` semantics. Implemented as ONE union + ONE per-key
  window scan (last non-null carry-forward) — no join at all, so the
  cost is a single shuffle on the key columns regardless of how many
  left rows share a match, and there is no pair blow-up to guard.
- :func:`range_join` — all (left, right) pairs whose time offset
  falls in a half-open interval, per key group. A naive inequality
  join degenerates to BroadcastNestedLoopJoin (the classic Spark
  scale trap for temporal predicates); here the interval is bucketed
  so candidates come from an EQUI join on (keys, time bucket) — each
  left row probes the ceil(span/bucket)+1 adjacent buckets — and the
  exact microsecond predicate filters the candidates. Shuffle cost is
  the equi-join's, duplication bound is the probe-bucket count.

Both operate on microsecond-exact integer epochs (``unix_micros``),
never floating-point seconds, so results are engine-portable
bit-for-bit (the DuckDB oracles compute ``epoch_us`` integers).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _micros(col: Column) -> Column:
    # NTZ-proof: NTZ->LTZ is the wall-time identity under the UTC
    # session TZ pinned in queries._t (no-op if already LTZ)
    return F.unix_micros(col.cast("timestamp_ltz"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: Sequence[str] = ("user_id",),
    direction: str = "backward",
    tolerance_us: int | None = None,
    suffix: str = "_asof",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """As-of join: left rows, each annotated with the nearest right
    row whose ``on`` is <= (backward) or >= (forward) the left ``on``,
    within the same ``by`` group — NULLs when no such row exists (the
    LEFT ASOF semantics). Right's ``on`` lands as ``{on}{suffix}``;
    every other right column keeps its name and must not collide with
    a left column (pre-alias on the caller side; raises otherwise).

    ``tolerance_us`` (microseconds) nulls out matches farther than
    the bound, pandas-merge_asof style.

    Ties: rows are scanned in (ts, side) order with right rows first,
    so an equal-timestamp right row IS eligible (both directions are
    inclusive, matching DuckDB ``ASOF``). Among right rows with the
    SAME (by, ts): pass ``tiebreak_col`` (a right column; the
    MAXIMUM value wins, nulls lose) to make the pick total by
    construction — identical output across partitionings and input
    orders. Default ``None`` keeps the historical behavior (last in
    input order wins — a run-order hazard iff right has duplicate
    (by, ts) rows with differing payloads; callers pre-dedupe).

    Scale: union + one window over ``by`` — a single hash shuffle on
    the key columns; the carry-forward is a running ``last(...,
    ignorenulls)`` the window evaluates in one pass per partition.
    No join operator appears in the plan, so there is no skew
    amplification beyond the key distribution itself (a hot key costs
    what sorting that key's rows costs)."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: bad direction {direction!r}")
    by = list(by)
    rcols = [c for c in right.columns if c not in by and c != on]
    r_on = f"{on}{suffix}"
    clash = (set(rcols) | {r_on}) & set(left.columns)
    if clash:
        raise ValueError(f"asof_join: right columns collide with left: {clash}")
    if r_on in rcols:
        raise ValueError(f"asof_join: right already has a {r_on} column")
    reserved = {"_side", "_r"} & (set(left.columns) | set(rcols))
    if reserved:
        raise ValueError(f"asof_join: reserved column name {reserved}")

    l2 = left.withColumn("_side", F.lit(1))
    # null event times match nothing: a null right ts must not carry
    # into every left row (asc nulls-first would), and a null left ts
    # must not adopt the scan's first right row — drop the former,
    # order the latter before any right row (nulls first in BOTH
    # directions), so it carries nothing.
    r2 = (
        right.filter(F.col(on).isNotNull())
        .select(
            *by,
            # ONE struct, not per-column carries: last(ignorenulls)
            # per column would stitch fields from DIFFERENT right
            # rows whenever a matched row holds a null payload field
            F.struct(F.col(on).alias(r_on), *rcols).alias("_r"),
        )
        .withColumn("_side", F.lit(0))
    )
    u = l2.unionByName(r2, allowMissingColumns=True)

    ordv = F.coalesce(_micros(F.col(on)), _micros(F.col("_r")[r_on]))
    order = [
        ordv.desc_nulls_first() if direction == "forward"
        else ordv.asc_nulls_first(),
        "_side",
    ]
    if tiebreak_col is not None:
        tb_field = r_on if tiebreak_col == on else tiebreak_col
        if tb_field != r_on and tiebreak_col not in rcols:
            raise ValueError(
                f"asof_join: tiebreak_col {tiebreak_col!r} not a right column"
            )
        # among equal-(by, ts) right rows the LAST scanned is the
        # carry, so ascending-nulls-first makes the max-tiebreak row
        # win deterministically regardless of direction (the within-
        # group order is independent of ordv's sort direction). Left
        # rows carry a null _r here and already sort after right rows
        # at the same instant via _side.
        order.append(F.col("_r")[tb_field].asc_nulls_first())
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        *left.columns,
        "_side",
        F.last("_r", ignorenulls=True).over(w).alias("_r"),
    )
    keep = F.col("_r").isNotNull()
    if tolerance_us is not None:
        lag = F.abs(_micros(F.col(on)) - _micros(F.col("_r")[r_on]))
        keep = keep & (lag <= F.lit(tolerance_us))
    return (
        carried.filter(F.col("_side") == 1)
        .select(
            *left.columns,
            *[
                F.when(keep, F.col("_r")[c]).alias(c)
                for c in (r_on, *rcols)
            ],
        )
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: Sequence[str] = ("user_id",),
    lower_us: int = 0,
    upper_us: int = 86_400_000_000,
    bucket_us: int | None = None,
) -> DataFrame:
    """Interval join: all (left, right) pairs in the same ``by`` group
    with ``right.on - left.on`` in the half-open interval
    ``(lower_us, upper_us]`` (microseconds; pass a negative lower for
    windows reaching back in time). Right's ``on`` lands as
    ``{on}_r``; other right columns keep their names (collision
    raises, as in :func:`asof_join`).

    Plan shape: right rows key to bucket ``floor(epoch_us /
    bucket_us)``; each left row probes the buckets its interval can
    intersect — ``sequence(floor((l+lower)/B), floor((l+upper)/B))``,
    exactly 2 buckets at the default ``bucket_us = upper-lower`` —
    and the join is EQUI on (by..., bucket) with the exact
    microsecond range applied as a post-filter. No inequality join
    operator, no nested loop; cost scales with true pair density plus
    the bounded probe duplication."""
    by = list(by)
    rcols = [c for c in right.columns if c not in by and c != on]
    clash = set(rcols) & set(left.columns)
    if clash:
        raise ValueError(f"range_join: right columns collide with left: {clash}")
    r_on = f"{on}_r"
    if upper_us <= lower_us:
        raise ValueError("range_join: need lower_us < upper_us")
    reserved = {"_bk", "_l_us", "_r_us", r_on} & set(left.columns)
    reserved |= {"_bk", "_r_us", r_on} & set(rcols)
    if reserved:
        raise ValueError(f"range_join: reserved column name {reserved}")
    b = int(bucket_us) if bucket_us else (upper_us - lower_us)

    le = _micros(F.col(on))
    probe = F.explode(
        F.sequence(
            F.floor((le + F.lit(lower_us)) / F.lit(b)),
            F.floor((le + F.lit(upper_us)) / F.lit(b)),
        )
    ).alias("_bk")
    l2 = left.select(*left.columns, le.alias("_l_us"), probe)
    re_ = _micros(F.col(on))
    r2 = right.select(
        *by,
        F.col(on).alias(r_on),
        *rcols,
        re_.alias("_r_us"),
        F.floor(re_ / F.lit(b)).alias("_bk"),
    )
    off = F.col("_r_us") - F.col("_l_us")
    return (
        l2.join(r2, [*by, "_bk"])
        .filter((off > F.lit(lower_us)) & (off <= F.lit(upper_us)))
        .drop("_bk", "_l_us", "_r_us")
    )
