"""Relational-breadth suite (queries_relational.py): the semantics the
oracle gate can't distinguish from lucky data — outer-join zero
groups, anti-join exclusion, threshold determinism, and the fuzzy
blocking recall argument."""

from __future__ import annotations

from pyspark.sql import functions as F

from clinvar_pipeline_spark.queries import _t
from clinvar_pipeline_spark.queries_relational import (
    q_customer_distribution,
    q_fuzzy_name_dedup,
    q_idle_rich_customers,
    q_supplier_part_breadth,
)


def test_customer_distribution_keeps_zero_order_customers(spark, sf_dir):
    """The LEFT join's reason to exist: customers with no qualifying
    orders must land in the c_count=0 bucket, and the distribution
    must cover the whole customer population."""
    rows = {r["c_count"]: r["custdist"] for r in
            q_customer_distribution(spark, sf_dir).collect()}
    n_cust = _t(spark, sf_dir, "customer").count()
    assert sum(rows.values()) == n_cust
    # sf0.001: 150 customers, 1500 orders minus the urgent class —
    # some customer must still be at zero for the shape to attest the
    # outer join; if the fixture ever densifies, the population-sum
    # assert above keeps the semantics pinned.
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT")
    custs_with = o.select("o_custkey").distinct().count()
    assert rows.get(0, 0) == n_cust - custs_with


def test_supplier_part_breadth_excludes_denylisted(spark, sf_dir):
    """No denylisted (negative-balance) supplier may contribute to any
    bucket: re-aggregate with the denylist included and require the
    counts to dominate the filtered ones wherever a bad supplier
    ships that bucket."""
    bad = {r["s_suppkey"] for r in _t(spark, sf_dir, "supplier")
           .filter(F.col("s_acctbal") < 0).collect()}
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 25) & (~F.col("p_name").startswith("red")))
    unfiltered = {
        (r["p_brand"], r["p_type"]): r["cnt"]
        for r in li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("cnt")).collect()
    }
    got = {(r["p_brand"], r["p_type"]): r["supplier_cnt"]
           for r in q_supplier_part_breadth(spark, sf_dir).collect()}
    assert set(got) <= set(unfiltered)
    assert all(got[k] <= unfiltered[k] for k in got)
    # if any denylisted supplier actually ships a qualifying part,
    # the filtered totals must strictly drop somewhere
    bad_ships = (
        li.filter(F.col("l_suppkey").isin(list(bad)))
        .join(p, li.l_partkey == p.p_partkey).count() if bad else 0
    )
    if bad_ships:
        assert sum(got.values()) < sum(unfiltered.values())


def test_idle_rich_cutoff_is_exact_decimal_mean(spark, sf_dir):
    """The scalar threshold must be sum(DECIMAL)->double / count —
    NOT a float avg (summation-order dependent). Recompute it exactly
    in Python decimal and require every reported nation's members to
    clear it."""
    import decimal

    c = [(r["c_acctbal"], r["c_nationkey"], r["c_custkey"])
         for r in _t(spark, sf_dir, "customer").collect()]
    pos = [decimal.Decimal(str(round(b, 2))).quantize(decimal.Decimal("0.01"))
           for b, _, _ in c if b > 0]
    cutoff = float(sum(pos)) / len(pos)
    recent = {r["o_custkey"] for r in _t(spark, sf_dir, "orders")
              .filter(F.col("o_orderdate") >= F.lit("2000-01-01")
                      .cast("timestamp")).collect()}
    expect = {}
    for bal, nk, ck in c:
        if bal > cutoff and ck not in recent:
            n, t = expect.get(nk, (0, decimal.Decimal(0)))
            expect[nk] = (n + 1, t + decimal.Decimal(str(round(bal, 2)))
                          .quantize(decimal.Decimal("0.01")))
    got = {r["c_nationkey"]: (r["numcust"], r["totacctbal"])
           for r in q_idle_rich_customers(spark, sf_dir).collect()}
    assert set(got) == set(expect)
    for nk, (n, t) in expect.items():
        assert got[nk][0] == n
        assert abs(got[nk][1] - float(t)) < 1e-6


def test_fuzzy_blocking_is_lossless_at_threshold(spark, sf_dir):
    """The recall argument in the docstring, executed: at edit
    distance <= 2, blocking on the head noun loses no pair, because
    any pair with different nouns is > 2 away. Verified by brute
    force over the full distinct-name vocabulary (no blocking)."""
    names = [r["p_name"] for r in _t(spark, sf_dir, "part")
             .select("p_name").distinct().collect()]

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    brute = {(a, b) for a in names for b in names
             if a < b and lev(a, b) <= 2}
    got = {(r["name_a"], r["name_b"])
           for r in q_fuzzy_name_dedup(spark, sf_dir).collect()}
    assert got == brute  # blocked == unblocked at this threshold
    # and the blocks genuinely prune: cross-noun candidates exist
    assert any(a.split()[1] != b.split()[1]
               for a in names for b in names if a < b)


def test_fuzzy_impact_counts_cover_parts(spark, sf_dir):
    """parts_a/parts_b are the per-spelling row counts — each pair's
    total must match a direct recount."""
    p = _t(spark, sf_dir, "part")
    counts = {r["p_name"]: r["n"] for r in
              p.groupBy("p_name").agg(F.count(F.lit(1)).alias("n")).collect()}
    for r in q_fuzzy_name_dedup(spark, sf_dir).collect():
        assert r["parts_a"] == counts[r["name_a"]]
        assert r["parts_b"] == counts[r["name_b"]]


def test_fuzzy_entity_clusters_invariants(spark, sf_dir):
    """Every distinct spelling labeled exactly once; the canonical is
    a cluster member with maximal row coverage (name tiebreak);
    singletons are their own canonical; cluster stats are consistent."""
    from clinvar_pipeline_spark.queries_relational import (
        q_fuzzy_entity_clusters,
    )

    rows = q_fuzzy_entity_clusters(spark, sf_dir).collect()
    n_names = (
        spark.read.parquet(f"{sf_dir}/part.parquet")
        .select("p_name")
        .distinct()
        .count()
    )
    assert len(rows) == n_names
    by_canon: dict[str, list] = {}
    for r in rows:
        by_canon.setdefault(r["canonical"], []).append(r)
    for canon, members in by_canon.items():
        names = {m["name"] for m in members}
        assert canon in names  # canonical is a member
        assert len(names) == len(members)  # one row per spelling
        spellings = members[0]["cluster_spellings"]
        assert all(m["cluster_spellings"] == spellings for m in members)
        assert spellings == len(members)
        total = sum(m["n_parts"] for m in members)
        assert all(m["cluster_parts"] == total for m in members)
        best = max(members, key=lambda m: (m["n_parts"], ))["n_parts"]
        canon_row = next(m for m in members if m["name"] == canon)
        assert canon_row["n_parts"] == best
        assert canon == min(
            m["name"] for m in members if m["n_parts"] == best
        )
    # the sf fixture actually exercises multi-spelling clusters
    assert any(len(m) > 1 for m in by_canon.values())
