"""Relational-breadth suite (round 8): the decision-support join
shapes the earlier relational core (queries.py §1: Q1/Q3/Q5-style)
does not exercise — outer-join distributions, NOT-IN/NOT-EXISTS
anti-joins, scalar-subquery thresholds, HAVING-gated semi-join chains,
and blocked fuzzy entity resolution.

Why these five shapes: together with the existing pricing_summary /
top_revenue_orders / nation_volume / topn_per_group they cover every
join flavor Catalyst distinguishes physically (inner, left outer,
left semi, left anti, and the broadcast scalar cross) plus both
subquery decorrelation patterns (scalar aggregate and IN/EXISTS), so
a user of the reference switching relational workloads onto this
engine has an attested template for each. Reference scope note: the
reference pipeline's own joins are lookup-shaped (SURVEY §2.4); this
suite is the extension tier the TPC-H-ish driver tables exist for
(TESTDATA.md), same status as the window/dedup suites.

Scale notes are per-query; the common theme is that every dimension
side is broadcast (customer/supplier/part are the small tables at any
SF — they grow with SF but stay orders of magnitude under lineitem,
and at true 100 TB the same shapes hold with the dims bucketed
instead of broadcast), and every aggregate is map-side partial first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clinvar_pipeline_spark.queries import DEC, _persist, _t, register


# ---------------------------------------------------------------------
# Q13 shape: LEFT OUTER join + two-level aggregation (distribution of
# a fact count over an entity population, zeros included)
# ---------------------------------------------------------------------

@register(
    "customer_distribution",
    """
    WITH co AS (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey
         AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    SELECT c_count, count(*) AS custdist
    FROM co GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q13-style: how many customers placed 0, 1, 2, … orders
    (excluding a priority class). The LEFT join keeps zero-order
    customers — the row the inner-join formulation silently drops.

    Scale: orders shuffles once on o_custkey (its natural grouping
    key); the filter on o_orderpriority is pushed below the join so
    non-qualifying orders never enter the exchange. The second
    aggregation's domain is order-counts (tiny) → single-stage
    reduce. No skew risk: custkeys are near-uniform by construction
    in TPC-H-shaped data."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# ---------------------------------------------------------------------
# Q10 shape: returned-revenue ranking (4-way join, date window, top-N)
# ---------------------------------------------------------------------

@register(
    "returned_item_losers",
    """
    SELECT c.c_custkey, min(c.c_name) AS c_name, min(n.n_name) AS n_name,
           round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE), 4)
             AS lost_revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01'
    GROUP BY c.c_custkey
    ORDER BY lost_revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q_returned_item_losers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10-style: customers who returned the most revenue in a
    half-year window — the canonical "which accounts are hurting"
    report shape (fact⋈fact join + two broadcast dims + top-N).

    Scale: lineitem⋈orders is the only real shuffle (orderkey);
    customer and nation broadcast. The date filter prunes orders
    before the join, the returnflag filter prunes lineitem at the
    scan (both visible as PushedFilters). Top-20 compiles to
    TakeOrderedAndProject — no global sort materializes. The ORDER
    BY ties on the rounded double + custkey, so the LIMIT cut is
    engine-deterministic."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey")
        .agg(
            F.min("c_name").alias("c_name"),
            F.min("n_name").alias("n_name"),
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast(DEC)
                    * (F.lit(1) - F.col("l_discount").cast(DEC))
                ).cast("double"),
                4,
            ).alias("lost_revenue"),
        )
        .orderBy(F.col("lost_revenue").desc(), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------
# Q16 shape: distinct-count per dim bucket with a NOT-IN anti-join
# ---------------------------------------------------------------------

@register(
    "supplier_part_breadth",
    """
    SELECT p.p_brand, p.p_type,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size <= 25
      AND p.p_name NOT LIKE 'red%'
      AND l.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type
    ORDER BY supplier_cnt DESC, p_brand, p_type
    """,
)
def q_supplier_part_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q16-style: how many distinct suppliers ship each
    (brand, type) bucket, excluding a denylisted supplier set via
    NOT IN. The denylist is expressed as a broadcast LEFT ANTI join —
    the decorrelation Catalyst itself performs for NOT IN over a
    provably null-free subquery, written explicitly so the plan shape
    is pinned rather than optimizer-dependent.

    Scale: part filters broadcast into the lineitem scan; the anti
    side (negative-balance suppliers) is tiny at any SF and
    broadcasts. count(DISTINCT) expands to the standard two-phase
    aggregate: partial distinct on (brand, type, suppkey) map-side,
    then the final count — one shuffle keyed by the group, never a
    global distinct."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 25) & (~F.col("p_name").startswith("red"))
    )
    bad = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type")
    )


# ---------------------------------------------------------------------
# Q20 shape: HAVING-gated semi-join chain (qualify suppliers by a
# grouped aggregate over a semi-joined fact slice)
# ---------------------------------------------------------------------

@register(
    "promotion_candidates",
    """
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l
        WHERE l.l_partkey IN (
            SELECT p_partkey FROM part WHERE p_name LIKE '%widget%')
          AND l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY l.l_suppkey
        HAVING sum(CAST(l.l_quantity AS DECIMAL(18,2))) > 150)
    ORDER BY s_suppkey
    """,
)
def q_promotion_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q20-style: suppliers who moved more than a threshold
    quantity of promoted ('widget') parts inside a year — the nested
    IN (… GROUP BY … HAVING) shape, built bottom-up: part predicate →
    broadcast semi-join into lineitem → grouped HAVING gate →
    broadcast semi-join into supplier.

    Scale: the widget part-key set broadcasts (dim-sized); the only
    shuffle is the suppkey groupBy, whose input the two pushed
    filters (date at the scan, part semi-join map-side) have already
    cut to the promoted slice. The HAVING sum is exact DECIMAL so the
    threshold cut is engine-identical. The qualifying-supplier set is
    small by construction → broadcast semi into supplier, no
    supplier-side shuffle."""
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    widget = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").contains("widget"))
        .select("p_partkey")
    )
    qual = (
        li.join(F.broadcast(widget), li.l_partkey == widget.p_partkey, "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("q"))
        .filter(F.col("q") > 150)
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(qual), s.s_suppkey == qual.l_suppkey, "left_semi")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------
# Q22 shape: scalar-subquery threshold + NOT EXISTS anti-join
# ---------------------------------------------------------------------

@register(
    "idle_rich_customers",
    """
    WITH thresh AS (
        SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                 / count(*) AS cutoff
        FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_nationkey, count(*) AS numcust,
           round(CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS totacctbal
    FROM customer c, thresh t
    WHERE c.c_acctbal > t.cutoff
      AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c.c_nationkey
    ORDER BY c_nationkey
    """,
)
def q_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22-style: above-average-balance customers with no
    RECENT order history (dormant capital), per nation. Exercises the
    scalar aggregate subquery (global cutoff) and NOT EXISTS; the
    recency predicate lives inside the EXISTS so the anti side is the
    date-pruned orders slice, not the full history.

    Numeric discipline: the cutoff is sum(DECIMAL)→double ÷ count —
    an exact decimal sum then ONE IEEE divide, so the comparison
    threshold is bit-identical in both engines (a plain double avg()
    would be summation-order dependent — the ADVICE-r6 fsum lesson).

    Scale: the cutoff is a 1-row broadcast (cross join with a scalar
    frame, Catalyst's own decorrelation of the scalar subquery); NOT
    EXISTS is a LEFT ANTI join on o_custkey — at full scale orders'
    custkey projection shuffles once, matching the anti-join's key,
    and AQE converts to broadcast when the filtered customer side is
    small. Final group domain is nations → tiny."""
    c = _t(spark, sf_dir, "customer")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    thresh = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast(DEC)).cast("double")
                / F.count(F.lit(1))
            ).alias("cutoff")
        )
    )
    return (
        c.join(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("cutoff"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(
                F.sum(F.col("c_acctbal").cast(DEC)).cast("double"), 2
            ).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


# ---------------------------------------------------------------------
# Blocked fuzzy entity resolution (edit-distance dedup of a name
# vocabulary + impact counts)
# ---------------------------------------------------------------------

@register(
    "fuzzy_name_dedup",
    """
    WITH names AS (
        SELECT p_name, count(*) AS n_parts
        FROM part GROUP BY p_name
    ),
    pairs AS (
        SELECT a.p_name AS name_a, b.p_name AS name_b,
               a.n_parts AS parts_a, b.n_parts AS parts_b,
               levenshtein(a.p_name, b.p_name) AS dist
        FROM names a
        JOIN names b
          ON split_part(a.p_name, ' ', 2) = split_part(b.p_name, ' ', 2)
         AND a.p_name < b.p_name
    )
    SELECT name_a, name_b, dist, parts_a, parts_b
    FROM pairs WHERE dist <= 2
    ORDER BY name_a, name_b
    """,
)
def q_fuzzy_name_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy entity resolution over the part-name vocabulary:
    candidate variants within an edit distance of 2, blocked on the
    head noun (last token), with how many part rows each variant
    spelling covers.

    The ER pattern, staged the way it survives 100 TB:
    1. collapse rows → DISTINCT name vocabulary first (the pairwise
       work is then vocab², data-size-independent — vocabularies
       grow ~log of row count in real catalogs);
    2. block before comparing — the noun block turns vocab² into
       Σ block², and an edit-distance-2 match across different head
       nouns is impossible in this vocabulary (min inter-noun
       distance is 3), so blocking loses no recall (both engines
       apply the SAME blocking, so the oracle pins the exact
       blocked semantics either way);
    3. compare with the JVM built-in levenshtein (whole-stage
       codegen, no Python), a.name < b.name for the canonical
       unordered pair.
    The vocabulary aggregate is the only full-data shuffle; the pair
    join runs on the tiny distinct frame. At real catalog scale the
    same plan holds with the vocabulary frame still executor-local.
    """
    p = _t(spark, sf_dir, "part")
    names = p.groupBy("p_name").agg(F.count(F.lit(1)).alias("n_parts"))
    a = names.select(
        F.col("p_name").alias("name_a"),
        F.col("n_parts").alias("parts_a"),
        F.split(F.col("p_name"), " ").getItem(1).alias("blk_a"),
    )
    b = names.select(
        F.col("p_name").alias("name_b"),
        F.col("n_parts").alias("parts_b"),
        F.split(F.col("p_name"), " ").getItem(1).alias("blk_b"),
    )
    return (
        a.join(
            b,
            (F.col("blk_a") == F.col("blk_b"))
            & (F.col("name_a") < F.col("name_b")),
        )
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= 2)
        .select("name_a", "name_b", "dist", "parts_a", "parts_b")
        .orderBy("name_a", "name_b")
    )


_FUZZY_PAIR_CTES = """names AS (
        SELECT p_name, count(*) AS n_parts
        FROM part GROUP BY p_name),
    fpairs AS (
        SELECT a.p_name AS name_a, b.p_name AS name_b
        FROM names a
        JOIN names b
          ON split_part(a.p_name, ' ', 2) = split_part(b.p_name, ' ', 2)
         AND a.p_name < b.p_name
        WHERE levenshtein(a.p_name, b.p_name) <= 2),
    edges AS (
        SELECT name_a AS s, name_b AS d FROM fpairs
        UNION
        SELECT name_b AS s, name_a AS d FROM fpairs),
    reach(node, lbl) AS (
        SELECT s, s FROM edges
        UNION
        SELECT e.d, r.lbl FROM reach r JOIN edges e ON e.s = r.node),
    comp AS (SELECT node, min(lbl) AS cid FROM reach GROUP BY node)"""


@register(
    "fuzzy_entity_clusters",
    f"""
    WITH RECURSIVE {_FUZZY_PAIR_CTES},
    lab AS (
        SELECT n.p_name AS name, n.n_parts,
               coalesce(c.cid, n.p_name) AS cid
        FROM names n LEFT JOIN comp c ON c.node = n.p_name),
    canon AS (
        SELECT cid, name AS canonical
        FROM (SELECT cid, name,
                     row_number() OVER (PARTITION BY cid
                         ORDER BY n_parts DESC, name) AS rn
              FROM lab)
        WHERE rn = 1),
    stats AS (
        SELECT cid, count(*) AS cluster_spellings,
               sum(n_parts) AS cluster_parts
        FROM lab GROUP BY cid)
    SELECT l.name, l.n_parts, c.canonical,
           CAST(s.cluster_spellings AS BIGINT) AS cluster_spellings,
           CAST(s.cluster_parts AS BIGINT) AS cluster_parts
    FROM lab l
    JOIN canon c ON c.cid = l.cid
    JOIN stats s ON s.cid = l.cid
    """,
)
def q_fuzzy_entity_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end entity resolution: the blocked-Levenshtein candidate
    pairs (q_fuzzy_name_dedup) become edges, transitive clusters come
    from the SAME distributed connected-components operator the dedup
    family uses (operators/graph.py — chains A~B~C resolve to one
    entity even when A and C never pair directly), and each cluster
    elects a canonical spelling by impact (max row coverage, name
    tiebreak — total by construction). Every name row is labeled:
    singletons are their own canonical (left join + coalesce).

    Scale: pairwise work stays on the DISTINCT name vocabulary
    (data-size independent); CC runs on the tiny pair set in
    O(log² n) rounds; the canonical election is one per-cluster
    window over cluster-sized frames. Oracle: the same pairs feed a
    recursive-CTE closure — exact at test scale, which is the
    oracle's job; the star-contraction side is the one that scales
    (the dedup_clusters pairing, applied to ER)."""
    from clinvar_pipeline_spark.operators.graph import connected_components

    p = _t(spark, sf_dir, "part")
    names = _persist(
        p.groupBy("p_name").agg(F.count(F.lit(1)).alias("n_parts"))
    )
    a = names.select(
        F.col("p_name").alias("name_a"),
        F.split("p_name", " ").getItem(1).alias("blk_a"),
    )
    b = names.select(
        F.col("p_name").alias("name_b"),
        F.split("p_name", " ").getItem(1).alias("blk_b"),
    )
    pairs = (
        a.join(
            b,
            (F.col("blk_a") == F.col("blk_b"))
            & (F.col("name_a") < F.col("name_b")),
        )
        .filter(F.levenshtein("name_a", "name_b") <= 2)
        .select("name_a", "name_b")
    )
    # r12 REVERT of the r11 long-key CC (guide §1 measure first, §2.3
    # compression note): the xxhash64(name) iteration was motivated by
    # RAW bytes per edge per round (16 B of longs vs two ~30-50 B
    # spellings), but shuffle bytes travel COMPRESSED, and the gate's
    # own numbers falsify the trade — similar name strings lz4-compress
    # far better than incompressible 64-bit hashes, so the long-key
    # shape shuffled MORE (write 40,487 / read 46,171 B vs 36,034 /
    # 40,711 B string-keyed, same SF, same tool) AND cost ~0.3 s local
    # wall (r11's own interleaved A/B: 2.77 s med vs 2.42). String
    # keys win on both axes; the r11 bench_check waiver is deleted
    # with this revert.
    cc = connected_components(
        pairs.select(
            F.col("name_a").alias("src"), F.col("name_b").alias("dst")
        )
    )
    lab = names.join(
        cc, names.p_name == cc.node, "left"
    ).select(
        F.col("p_name").alias("name"),
        "n_parts",
        F.coalesce("component", "p_name").alias("cid"),
    )
    w = Window.partitionBy("cid").orderBy(
        F.col("n_parts").desc(), F.col("name")
    )
    ranked = lab.withColumn("rn", F.row_number().over(w))
    canon = ranked.filter(F.col("rn") == 1).select(
        "cid", F.col("name").alias("canonical")
    )
    stats = lab.groupBy("cid").agg(
        F.count(F.lit(1)).alias("cluster_spellings"),
        F.sum("n_parts").alias("cluster_parts"),
    )
    return (
        lab.join(canon, "cid")
        .join(stats, "cid")
        .select(
            "name", "n_parts", "canonical",
            "cluster_spellings", "cluster_parts",
        )
    )
