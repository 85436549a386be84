"""Domain-operator query suite, part 2: the remaining SURVEY.md §2
operators — per-record field merges, global aggregates, match cascades,
satellite diffs and write-path guards — mapped onto the driver's
generic tables with DuckDB oracle twins.

Same idiom as queries_domain.py: reference semantics (file:line cited
per entry) exercised on star-schema columns; the SQL twin is an
independent ANSI formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clinvar_pipeline_spark.operators.diff_sync import diff_sync
from clinvar_pipeline_spark.queries import DEC4, _t, register

# ---------------------------------------------------------------------
# M3/M5 — in-RGD vs incoming field merge + last-evaluated resolution
# ---------------------------------------------------------------------

@register(
    "field_merge",
    """
    WITH base AS (
        SELECT c_custkey,
               c_mktsegment || '|' || lower(c_mktsegment) || '|' || n_name
                   AS old_val,
               lower(n_name) || '|' || c_mktsegment AS inc_val,
               CASE WHEN c_custkey % 5 = 0 THEN NULL
                    ELSE DATE '2024-01-01' + INTERVAL (c_custkey % 100) DAY END AS d_old,
               CASE WHEN c_custkey % 7 = 0 THEN NULL
                    ELSE DATE '2024-01-01' + INTERVAL (c_custkey % 90) DAY END AS d_new
        FROM customer JOIN nation ON c_nationkey = n_nationkey
    ),
    merged AS (
        SELECT c_custkey, old_val,
               array_to_string(
                   list_sort(list_distinct(list_concat(
                       list_filter(string_split(old_val, '|'),
                           x -> NOT list_contains(
                               list_transform(string_split(inc_val, '|'),
                                              y -> lower(y)),
                               lower(x))),
                       string_split(inc_val, '|')))), '|') AS merged_val,
               d_old, d_new
        FROM base
    )
    SELECT c_custkey, merged_val,
           merged_val <> old_val AS changed,
           CASE WHEN d_old IS NULL THEN strftime(d_new, '%Y-%m-%d')
                WHEN d_new IS NULL THEN strftime(d_old, '%Y-%m-%d')
                ELSE strftime(greatest(d_old, d_new), '%Y-%m-%d')
           END AS last_evaluated
    FROM merged
    """,
)
def q_field_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3 (QC.java:54-94,112-142): case-insensitive delete of incoming
    occurrences from the stored pipe-set, then set-union sort-merge,
    with the changed flag = old != new. M5 (QC.java:96-110): keep the
    newer non-null date.

    Scale: pure per-row expressions after one broadcast join (nation is
    tiny) — whole-stage codegen, zero shuffles."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    base = (
        c.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "c_custkey",
            F.concat_ws(
                "|", "c_mktsegment", F.lower("c_mktsegment"), "n_name"
            ).alias("old_val"),
            F.concat_ws("|", F.lower("n_name"), "c_mktsegment").alias("inc_val"),
            F.when(F.col("c_custkey") % 5 == 0, None)
            .otherwise(
                F.date_add(
                    F.to_date(F.lit("2024-01-01")),
                    (F.col("c_custkey") % 100).cast("int"),
                )
            )
            .alias("d_old"),
            F.when(F.col("c_custkey") % 7 == 0, None)
            .otherwise(
                F.date_add(
                    F.to_date(F.lit("2024-01-01")),
                    (F.col("c_custkey") % 90).cast("int"),
                )
            )
            .alias("d_new"),
        )
    )
    merged_val = F.concat_ws(
        "|",
        F.array_sort(
            F.array_distinct(
                F.concat(
                    F.expr(
                        "filter(split(old_val, '\\\\|'), x -> NOT "
                        "array_contains(transform(split(inc_val, '\\\\|'), "
                        "y -> lower(y)), lower(x)))"
                    ),
                    F.split("inc_val", "\\|"),
                )
            )
        ),
    )
    return base.select(
        "c_custkey",
        merged_val.alias("merged_val"),
        (merged_val != F.col("old_val")).alias("changed"),
        F.date_format(
            F.when(F.col("d_old").isNull(), F.col("d_new"))
            .when(F.col("d_new").isNull(), F.col("d_old"))
            .otherwise(F.greatest("d_old", "d_new")),
            "yyyy-MM-dd",
        ).alias("last_evaluated"),
    )


# ---------------------------------------------------------------------
# M7/M8 — trait-name / submitter global aggregates with update flag
# ---------------------------------------------------------------------

@register(
    "trait_submitter_aggregate",
    """
    SELECT user_id,
           coalesce(array_to_string(list_sort(list_distinct(
               list(event_type))), '|'), '') AS trait_names,
           coalesce(array_to_string(list_sort(list_distinct(
               list(event_type) FILTER (WHERE event_id % 3 <> 0))), '|'), '')
               AS stored_names,
           coalesce(array_to_string(list_sort(list_distinct(
               list(event_type))), '|'), '')
             <> coalesce(array_to_string(list_sort(list_distinct(
               list(event_type) FILTER (WHERE event_id % 3 <> 0))), '|'), '')
               AS updated
    FROM events
    GROUP BY user_id
    """,
)
def q_trait_submitter_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M7/M8 (TraitNameCollection.java:38-76, SubmitterCollection.java:
    35-74): per-entity global re-aggregation of the sorted pipe-set,
    compared against the stored value; update only where changed.

    Scale: one groupBy with map-side partial collect_set — the
    reference's second parallelStream pass collapses into one shuffle;
    both aggregates share it (conditional collect_set, no second
    scan)."""
    ev = _t(spark, sf_dir, "events")
    trait = F.concat_ws("|", F.array_sort(F.collect_set("event_type")))
    stored = F.concat_ws(
        "|",
        F.array_sort(
            F.collect_set(F.when(F.col("event_id") % 3 != 0, F.col("event_type")))
        ),
    )
    return (
        ev.groupBy("user_id")
        .agg(trait.alias("trait_names"), stored.alias("stored_names"))
        .withColumn("updated", F.col("trait_names") != F.col("stored_names"))
    )


# ---------------------------------------------------------------------
# A4 — PubMed id aggregate (sorted, prefixed, pipe-joined)
# ---------------------------------------------------------------------

@register(
    "pubmed_aggregate",
    """
    SELECT o_custkey AS rgd_id,
           array_to_string(list_sort(list_distinct(
               list('PMID:' || CAST(o_orderkey AS VARCHAR)))), '|') AS pmids
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_custkey
    """,
)
def q_pubmed_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 (VariantAnnotator.java:625-634): per variant, the sorted
    'PMID:'-prefixed, '|'-joined set of PubMed accessions (after F16
    sanitation, covered by sanitize_ids).

    Scale: single groupBy, partial aggregation map-side."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderstatus") == "F")
        .groupBy(F.col("o_custkey").alias("rgd_id"))
        .agg(
            F.concat_ws(
                "|",
                F.array_sort(
                    F.collect_set(
                        F.concat(F.lit("PMID:"), F.col("o_orderkey").cast("string"))
                    )
                ),
            ).alias("pmids")
        )
    )


# ---------------------------------------------------------------------
# A8 — unmatchable-condition inverse-frequency histogram, split report
# ---------------------------------------------------------------------

@register(
    "unmatchable_report",
    """
    WITH h AS (
        SELECT upper(p_brand) AS cond, count(*) AS cnt
        FROM part GROUP BY upper(p_brand)
    )
    SELECT CASE WHEN cond LIKE '%#1_' THEN 'related' ELSE 'plain' END
               AS report,
           cnt,
           array_to_string(list_sort(list(cond)), '|') AS conditions
    FROM h
    GROUP BY report, cnt
    """,
)
def q_unmatchable_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 (VariantAnnotator.java:583-607,690-762): upper-cased condition
    -> hit count, inverted into count -> sorted name-list groups, split
    into two reports by a name-suffix predicate ('-RELATED …'). This is
    also the S10 report sink shape (VariantAnnotator.java:690-762): the
    result writes as the unmatchable-conditions text files via
    df.write.text.

    Scale: two tiny groupBys over an already-aggregated histogram; the
    second shuffle moves one row per distinct condition."""
    p = _t(spark, sf_dir, "part")
    hist = p.groupBy(F.upper("p_brand").alias("cond")).count()
    return (
        hist.withColumn(
            "report",
            F.when(F.col("cond").like("%#1_"), "related").otherwise("plain"),
        )
        .groupBy("report", F.col("count").alias("cnt"))
        .agg(
            F.concat_ws("|", F.array_sort(F.collect_list("cond"))).alias(
                "conditions"
            )
        )
    )


# ---------------------------------------------------------------------
# J2/O5 — gene match cascade: by-id, then by-symbol with multiplicity
# ---------------------------------------------------------------------

@register(
    "gene_match_cascade",
    """
    SELECT c_custkey,
           CASE WHEN s1.s_suppkey IS NOT NULL THEN s1.s_suppkey
                WHEN s2.sym_cnt = 1 THEN s2.sym_gid END AS gene_id,
           CASE WHEN s1.s_suppkey IS NOT NULL THEN 'id'
                WHEN s2.sym_cnt = 1 THEN 'symbol'
                WHEN s2.sym_cnt > 1 THEN 'multi'
                ELSE 'none' END AS tier
    FROM customer
    LEFT JOIN supplier s1 ON c_custkey = s1.s_suppkey
    LEFT JOIN (SELECT s_nationkey, min(s_suppkey) AS sym_gid,
                      count(*) AS sym_cnt
               FROM supplier GROUP BY s_nationkey) s2
           ON c_nationkey = s2.s_nationkey
    """,
)
def q_gene_match_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 (GeneAssociations.java:38-72, Dao.java:325-349): primary
    lookup by gene id, fallback by symbol where the primary missed, with
    the O5 ambiguity rule — >1 symbol hit is a distinct 'multi' outcome
    counted separately, not a match.

    Scale: both lookup sides are small dims -> two broadcast joins, no
    shuffle of the fact side; multiplicity is pre-aggregated on the dim
    (one row per symbol) instead of a window over the fact."""
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    by_sym = s.groupBy("s_nationkey").agg(
        F.min("s_suppkey").alias("sym_gid"), F.count("*").alias("sym_cnt")
    )
    return (
        c.join(
            F.broadcast(s.select("s_suppkey")),
            F.col("c_custkey") == F.col("s_suppkey"),
            "left",
        )
        .join(
            F.broadcast(by_sym),
            F.col("c_nationkey") == F.col("s_nationkey"),
            "left",
        )
        .select(
            "c_custkey",
            F.when(F.col("s_suppkey").isNotNull(), F.col("s_suppkey"))
            .when(F.col("sym_cnt") == 1, F.col("sym_gid"))
            .alias("gene_id"),
            F.when(F.col("s_suppkey").isNotNull(), "id")
            .when(F.col("sym_cnt") == 1, "symbol")
            .when(F.col("sym_cnt") > 1, "multi")
            .otherwise("none")
            .alias("tier"),
        )
    )


# ---------------------------------------------------------------------
# J7 — alias diff: case-insensitive key + RCV-set pre-delete guard
# ---------------------------------------------------------------------

_ALIAS_SQL = """
    WITH existing AS (
        SELECT o_custkey AS rgd_id, lower(o_orderpriority) AS value_key,
               max(upper(o_orderpriority)) AS value,
               min('RCV' || CAST(o_orderkey % 5 AS VARCHAR)) AS notes
        FROM orders WHERE o_orderdate < TIMESTAMP '1998-06-01'
        GROUP BY o_custkey, lower(o_orderpriority)
    ),
    incoming AS (
        SELECT o_custkey AS rgd_id, lower(o_orderpriority) AS value_key,
               min(lower(o_orderpriority)) AS value
        FROM orders WHERE o_orderdate >= TIMESTAMP '1998-06-01'
        GROUP BY o_custkey, lower(o_orderpriority)
    ),
    rcv AS (
        SELECT DISTINCT 'RCV' || CAST(o_orderkey % 3 AS VARCHAR) AS rcv_id
        FROM orders WHERE o_orderdate >= TIMESTAMP '1998-06-01'
    ),
    guarded AS (
        SELECT e.* FROM existing e JOIN rcv ON e.notes = rcv.rcv_id
    ),
    pre_del AS (
        SELECT e.rgd_id, e.value_key, 'DELETE' AS change_type
        FROM existing e
        WHERE e.notes NOT IN (SELECT rcv_id FROM rcv)
    ),
    diff AS (
        SELECT coalesce(i.rgd_id, g.rgd_id) AS rgd_id,
               coalesce(i.value_key, g.value_key) AS value_key,
               CASE WHEN g.rgd_id IS NULL THEN 'INSERT'
                    WHEN i.rgd_id IS NULL THEN 'DELETE'
                    WHEN i.value <> g.value THEN 'UPDATE'
                    ELSE 'UNCHANGED' END AS change_type
        FROM incoming i
        FULL OUTER JOIN guarded g
          ON i.rgd_id = g.rgd_id AND i.value_key = g.value_key
    )
    SELECT * FROM diff UNION ALL SELECT * FROM pre_del
"""


@register("alias_diff", _ALIAS_SQL)
def q_alias_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 (Aliases.java:51-138): alias sync with a case-insensitive
    value key, plus the RCV guard — existing aliases whose notes (RCV
    accession) are absent from the current run's RCV set are deleted
    up-front, before the diff; a pre-deleted key re-arriving in the
    incoming set therefore yields a DELETE row *and* an INSERT row,
    mirroring the reference's delete-before-insert ordering.

    Scale: snapshots of both sides shuffle once on the same composite
    key (generic diff_sync); the RCV set is tiny -> broadcast semi/anti
    join for the guard."""
    o = _t(spark, sf_dir, "orders")
    cutoff = F.lit("1998-06-01").cast("timestamp")
    existing = (
        o.filter(F.col("o_orderdate") < cutoff)
        .groupBy(
            F.col("o_custkey").alias("rgd_id"),
            F.lower("o_orderpriority").alias("value_key"),
        )
        .agg(
            F.max(F.upper("o_orderpriority")).alias("value"),
            F.min(
                F.concat(F.lit("RCV"), (F.col("o_orderkey") % 5).cast("string"))
            ).alias("notes"),
        )
    )
    incoming_rows = o.filter(F.col("o_orderdate") >= cutoff)
    incoming = incoming_rows.groupBy(
        F.col("o_custkey").alias("rgd_id"),
        F.lower("o_orderpriority").alias("value_key"),
    ).agg(F.min(F.lower("o_orderpriority")).alias("value"))
    rcv = incoming_rows.select(
        F.concat(F.lit("RCV"), (F.col("o_orderkey") % 3).cast("string")).alias(
            "rcv_id"
        )
    ).distinct()
    guarded = existing.join(
        F.broadcast(rcv), F.col("notes") == F.col("rcv_id"), "semi"
    )
    pre_del = existing.join(
        F.broadcast(rcv), F.col("notes") == F.col("rcv_id"), "anti"
    ).select("rgd_id", "value_key", F.lit("DELETE").alias("change_type"))
    diff = diff_sync(
        incoming, guarded, key_cols=["rgd_id", "value_key"], compare_cols=["value"]
    ).select("rgd_id", "value_key", "change_type")
    return diff.unionByName(pre_del)


# ---------------------------------------------------------------------
# J17 — dbSNP position join: (chr, pos, ref, alt) -> snp_name
# ---------------------------------------------------------------------

@register(
    "vcf_position_checks",
    """
    WITH db_snp AS (
        SELECT chr, pos, ref, alt, min(snp) AS snp_name
        FROM (SELECT CASE p_partkey % 3 WHEN 0 THEN 'A' WHEN 1 THEN 'N'
                     ELSE 'R' END AS chr,
                     p_partkey % 500 AS pos,
                     CASE p_partkey % 2 WHEN 0 THEN 'O' ELSE 'F' END AS ref,
                     CAST(p_partkey % 4 AS VARCHAR) AS alt,
                     'rs' || CAST(p_partkey AS VARCHAR) AS snp
              FROM part)
        GROUP BY chr, pos, ref, alt
    ),
    v AS (
        SELECT l_orderkey, l_linenumber, l_returnflag AS chr,
               l_partkey % 500 AS pos, l_linestatus AS ref,
               CAST(l_suppkey % 4 AS VARCHAR) AS alt,
               p_partkey AS rb_pos,
               CASE l_suppkey % 4 WHEN 0 THEN 'a' WHEN 1 THEN 'b'
                    WHEN 2 THEN 'm' ELSE 's' END AS rb_ref,
               substr(p_name, 1, 1) AS rb_base
        FROM lineitem JOIN part ON l_partkey = p_partkey
    )
    SELECT l_orderkey, l_linenumber, v.chr, v.pos, v.ref, v.alt, snp_name,
           rb_pos, rb_ref, rb_base, rb_ref <> rb_base AS has_bad_ref
    FROM v
    LEFT JOIN db_snp d
      ON v.chr = d.chr AND v.pos = d.pos AND v.ref = d.ref AND v.alt = d.alt
    """,
)
def q_vcf_position_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J17 (Clinvar2Vcf.java:420-448) + J18/F18 (Clinvar2Vcf.java:
    362-403,188-190): the VCF per-position validation pass. rs-id
    validation is a 4-column equi-join against the db_snp table
    (replacing the reference's per-row JDBC lookup inside a
    parallelStream); SNV reference-base validation joins a
    per-position reference-base table — the broadcast FASTA-slice
    lookup replacing S12's per-row HTTP fetches — and flags mismatches
    (rb_*/has_bad_ref) for the downstream F18 filter.

    Scale: both lookup tables are broadcast dims (db_snp deduped first,
    bounded by distinct positions); the fact side never shuffles and
    both checks ride one scan."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    db_snp = (
        p.select(
            F.when(F.col("p_partkey") % 3 == 0, "A")
            .when(F.col("p_partkey") % 3 == 1, "N")
            .otherwise("R")
            .alias("chr"),
            (F.col("p_partkey") % 500).alias("pos"),
            F.when(F.col("p_partkey") % 2 == 0, "O").otherwise("F").alias("ref"),
            (F.col("p_partkey") % 4).cast("string").alias("alt"),
            F.concat(F.lit("rs"), F.col("p_partkey").cast("string")).alias("snp"),
        )
        .groupBy("chr", "pos", "ref", "alt")
        .agg(F.min("snp").alias("snp_name"))
    )
    rb_ref = (
        F.when(F.col("l_suppkey") % 4 == 0, "a")
        .when(F.col("l_suppkey") % 4 == 1, "b")
        .when(F.col("l_suppkey") % 4 == 2, "m")
        .otherwise("s")
    )
    rb_base = F.substring("p_name", 1, 1)
    v = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")).select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_returnflag").alias("chr"),
        (F.col("l_partkey") % 500).alias("pos"),
        F.col("l_linestatus").alias("ref"),
        (F.col("l_suppkey") % 4).cast("string").alias("alt"),
        F.col("p_partkey").alias("rb_pos"),
        rb_ref.alias("rb_ref"),
        rb_base.alias("rb_base"),
        (rb_ref != rb_base).alias("has_bad_ref"),
    )
    return v.join(F.broadcast(db_snp), ["chr", "pos", "ref", "alt"], "left").select(
        "l_orderkey",
        "l_linenumber",
        "chr",
        "pos",
        "ref",
        "alt",
        "snp_name",
        "rb_pos",
        "rb_ref",
        "rb_base",
        "has_bad_ref",
    )


# ---------------------------------------------------------------------
# W3 — last-modified propagation (OR of satellite change flags)
# ---------------------------------------------------------------------

@register(
    "last_modified_propagation",
    """
    WITH flags AS (
        SELECT o_custkey,
               max(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS f1,
               max(CASE WHEN o_orderpriority LIKE '1-%' THEN 1 ELSE 0 END)
                   AS f2
        FROM orders GROUP BY o_custkey
    )
    SELECT c_custkey,
           coalesce(f1 = 1 OR f2 = 1, false) AS changed,
           CASE WHEN coalesce(f1 = 1 OR f2 = 1, false) THEN '2026-08-13'
                ELSE strftime(DATE '2024-01-01' + INTERVAL (c_custkey % 365) DAY,
                              '%Y-%m-%d') END AS last_modified
    FROM customer LEFT JOIN flags ON c_custkey = o_custkey
    """,
)
def q_last_modified_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 (Loader.java:27-78, Dao.java:299-301): the variant's
    last_modified is touched iff any satellite diff changed — the OR of
    per-entity change flags joined back to the variant row.

    Scale: flags are pre-aggregated per key before the join (one row
    per variant), so the join input is minimal; at 100 TB both sides
    hash-partition on the same key."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    flags = o.groupBy("o_custkey").agg(
        F.max(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("f1"),
        F.max(
            F.when(F.col("o_orderpriority").like("1-%"), 1).otherwise(0)
        ).alias("f2"),
    )
    changed = F.coalesce(
        (F.col("f1") == 1) | (F.col("f2") == 1), F.lit(False)
    )
    return (
        c.join(flags, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(
            "c_custkey",
            changed.alias("changed"),
            F.when(changed, F.lit("2026-08-13"))
            .otherwise(
                F.date_format(
                    F.date_add(
                        F.to_date(F.lit("2024-01-01")),
                        (F.col("c_custkey") % 365).cast("int"),
                    ),
                    "yyyy-MM-dd",
                )
            )
            .alias("last_modified"),
        )
    )


# ---------------------------------------------------------------------
# F14/F15 — carpe-compliance + excluded-condition filters
# ---------------------------------------------------------------------

@register(
    "carpe_filter",
    r"""
    SELECT o_orderkey,
           regexp_replace(o_orderpriority || ' [RCV'
                          || CAST(o_orderkey AS VARCHAR) || ']',
                          ' \[RCV[0-9]+\]$', '') AS condition_name,
           o_orderstatus AS clinsig
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM',
                              '4-NOT SPECIFIED')
      AND o_orderstatus <> 'P'
      AND NOT (o_orderstatus = 'O' AND o_custkey % 10 = 0)
      AND regexp_replace(o_orderpriority || ' [RCV'
                         || CAST(o_orderkey AS VARCHAR) || ']',
                         ' \[RCV[0-9]+\]$', '') NOT IN ('5-LOW')
    """,
)
def q_carpe_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F14 (VariantAnnotator.java:245-266): allowed-type isin + excluded
    clin-sig + the compound NOT(uncertain AND submitter=X) rule. F15
    (VariantAnnotator.java:433-445): strip the ' [RCVxxxx]' suffix, then
    drop configured junk condition names.

    Scale: a pure predicate stack — pushed to the scan, codegen'd, no
    shuffle."""
    o = _t(spark, sf_dir, "orders")
    cond = F.regexp_replace(
        F.concat(
            F.col("o_orderpriority"),
            F.lit(" [RCV"),
            F.col("o_orderkey").cast("string"),
            F.lit("]"),
        ),
        r" \[RCV[0-9]+\]$",
        "",
    )
    return (
        o.filter(
            F.col("o_orderpriority").isin(
                "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED"
            )
            & (F.col("o_orderstatus") != "P")
            & ~((F.col("o_orderstatus") == "O") & (F.col("o_custkey") % 10 == 0))
            & ~cond.isin("5-LOW")
        )
        .select(
            "o_orderkey",
            cond.alias("condition_name"),
            F.col("o_orderstatus").alias("clinsig"),
        )
    )


# ---------------------------------------------------------------------
# J19 — annot-count lookup (cached count -> groupBy-count + join)
# ---------------------------------------------------------------------

@register(
    "annot_count_lookup",
    """
    SELECT o.o_orderkey, o.o_custkey AS rgd_id,
           o.o_orderpriority AS term, o.o_orderstatus AS qualifier,
           c.cnt - 1 AS other_annot_count
    FROM orders o
    JOIN (SELECT o_custkey, o_orderpriority, o_orderstatus,
                 count(*) AS cnt
          FROM orders
          GROUP BY o_custkey, o_orderpriority, o_orderstatus) c
      ON o.o_custkey = c.o_custkey
     AND o.o_orderpriority = c.o_orderpriority
     AND o.o_orderstatus = c.o_orderstatus
    """,
)
def q_annot_count_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J19 (Dao.java:665-688): count existing annotations for
    (rgd_id, term, qualifier) excluding the row's own ref — the
    reference's synchronized HashMap cache around a COUNT(*) query
    becomes one groupBy-count joined back to the fact (every key
    distinct by orderkey, so 'excluding own ref' = group count - 1).

    Scale: the pre-aggregated count side is one row per key — orders of
    magnitude smaller than the fact — and both sides hash-partition on
    the same composite key (AQE will pick broadcast when it fits)."""
    o = _t(spark, sf_dir, "orders")
    key = ["o_custkey", "o_orderpriority", "o_orderstatus"]
    counts = o.groupBy(*key).agg(F.count("*").alias("cnt"))
    return o.join(counts, key).select(
        "o_orderkey",
        F.col("o_custkey").alias("rgd_id"),
        F.col("o_orderpriority").alias("term"),
        F.col("o_orderstatus").alias("qualifier"),
        (F.col("cnt") - 1).alias("other_annot_count"),
    )


# ---------------------------------------------------------------------
# Skew mitigation — salted two-phase aggregation (extension; SURVEY §4)
# ---------------------------------------------------------------------

@register(
    "skew_salted_agg",
    """
    SELECT event_type, count(*) AS n,
           round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS total,
           array_to_string(list_sort(list_distinct(
               list(CAST(user_id AS VARCHAR)))), '|') AS users
    FROM events
    GROUP BY event_type
    """,
)
def q_skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-tolerant aggregation (operators/skew.py): the events table
    has ~5 event types, so a plain groupBy funnels every hot key
    through one task. Phase 1 groups on (key, salt) — the hot key
    spreads over 16 tasks; phase 2 merges 16 partial rows per key.
    Results are identical to the plain groupBy (the oracle IS the
    plain formulation); only the physical plan differs.

    Scale: phase-2 shuffle volume = n_salts rows per distinct key,
    independent of data skew."""
    from clinvar_pipeline_spark.operators.skew import salted_groupby_agg

    e = _t(spark, sf_dir, "events")
    return salted_groupby_agg(
        e,
        key_cols=["event_type"],
        partial_aggs={
            "c": F.count(F.lit(1)),
            "t": F.sum(F.col("value").cast(DEC4)),
            "s": F.collect_set(F.col("user_id").cast("string")),
        },
        final_aggs={
            "n": F.sum("c"),
            "total": F.round(F.sum("t").cast("double"), 4),
            "users": F.concat_ws(
                "|",
                F.array_sort(F.array_distinct(F.flatten(F.collect_list("s")))),
            ),
        },
        n_salts=16,
        salt_basis=["event_id"],
    )



@register(
    "skew_salted_join",
    """
    WITH profile AS (
        SELECT user_id,
               round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4)
                 AS total_value,
               CASE WHEN sum(CAST(value AS DECIMAL(18,4))) >= 3300
                    THEN 'high' ELSE 'low' END AS tier
        FROM events GROUP BY user_id)
    SELECT e.event_type, p.tier, count(*) AS n,
           round(CAST(sum(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE), 4)
             AS segment_value
    FROM events e JOIN profile p ON e.user_id = p.user_id
    GROUP BY e.event_type, p.tier
    ORDER BY event_type, tier
    """,
)
def q_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-tolerant large x large join (operators/skew.py
    salted_join): enrich the event stream with a per-user profile
    built from the stream itself — the fact x fact self-enrichment
    where BOTH sides are data-sized (no broadcast escape) and a hot
    user would overflow one sort-merge task on both sides at once,
    the case AQE's one-sided skew split doesn't fully cover. The left
    side carries a deterministic xxhash64 salt; the profile side
    replicates across the 16 salts; the join key widens to
    (user_id, salt). Results are identical to the plain join (the
    oracle IS the plain formulation); only the physical spread
    differs.

    Scale: both sides shuffle exactly once (same as unsalted — just
    on the wider key); the replication cost is n_salts x the SMALLER
    side, the documented sizing rule. The tier threshold is an exact
    DECIMAL comparison so the segment boundary is engine-identical."""
    from clinvar_pipeline_spark.operators.skew import salted_join

    e = _t(spark, sf_dir, "events")
    profile = e.groupBy("user_id").agg(
        F.round(
            F.sum(F.col("value").cast(DEC4)).cast("double"), 4
        ).alias("total_value"),
        F.when(
            F.sum(F.col("value").cast(DEC4)) >= 3300, F.lit("high")
        ).otherwise(F.lit("low")).alias("tier"),
    )
    enriched = salted_join(
        e.select("user_id", "event_type", "value"),
        profile,
        on=["user_id"],
        n_salts=16,
        salt_basis=["user_id", "event_type", "value"],
    )
    return (
        enriched.groupBy("event_type", "tier")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.col("value").cast(DEC4)).cast("double"), 4
            ).alias("segment_value"),
        )
        .orderBy("event_type", "tier")
    )


# (BPE-ish token counting and the rolling-hash fingerprint live in the
# fused single-pass profiles: queries.py text_profile / doc_fingerprint)


# ---------------------------------------------------------------------
# Distribution profiling: exact grouped quantiles (oracle-checkable
# twin of the sketch aggregates in operators/sketch.py)
# ---------------------------------------------------------------------

@register(
    "value_quantiles",
    """
    SELECT event_type,
           round(quantile_cont(value, 0.25), 6) AS q25,
           round(quantile_cont(value, 0.5), 6) AS q50,
           round(quantile_cont(value, 0.75), 6) AS q75,
           round(quantile_cont(value, 0.95), 6) AS q95,
           count(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
)
def q_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped distribution profile: exact continuous quantiles
    (linear interpolation at rank p*(n-1), the definition Spark
    `percentile` and DuckDB `quantile_cont` share) + exact distinct
    users. At 100 TB the same profile runs through the sketch twins in
    operators/sketch.py (percentile_approx / approx_count_distinct,
    fixed-size merge state instead of a full value shuffle); the exact
    formulation here is the oracle-checkable contract the sketches'
    error-bound tests pin against."""
    e = _t(spark, sf_dir, "events")
    pct = F.expr("percentile(value, array(0.25D, 0.5D, 0.75D, 0.95D))")
    return (
        e.groupBy("event_type")
        .agg(
            pct.alias("_q"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            "event_type",
            F.round(F.col("_q").getItem(0), 6).alias("q25"),
            F.round(F.col("_q").getItem(1), 6).alias("q50"),
            F.round(F.col("_q").getItem(2), 6).alias("q75"),
            F.round(F.col("_q").getItem(3), 6).alias("q95"),
            "n_users",
        )
    )


# ---------------------------------------------------------------------
# J8/J9 — concept -> OMIM -> RDO synonym join chain
# ---------------------------------------------------------------------

@register(
    "concept_omim_match",
    """
    WITH xdb AS (
        SELECT o_custkey AS rgd_id,
               'C' || CAST(o_orderkey % 1000 AS VARCHAR) AS cui
        FROM orders WHERE o_orderkey % 5 = 0
    ),
    assocs AS (
        SELECT o_custkey AS rgd_id, o_orderkey % 200 AS gene_rgd_id
        FROM orders
    ),
    co AS (
        SELECT DISTINCT 'C' || CAST(p_partkey % 1000 AS VARCHAR) AS cui,
               p_partkey % 200 AS gene_rgd_id,
               CAST(p_partkey % 400 AS VARCHAR) AS omim_id
        FROM part
    ),
    omims AS (
        SELECT DISTINCT x.rgd_id, co.omim_id
        FROM xdb x
        JOIN assocs a ON x.rgd_id = a.rgd_id
        JOIN co ON co.cui = x.cui AND co.gene_rgd_id = a.gene_rgd_id
    ),
    rdo AS (
        SELECT 'RDO:' || CAST(p_partkey AS VARCHAR) AS term_acc,
               p_name AS term
        FROM part WHERE NOT (p_partkey % 11 = 0)
    ),
    syn AS (
        SELECT 'RDO:' || CAST(p_partkey AS VARCHAR) AS term_acc,
               'OMIM:' || CAST(p_partkey % 400 AS VARCHAR) AS name
        FROM part WHERE NOT (p_partkey % 13 = 0)
    ),
    omim_syn AS (
        SELECT s.term_acc, r.term,
               regexp_replace(s.name, '^OMIM:', '') AS omim_id
        FROM syn s JOIN rdo r USING (term_acc)
    )
    SELECT DISTINCT o.rgd_id, t.term_acc, t.term,
           'OMIM:' || o.omim_id AS match_by
    FROM omims o JOIN omim_syn t USING (omim_id)
    """,
)
def q_concept_omim_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8+J9 (VariantAnnotator.java:391-423, Lookups.java concept->OMIM
    and OMIM->RDO synonym maps): drives plans/annotate.py:205
    ``concept_terms`` — variant MedGen CUIs x associated genes ->
    concept-to-OMIM table -> RDO terms via exact 'OMIM:<id>' synonyms
    on non-obsolete terms. Inputs are residue-derived from orders/part
    so the DuckDB twin reproduces them exactly.

    Scale: concept_omim and the synonym map are dim-sized -> broadcast
    inside concept_terms; the only fact-side shuffles are the
    rgd_id-keyed join and the final distinct."""
    from clinvar_pipeline_spark.plans.annotate import concept_terms

    o = _t(spark, sf_dir, "orders")
    p = _t(spark, sf_dir, "part")
    xdb = o.filter(F.col("o_orderkey") % 5 == 0).select(
        F.col("o_custkey").alias("rgd_id"),
        F.lit(54).alias("xdb_key"),
        F.concat(F.lit("C"), (F.col("o_orderkey") % 1000).cast("string")).alias(
            "acc_id"
        ),
    )
    assocs = o.select(
        F.col("o_custkey").alias("variant_rgd_id"),
        (F.col("o_orderkey") % 200).alias("gene_rgd_id"),
    )
    concept_omim = p.select(
        F.concat(F.lit("C"), (F.col("p_partkey") % 1000).cast("string")).alias(
            "cui"
        ),
        (F.col("p_partkey") % 200).alias("gene_rgd_id"),
        (F.col("p_partkey") % 400).cast("string").alias("omim_id"),
    ).distinct()
    ont_terms = p.select(
        F.concat(F.lit("RDO:"), F.col("p_partkey").cast("string")).alias(
            "acc_id"
        ),
        F.lit("RDO").alias("ontology_id"),
        F.col("p_name").alias("term"),
        (F.col("p_partkey") % 11 == 0).alias("is_obsolete"),
    )
    ont_synonyms = p.filter(~(F.col("p_partkey") % 13 == 0)).select(
        F.concat(F.lit("RDO:"), F.col("p_partkey").cast("string")).alias(
            "term_acc"
        ),
        F.concat(F.lit("OMIM:"), (F.col("p_partkey") % 400).cast("string")).alias(
            "name"
        ),
        F.lit("exact").alias("type"),
    )
    return concept_terms(
        variants=None,
        xdb_ids=xdb,
        gene_assocs=assocs,
        concept_omim=concept_omim,
        ont_terms=ont_terms,
        ont_synonyms=ont_synonyms,
    )


# ---------------------------------------------------------------------
# J15/W5 — annotation existence diff over the 5-field annotation key
# ---------------------------------------------------------------------

_ANNOT_DIFF_SQL = """
    WITH incoming AS (
        SELECT o_custkey AS annotated_object_rgd_id,
               'RDO:' || CAST(o_orderkey % 300 AS VARCHAR) AS term_acc,
               CASE WHEN o_orderkey % 2 = 0 THEN 'D' ELSE 'H' END AS aspect,
               CASE WHEN o_custkey % 4 = 0 THEN 'ISO' ELSE 'IAGP' END
                   AS evidence,
               'RGD:' || CAST(o_custkey % 50 AS VARCHAR) AS with_info,
               'PMID:' || CAST(o_orderkey % 70 AS VARCHAR) AS xref_source
        FROM orders WHERE o_orderkey % 13 != 0
    ),
    existing AS (
        SELECT o_custkey AS annotated_object_rgd_id,
               'RDO:' || CAST(o_orderkey % 300 AS VARCHAR) AS term_acc,
               CASE WHEN o_orderkey % 2 = 0 THEN 'D' ELSE 'H' END AS aspect,
               CASE WHEN o_custkey % 4 = 0 THEN 'ISO' ELSE 'IAGP' END
                   AS evidence,
               'RGD:' || CAST(o_custkey % 50 AS VARCHAR) AS with_info,
               'PMID:' || CAST((CASE WHEN o_orderkey % 7 = 0
                                     THEN o_orderkey + 1
                                     ELSE o_orderkey END) % 70 AS VARCHAR)
                   AS xref_source
        FROM orders WHERE o_orderkey % 10 != 0
    ),
    keyed AS (
        SELECT COALESCE(i.annotated_object_rgd_id, e.annotated_object_rgd_id)
                   AS annotated_object_rgd_id,
               COALESCE(i.term_acc, e.term_acc) AS term_acc,
               COALESCE(i.aspect, e.aspect) AS aspect,
               COALESCE(i.evidence, e.evidence) AS evidence,
               COALESCE(i.with_info, e.with_info) AS with_info,
               CASE WHEN e.annotated_object_rgd_id IS NULL THEN 'INSERT'
                    WHEN i.annotated_object_rgd_id IS NULL THEN 'DELETE'
                    WHEN i.xref_source IS DISTINCT FROM e.xref_source
                         THEN 'UPDATE'
                    ELSE 'UNCHANGED' END AS change_type
        FROM incoming i
        FULL OUTER JOIN existing e
          ON i.annotated_object_rgd_id = e.annotated_object_rgd_id
         AND i.term_acc = e.term_acc AND i.aspect = e.aspect
         AND i.evidence = e.evidence AND i.with_info = e.with_info
    )
    SELECT change_type, count(*) AS n,
           CAST(count(DISTINCT annotated_object_rgd_id) AS BIGINT)
               AS n_objects
    FROM keyed GROUP BY change_type
"""


@register("annot_diff", _ANNOT_DIFF_SQL)
def q_annot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J15 (AnnotCache.java:36-75, Dao.java:576-596): annotation
    existence diff over the 5-field annotation key (object, term,
    aspect, evidence, with_info) with xref_source as the update-compare
    column — the write path that decides insert vs update-last-modified
    vs stale for every annotation, summarized per change class.

    Scale: one full-outer hash join on the composite key (the same
    bucketed-snapshot layout as the variant diff applies), then a
    partial-aggregated groupBy on 4 change classes."""
    o = _t(spark, sf_dir, "orders")

    def annots(flt: int, perturb: bool) -> DataFrame:
        okey = (
            F.when(
                (F.col("o_orderkey") % 7 == 0) & F.lit(perturb),
                F.col("o_orderkey") + 1,
            ).otherwise(F.col("o_orderkey"))
            if perturb
            else F.col("o_orderkey")
        )
        return o.filter(F.col("o_orderkey") % flt != 0).select(
            F.col("o_custkey").alias("annotated_object_rgd_id"),
            F.concat(
                F.lit("RDO:"), (F.col("o_orderkey") % 300).cast("string")
            ).alias("term_acc"),
            F.when(F.col("o_orderkey") % 2 == 0, "D").otherwise("H").alias(
                "aspect"
            ),
            F.when(F.col("o_custkey") % 4 == 0, "ISO").otherwise("IAGP").alias(
                "evidence"
            ),
            F.concat(
                F.lit("RGD:"), (F.col("o_custkey") % 50).cast("string")
            ).alias("with_info"),
            F.concat(F.lit("PMID:"), (okey % 70).cast("string")).alias(
                "xref_source"
            ),
        )

    diff = diff_sync(
        annots(13, False),
        annots(10, True),
        key_cols=[
            "annotated_object_rgd_id",
            "term_acc",
            "aspect",
            "evidence",
            "with_info",
        ],
        compare_cols=["xref_source"],
    )
    return diff.groupBy("change_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("annotated_object_rgd_id").alias("n_objects"),
    )
