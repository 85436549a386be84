"""rs-id assignment semantics: the positional dbSNP lookup
(Clinvar2Vcf.java:420-448) must not fan out variants with multiple
GRCh38 placements, and the xdb-sourced VariantRsId pipeline
(VariantRsId.java:21-60) must only update differing values."""

from pyspark.sql import functions as F

from clinvar_pipeline_spark.plans.vcf import add_rs_ids, assign_rs_from_xdb


def test_add_rs_ids_no_fanout_on_multi_placement(spark):
    # variant 1 has TWO GRCh38 placements, both matching dbSNP rows
    variants = spark.createDataFrame(
        [(1, "A", "G"), (2, "C", "T")],
        "rgd_id long, ref_nuc string, var_nuc string",
    )
    map_positions = spark.createDataFrame(
        [
            (1, 38, "1", 100),
            (1, 38, "1", 200),  # second placement -> would fan out pre-fix
            (2, 38, "2", 300),
        ],
        "rgd_id long, map_key int, chromosome string, start_pos int",
    )
    db_snp = spark.createDataFrame(
        [
            ("1", 100, "A", "G", "rs111"),
            ("1", 200, "A", "G", "rs222"),
            ("2", 300, "C", "T", "rs333"),
        ],
        "chromosome string, position int, ref_allele string,"
        " allele string, snp_name string",
    )
    out = add_rs_ids(variants, map_positions, db_snp)
    rows = {r["rgd_id"]: r["rs_id"] for r in out.collect()}
    assert out.count() == 2  # exactly one row per input variant
    assert rows[1] == "rs111"  # deterministic min over both placements
    assert rows[2] == "rs333"


def test_assign_rs_from_xdb_matches_variant_rs_id_semantics(spark):
    variants = spark.createDataFrame(
        [
            (1, "rs_old"),   # differing candidate -> updated
            (2, "rs222"),    # equal candidate -> untouched (no-op rule)
            (3, None),       # null stored -> updated
            (4, "rs_keep"),  # no key-48 rs candidate -> untouched
            (5, "rs000"),    # min candidate EQUALS stored: the equal one
                             # is skipped, the differing one still applies
                             # (VariantRsId.java:39 filters equal inside
                             # the loop, BEFORE any pick)
        ],
        "rgd_id long, rs_id string",
    )
    xdb_ids = spark.createDataFrame(
        [
            (1, 48, "397704705", "rs111"),
            (1, 48, "397704706", "rs000"),  # min over differing wins
            (2, 48, "5", "rs222"),
            (3, 48, "6", "rs333"),
            (4, 21, "HGNC:1", "rsNOT48"),   # wrong key: ignored
            (4, 48, "7", "ss444"),          # no 'rs' prefix: ignored
            (5, 48, "8", "rs000"),          # equal -> skipped
            (5, 48, "9", "rs111"),          # differing -> applied
        ],
        "rgd_id long, xdb_key int, acc_id string, link_text string",
    )
    out = assign_rs_from_xdb(variants, xdb_ids)
    rows = {r["rgd_id"]: r["rs_id"] for r in out.collect()}
    assert out.count() == 5
    assert rows == {1: "rs000", 2: "rs222", 3: "rs333", 4: "rs_keep", 5: "rs111"}


def test_assign_rs_from_xdb_adds_missing_column(spark):
    variants = spark.createDataFrame([(1,)], "rgd_id long")
    xdb_ids = spark.createDataFrame(
        [(1, 48, "x", "rs9")],
        "rgd_id long, xdb_key int, acc_id string, link_text string",
    )
    out = assign_rs_from_xdb(variants, xdb_ids)
    assert out.collect()[0]["rs_id"] == "rs9"
