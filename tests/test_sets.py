"""Golden tests for the sorted-set expression algebra (M1-M5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from clinvar_pipeline_spark.functions.sets import (
    array_to_pipe,
    merge_pipe_sets,
    merge_pipe_sets_ci,
    newer_date,
    pipe_set_agg,
    pipe_to_array,
    ranked_clinsig_merge,
)


def one(spark, expr, **cols):
    df = spark.createDataFrame([cols or {"dummy": 1}])
    return df.select(expr.alias("out")).collect()[0]["out"]


def test_pipe_roundtrip(spark):
    assert one(spark, array_to_pipe(pipe_to_array(F.lit("b|a|b"))) ) == "a|b"
    assert one(spark, array_to_pipe(pipe_to_array(F.lit(None).cast("string")))) == ""


def test_merge_pipe_sets(spark):
    assert one(spark, merge_pipe_sets(F.lit("b|c"), F.lit("a|c"))) == "a|b|c"
    assert one(spark, merge_pipe_sets(F.lit(None).cast("string"), F.lit("x"))) == "x"


def test_merge_pipe_sets_ci_incoming_spelling_wins(spark):
    # 'Foo' incoming replaces existing 'foo'; existing 'bar' survives
    assert (
        one(spark, merge_pipe_sets_ci(F.lit("Foo"), F.lit("foo|bar"))) == "Foo|bar"
    )


def test_ranked_clinsig_merge_orders_by_severity(spark):
    out = one(
        spark,
        ranked_clinsig_merge(F.lit("benign, pathogenic"), F.lit("not provided|likely benign")),
    )
    # QC.java:160-197 ranks: pathogenic=0 < benign=40 < likely benign=50
    assert out == "pathogenic|benign|likely benign|not provided"


def test_ranked_clinsig_merge_unknowns_before_not_provided(spark):
    out = one(
        spark,
        ranked_clinsig_merge(F.lit("zzz-novel"), F.lit("pathogenic|not provided")),
    )
    assert out == "pathogenic|zzz-novel|not provided"


def test_newer_date(spark):
    out = one(
        spark,
        newer_date(F.to_date(F.lit("2020-01-01")), F.to_date(F.lit("2021-01-01"))),
    )
    assert str(out) == "2021-01-01"
    out = one(spark, newer_date(F.lit(None).cast("date"), F.to_date(F.lit("2021-01-01"))))
    assert str(out) == "2021-01-01"


def test_pipe_set_agg(spark):
    df = spark.createDataFrame(
        [(1, "b|a"), (1, "c"), (1, "a"), (2, None)], ["k", "v"]
    )
    rows = {
        r["k"]: r["out"]
        for r in df.groupBy("k").agg(pipe_set_agg("v").alias("out")).collect()
    }
    assert rows == {1: "a|b|c", 2: ""}
