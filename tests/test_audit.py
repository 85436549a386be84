"""Plan-smell detector (audit.plan_smells): catalogs and waivers."""

from clinvar_pipeline_spark.audit import plan_smells


def test_detects_nested_loop_and_row_python():
    plan = "== Physical Plan ==\nCartesianProduct\nBatchEvalPython [f(x)]"
    assert set(plan_smells("some_query", plan)) == {
        "nested-loop-join",
        "row-python-udf",
    }


def test_waiver_suppresses_expected_smell():
    plan = "BroadcastNestedLoopJoin BuildRight"
    assert plan_smells("topk_cosine", plan) == []
    assert plan_smells("other", plan) == ["nested-loop-join"]


def test_wide_scan_flagged():
    cols = ",".join(f"c{i}:int" for i in range(16))
    plan = f"FileScan parquet ReadSchema: struct<{cols}>"
    assert plan_smells("x", plan) == ["wide-scan(16 cols)"]
    narrow = "FileScan parquet ReadSchema: struct<a:int,b:int>"
    assert plan_smells("x", narrow) == []
