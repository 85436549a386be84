"""Schema-evolution-tolerant ingest (sources/schema_evolve.py):
three generations of document drops — a v1 with narrow ids and no
metadata, a v2 with an extra column and int n_chars, a v3 at the
canonical schema — reconcile to ONE canonical frame, with every
decision in the report; junk drops are rejected whole."""

from __future__ import annotations

from pyspark.sql import functions as F

from clinvar_pipeline_spark.sources.schema_evolve import (
    reconcile_documents,
)


def _write(spark, path, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(path))


def test_three_generations_reconcile(spark, tmp_path):
    v1 = tmp_path / "crawl_2019"
    _write(spark, v1, [("hello old world",), ("second doc",)],
           "text string")  # no ids, no metadata at all
    v2 = tmp_path / "crawl_2022"
    _write(spark, v2,
           [(7, "mid era doc", "en", 11, 0.5)],
           "doc_id int, text string, lang string, n_chars int,"
           " crawl_score double")  # narrow ints + an extra column
    v3 = tmp_path / "crawl_2025"
    _write(spark, v3, [(99, "modern doc", "de", "cc", 10)],
           "doc_id long, text string, lang string, source string,"
           " n_chars long")

    docs, report = reconcile_documents(
        spark, [str(v1), str(v2), str(v3)]
    )
    assert [f.simpleString() for f in docs.schema.fields] == [
        "doc_id:bigint", "text:string", "lang:string",
        "source:string", "n_chars:bigint",
    ]
    rows = {r["text"]: r for r in docs.collect()}
    assert len(rows) == 4
    # v1: everything derived/nulled; n_chars derives from the text
    assert rows["hello old world"]["n_chars"] == 15
    assert rows["hello old world"]["lang"] is None
    assert rows["hello old world"]["doc_id"] is not None
    # derived ids are stable across re-reads
    docs2, _ = reconcile_documents(spark, [str(v1)])
    again = {r["text"]: r["doc_id"] for r in docs2.collect()}
    assert again["hello old world"] == rows["hello old world"]["doc_id"]
    # v2: widened, extra column dropped AND reported
    assert rows["mid era doc"]["doc_id"] == 7
    assert rows["mid era doc"]["n_chars"] == 11
    acts = {
        (r["path"].split("/")[-1], r["column"]): r["action"]
        for r in report.collect()
    }
    assert acts[("crawl_2022", "doc_id")] == "cast:int->bigint"
    assert acts[("crawl_2022", "crawl_score")] == "extra:dropped"
    assert acts[("crawl_2019", "n_chars")] == "derived:length(text)"
    assert acts[("crawl_2019", "source")] == "missing->null"
    assert acts[("crawl_2025", "doc_id")] == "ok"


def test_textless_and_type_conflicted_drops_rejected_whole(spark, tmp_path):
    bad1 = tmp_path / "not_docs"
    _write(spark, bad1, [(1, 2.0)], "a long, b double")
    bad2 = tmp_path / "stringly_ids"
    _write(spark, bad2, [("id-1", "text here")],
           "doc_id string, text string")  # string id: NOT a safe cast
    good = tmp_path / "good"
    _write(spark, good, [(1, "keep me", "en", "s", 7)],
           "doc_id long, text string, lang string, source string,"
           " n_chars long")
    docs, report = reconcile_documents(
        spark, [str(bad1), str(bad2), str(good)]
    )
    assert [r["text"] for r in docs.collect()] == ["keep me"]
    acts = {
        (r["path"].split("/")[-1], r["column"]): r["action"]
        for r in report.collect()
    }
    assert acts[("not_docs", "text")].startswith("rejected:")
    assert acts[("stringly_ids", "doc_id")].startswith("rejected:unsafe")


def test_empty_path_list_yields_canonical_empty_frame(spark):
    docs, report = reconcile_documents(spark, [])
    assert docs.count() == 0 and report.count() == 0
    assert "doc_id" in docs.columns and "n_chars" in docs.columns


def test_reconciled_union_feeds_downstream_stages(spark, tmp_path):
    """The reconciled frame is a first-class documents input: the
    exact-dedup fingerprint pipeline runs on it unchanged (the whole
    point of reconciling at read time)."""
    v1 = tmp_path / "a"
    _write(spark, v1, [("dup dup dup",), ("unique one",)], "text string")
    v2 = tmp_path / "b"
    _write(spark, v2, [(5, "dup dup dup", None, None, 11)],
           "doc_id long, text string, lang string, source string,"
           " n_chars long")
    docs, _ = reconcile_documents(spark, [str(v1), str(v2)])
    from clinvar_pipeline_spark.functions.hashes import normalized_tokens

    fp = docs.select(
        F.md5(F.concat_ws(" ", normalized_tokens(F.col("text")))).alias("fp")
    )
    assert fp.distinct().count() == 2  # the cross-drop dup collapses
