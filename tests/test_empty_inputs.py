"""Degenerate-input behavior: empty sides, all-null checks, empty
corpus — operators must degrade gracefully, not throw."""

from __future__ import annotations

from pyspark.sql import functions as F

from validation_database_spark.operators import dedup as D
from validation_database_spark.operators.reconcile import reconcile
from validation_database_spark.operators.report import report_summary


def _df(spark, rows):
    return spark.createDataFrame(rows, "id string, check_col string")


def test_reconcile_empty_right_side(spark):
    a = _df(spark, [("1", "x"), ("2", "y")])
    b = _df(spark, [])
    res = reconcile(a, b, check_column="check_col", mode="string")
    assert res.missing_in_first.count() == 0   # nothing in b at all
    assert res.missing_in_second.count() == 2  # everything missing from b
    assert res.differing.count() == 0


def test_reconcile_both_empty(spark):
    res = reconcile(
        _df(spark, []), _df(spark, []), check_column="check_col", mode="integer"
    )
    assert res.missing_in_first.count() == 0
    assert res.missing_in_second.count() == 0
    assert res.differing.count() == 0
    # the padded report of a clean run is empty but well-formed
    summary = report_summary(res)
    assert summary.columns == ["missing_in_db1", "missing_in_db2", "differing_values"]
    assert summary.count() == 0


def test_reconcile_all_null_checks(spark):
    a = _df(spark, [("1", None), ("2", None)])
    b = _df(spark, [("1", None), ("2", "x")])
    res = reconcile(a, b, check_column="check_col", mode="string")
    # both-null drops, one-sided null reports
    assert {r.id for r in res.differing.collect()} == {"2"}


def test_shingles_of_empty_and_tiny_docs(spark):
    docs = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "one"), (4, "a b c d e f")],
        "doc_id long, text string",
    )
    sh = D.exploded_shingles(docs)
    rows = {(r.doc_id, r.sh) for r in sh.collect()}
    # empty/whitespace docs produce one empty shingle; short docs one
    # truncated shingle; 6 tokens → two 5-gram shingles
    assert (1, "") in rows
    assert (2, "") in rows
    assert (3, "one") in rows
    assert {s for d, s in rows if d == 4} == {"a b c d e", "b c d e f"}


def test_simhash_of_empty_doc_is_zero(spark):
    docs = spark.createDataFrame([(1, "")], "doc_id long, text string")
    row = docs.select(D.simhash16(D.tokens("text")).alias("sh")).collect()[0]
    assert row.sh == 0


def test_null_text_doc_survives_fingerprint(spark, tmp_path):
    """A NULL-text doc yields zero explode rows from min_shingle_md5,
    so the fingerprint join must be LEFT to keep the row (shingle_fp
    NULL), matching the DuckDB oracle's row-preserving list_min
    projection (ADVICE r7 — latent, fixtures have no NULL text)."""
    from validation_database_spark.suite.text import q_doc_fingerprint

    sf = str(tmp_path / "sf")
    spark.createDataFrame(
        [(1, "hello world this is a document", "en", "web", 30),
         (2, None, "en", "web", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{sf}/documents.parquet")
    out = {r.doc_id: r for r in q_doc_fingerprint(spark, sf).collect()}
    assert set(out) == {1, 2}
    assert out[2].shingle_fp is None and out[2].exact_fp is None
    assert out[1].shingle_fp is not None
