"""Property tests for the comparison truth tables (SURVEY.md §7
"what's hard" #1-2): the reference's pandas coerce/null semantics
(running_validation.py:241-249, :306-316, :395-415) re-expressed in
Spark must keep/drop exactly the same rows."""

from __future__ import annotations

import difflib

import pytest
from pyspark.sql import functions as F

from validation_database_spark.operators.compare import (
    differing_predicate,
    fuzzy_ratio_udf,
)


def _rows_kept(spark, pairs, mode, threshold=1.0):
    df = spark.createDataFrame(pairs, "a string, b string")
    kept = df.filter(differing_predicate("a", "b", mode, threshold=threshold))
    return {(r.a, r.b) for r in kept.collect()}


INTEGER_CASES = [
    # (a, b, kept?) — reference truth table for integer mode
    ("13", "13.0", False),   # equal as floats (running_validation.py:241)
    ("13", "14", True),
    ("junk", "garbage", False),  # both coerce to NULL → drop
    ("junk", "13", True),        # one-sided coercion failure → keep
    (None, None, False),         # both null → drop
    (None, "13", True),          # one null → keep
    ("  13 ", "13", False),      # whitespace tolerated by both coercions
    ("1e2", "100", False),       # scientific notation equal
    ("0", "-0", False),          # +0 == -0 as doubles
]


@pytest.mark.parametrize("a,b,kept", INTEGER_CASES)
def test_integer_truth_table(spark, a, b, kept):
    got = _rows_kept(spark, [(a, b)], "integer")
    assert (len(got) == 1) == kept, f"integer mode: ({a!r},{b!r}) kept={not kept}"


DATE_CASES = [
    ("2023-05-01 00:00:00", "2023-05-01 00:00:00", False),
    ("2023-05-01 00:00:00", "2023-05-02 00:00:00", True),
    ("not-a-date", "also-bad", False),  # both NaT → drop
    ("not-a-date", "2023-05-01 00:00:00", True),
    (None, None, False),
    (None, "2023-05-01 00:00:00", True),
    ("2023-05-01", "2023-05-01 00:00:00", False),  # same instant
]


@pytest.mark.parametrize("a,b,kept", DATE_CASES)
def test_date_truth_table(spark, a, b, kept):
    got = _rows_kept(spark, [(a, b)], "date")
    assert (len(got) == 1) == kept, f"date mode: ({a!r},{b!r}) kept={not kept}"


STRING_CASES_T1 = [
    ("CTS-VS", "CTS-V", True),   # golden-output near-miss is REPORTED at t=1
    ("Ssierraa", "Sierra", True),
    ("same", "same", False),
    (None, None, False),
    (None, "x", True),
]


@pytest.mark.parametrize("a,b,kept", STRING_CASES_T1)
def test_string_threshold1_truth_table(spark, a, b, kept):
    got = _rows_kept(spark, [(a, b)], "string", threshold=1.0)
    assert (len(got) == 1) == kept


def test_fuzzy_udf_matches_difflib(spark):
    pairs = [
        ("CTS-VS", "CTS-V"),
        ("Ssierraa", "Sierra"),
        ("abc", "abd"),
        ("", ""),
        ("abc", ""),
        ("Malibu", "Malibu"),
    ]
    df = spark.createDataFrame(pairs, "a string, b string")
    got = {
        (r.a, r.b): r.ratio
        for r in df.select("a", "b", fuzzy_ratio_udf()("a", "b").alias("ratio")).collect()
    }
    for a, b in pairs:
        expected = difflib.SequenceMatcher(None, a, b).ratio()
        assert got[(a, b)] == pytest.approx(expected), (a, b)


def test_fuzzy_threshold_below_one(spark):
    # ratio('CTS-VS','CTS-V') = 2*5/11 ≈ 0.909 — kept at t=0.95, dropped at t=0.9
    assert _rows_kept(spark, [("CTS-VS", "CTS-V")], "string", threshold=0.95)
    assert not _rows_kept(spark, [("CTS-VS", "CTS-V")], "string", threshold=0.90)
    # one-sided null mismatches regardless of threshold
    assert _rows_kept(spark, [(None, "x")], "string", threshold=0.1)
    # both-null matches regardless of threshold
    assert not _rows_kept(spark, [(None, None)], "string", threshold=0.99)


def test_fuzzy_ratio_is_order_sensitive_like_reference(spark):
    # SequenceMatcher.ratio is not symmetric in general; the engine
    # fixes the (db1, db2) order as the reference does (:348).
    a, b = "qabxcd", "abycdf"
    df = spark.createDataFrame([(a, b)], "a string, b string")
    r1 = df.select(fuzzy_ratio_udf()("a", "b").alias("r")).collect()[0].r
    assert r1 == pytest.approx(difflib.SequenceMatcher(None, a, b).ratio())
