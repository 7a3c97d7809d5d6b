"""Rule-engine unit tests on deliberately dirty data."""

from __future__ import annotations

from pyspark.sql import functions as F

from validation_database_spark.operators import quality as Q


def _dirty(spark):
    rows = [
        (1, "a", 10.0, "OK"),
        (1, "b", -5.0, "OK"),      # dup id, below range
        (2, None, 999.0, "BAD"),   # null name, disallowed status
        (3, "d", 50.0, None),      # null status
    ]
    return spark.createDataFrame(rows, "id long, name string, amount double, status string")


def test_rules_count_violations(spark):
    df = _dirty(spark)
    report = Q.run_rules(
        df,
        [
            Q.not_null("name"),
            Q.unique("id"),
            Q.in_range("amount", lo=0.0, hi=100.0),
            Q.allowed_values("status", ["OK"]),
            Q.min_row_count(10),
        ],
    )
    got = {r.rule: (r.violations, r.passed, r.n_rows) for r in report.collect()}
    assert got["not_null"] == (1, False, 4)
    assert got["unique"] == (1, False, 4)
    assert got["in_range[0.0,100.0]"] == (2, False, 4)   # -5 and 999
    assert got["allowed_values[1]"] == (2, False, 4)     # BAD + NULL
    assert got["min_row_count[10]"] == (4, False, 4)     # only 4 rows


def test_rules_all_pass_on_clean_data(spark):
    df = _dirty(spark).filter(F.col("id") == 3)
    report = Q.run_rules(
        df,
        [Q.not_null("name"), Q.unique("id"), Q.in_range("amount", 0.0, 100.0)],
    )
    assert all(r.passed for r in report.collect())


def test_foreign_key_orphans(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 99), (4, None)], "id long, parent_id long"
    )
    parent = spark.createDataFrame([(10,), (20,)], "pid long")
    report = Q.foreign_key(child, "parent_id", parent, "pid").collect()[0]
    # 99 is an orphan; NULL parent_id is not a violation (SQL FK semantics)
    assert report.violations == 1
    assert report.passed is False
    assert report.n_rows == 4
