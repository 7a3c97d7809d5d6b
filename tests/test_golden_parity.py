"""Golden-parity test: recreate the reference's committed run shape.

The reference's golden output (reference
output/result/output_oracle_postgres_MODEL_result.csv_differing_values.csv)
is a 2-row CSV of near-miss strings found when reconciling an Oracle
`orders` table against a PostgreSQL one on check column MODEL:

    id,MODEL_oracle,MODEL_postgres
    84,CTS-VS,CTS-V
    94,Ssierraa,Sierra

This test rebuilds that exact scenario in-engine (two tiny sources,
same ids/values, threshold 1) and asserts the differing-values report
reproduces the golden rows, column names included
(``{check}_{db}`` suffixing per running_validation.py:233-239).
"""

from __future__ import annotations

import csv
import glob
import os

from validation_database_spark.operators.reconcile import reconcile
from validation_database_spark.operators.report import write_reports


def _sources(spark):
    oracle_rows = [("84", "CTS-VS"), ("94", "Ssierraa"), ("7", "Malibu")]
    postgres_rows = [("84", "CTS-V"), ("94", "Sierra"), ("7", "Malibu")]
    a = spark.createDataFrame(oracle_rows, "id string, MODEL string")
    b = spark.createDataFrame(postgres_rows, "id string, MODEL string")
    return a, b


def test_golden_differing_values(spark):
    a, b = _sources(spark)
    res = reconcile(
        a, b, check_column="MODEL", mode="string",
        db1="oracle", db2="postgres", threshold=1.0,
    )
    rows = {
        (r.id, r.MODEL_oracle, r.MODEL_postgres) for r in res.differing.collect()
    }
    assert rows == {("84", "CTS-VS", "CTS-V"), ("94", "Ssierraa", "Sierra")}
    assert res.differing.columns == ["id", "MODEL_oracle", "MODEL_postgres"]


def test_golden_csv_report_shape(spark, tmp_path):
    a, b = _sources(spark)
    res = reconcile(
        a, b, check_column="MODEL", mode="string",
        db1="oracle", db2="postgres", threshold=1.0,
    )
    prefix = str(tmp_path / "output_oracle_postgres_MODEL_result.csv")
    write_reports(res, prefix, single_file=True)

    detail_dir = prefix + "_differing_values.csv"
    parts = glob.glob(os.path.join(detail_dir, "part-*.csv"))
    assert len(parts) == 1
    with open(parts[0]) as f:
        reader = csv.reader(f)
        header = next(reader)
        body = sorted(reader)
    assert header == ["id", "MODEL_oracle", "MODEL_postgres"]
    assert body == [["84", "CTS-VS", "CTS-V"], ["94", "Ssierraa", "Sierra"]]


def test_golden_dict_cell_renders_null_as_nan(spark):
    """A one-sided NULL is NaN in the reference's merged pandas frame,
    and its dict-cell repr is unquoted ``nan``
    (running_validation.py:256-259)."""
    from validation_database_spark.operators.report import report_summary

    a = spark.createDataFrame(
        [("84", "CTS-VS"), ("94", None)], "id string, MODEL string"
    )
    b = spark.createDataFrame(
        [("84", "CTS-V"), ("94", "Sierra")], "id string, MODEL string"
    )
    res = reconcile(
        a, b, check_column="MODEL", mode="string",
        db1="oracle", db2="postgres", threshold=1.0,
    )
    cells = {
        r.differing_values
        for r in report_summary(res, render="dict").collect()
        if r.differing_values is not None
    }
    assert cells == {
        "{'id': '84', 'MODEL_oracle': 'CTS-VS', 'MODEL_postgres': 'CTS-V'}",
        "{'id': '94', 'MODEL_oracle': nan, 'MODEL_postgres': 'Sierra'}",
    }
