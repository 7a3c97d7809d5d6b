"""Schema-drift detection (operators/schema_drift.py): the metadata
guard the reference lacked — drifted sources died inside the DB with
an opaque column error (reference running_validation.py:489-562 trusts
the configured column list)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from validation_database_spark.operators.schema_drift import (
    ADDED,
    NULLABILITY_CHANGED,
    REMOVED,
    TYPE_CHANGED,
    UNCHANGED,
    assert_schemas_compatible,
    has_breaking_drift,
    schema_drift,
)
from validation_database_spark.sources import load_table


def test_identical_schemas_report_empty(spark, sf_dir):
    orders = load_table(spark, "orders", sf_dir)
    assert schema_drift(orders, orders).count() == 0
    assert not has_breaking_drift(orders, orders)
    assert_schemas_compatible(orders, orders)  # must not raise


def test_drift_statuses(spark, sf_dir):
    orders = load_table(spark, "orders", sf_dir)
    drifted = (
        orders.drop("o_orderpriority")                             # removed
        .withColumn("o_totalprice", F.col("o_totalprice").cast("decimal(18,2)"))  # type change
        .withColumn("ingest_ts", F.current_timestamp())            # added
    )
    report = {r.column: r for r in schema_drift(orders, drifted).collect()}
    assert report["o_orderpriority"].status == REMOVED
    assert report["o_orderpriority"].type_second is None
    assert report["o_totalprice"].status == TYPE_CHANGED
    assert report["o_totalprice"].type_first == "double"
    assert report["o_totalprice"].type_second == "decimal(18,2)"
    assert report["ingest_ts"].status == ADDED
    # unchanged columns excluded by default, included on demand
    assert "o_orderkey" not in report
    full = {r.column: r.status for r in
            schema_drift(orders, drifted, include_unchanged=True).collect()}
    assert full["o_orderkey"] == UNCHANGED


def test_breaking_vs_nonbreaking(spark, sf_dir):
    orders = load_table(spark, "orders", sf_dir)
    added_only = orders.withColumn("extra", F.lit(1))
    assert not has_breaking_drift(orders, added_only)  # ADDED is benign
    assert_schemas_compatible(orders, added_only)

    dropped = orders.drop("o_totalprice")
    assert has_breaking_drift(orders, dropped)
    with pytest.raises(ValueError, match="o_totalprice: removed"):
        assert_schemas_compatible(orders, dropped)


def test_nullability_drift_opt_in(spark, sf_dir):
    orders = load_table(spark, "orders", sf_dir)
    # same types, different nullability via schema rebuild
    forced = spark.createDataFrame(orders.rdd, orders.schema)
    relaxed = forced.withColumn(
        "o_orderkey", F.coalesce("o_orderkey", F.lit(0))
    )
    rep = schema_drift(orders, relaxed, check_nullability=True).collect()
    statuses = {r.column: r.status for r in rep}
    assert statuses.get("o_orderkey") in (None, NULLABILITY_CHANGED)
    # default report ignores nullability-only differences
    assert schema_drift(orders, relaxed).count() == 0
