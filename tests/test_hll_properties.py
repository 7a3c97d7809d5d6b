"""HLL sketch mergeability: the property that makes it the 100 TB
distinct-count shape. Registers built over disjoint slices of the
input, merged by elementwise max, must equal the registers built over
the whole input in one pass — this is exactly the contract partial
aggregation relies on (each executor sketches its partition, the
shuffle merges by max)."""

from __future__ import annotations

from pyspark.sql import functions as F

from validation_database_spark.sources import load_table
from validation_database_spark.suite.quality import hll_registers


def _frame(orders):
    return orders.select(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderkey").cast("string").alias("k"),
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_hll_registers_merge_by_max(spark, sf_dir):
    orders = load_table(spark, "orders", sf_dir)
    whole = hll_registers(_frame(orders))

    even = hll_registers(_frame(orders.filter(F.col("o_orderkey") % 2 == 0)))
    odd = hll_registers(_frame(orders.filter(F.col("o_orderkey") % 2 != 0)))
    merged = (
        even.unionByName(odd)
        .groupBy("priority", "j")
        .agg(F.max("m").alias("m"))
    )
    assert _rows(merged) == _rows(whole)


def test_hll_registers_idempotent_under_duplication(spark, sf_dir):
    # distinct-count sketches must ignore multiplicity: sketching the
    # input twice-over changes nothing.
    orders = load_table(spark, "orders", sf_dir)
    once = hll_registers(_frame(orders))
    doubled = hll_registers(_frame(orders.unionByName(orders)))
    assert _rows(doubled) == _rows(once)
