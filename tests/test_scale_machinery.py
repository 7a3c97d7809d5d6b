"""Scale machinery: salted joins preserve semantics; bucketed tables
co-locate joins (no shuffle exchange in the plan).

(AQE's OptimizeSkewedJoin is enabled in session.py but not plan-pinned
here: at fixture scale the shuffle partitions are KB-sized, so AQE
coalesces them instead of splitting — the skew mitigation that IS
observable and driver-checked at this scale is operators/skew.py's
explicit salting, exercised below and by the skew_salted_revenue
query.)"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from validation_database_spark.operators.skew import salted_join
from validation_database_spark.plans import physical_plan
from validation_database_spark.sources import load_table


def _skewed(spark, sf_dir):
    """lineitem keyed so ~1/3 of rows share one hot supplier key."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.withColumn(
        "skew_key",
        F.when(F.col("l_orderkey") % 3 == 0, F.lit(1)).otherwise(F.col("l_suppkey")),
    ).select("skew_key", "l_orderkey", "l_quantity")


def test_salted_inner_join_matches_plain(spark, sf_dir):
    large = _skewed(spark, sf_dir)
    small = load_table(spark, "supplier", sf_dir).select(
        F.col("s_suppkey").alias("skew_key"), "s_name"
    )
    plain = large.join(small, "skew_key").groupBy("skew_key").agg(
        F.count("*").alias("n"), F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q")
    )
    salted = salted_join(large, small, "skew_key", num_salts=8).groupBy(
        "skew_key"
    ).agg(
        F.count("*").alias("n"), F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q")
    )
    p = {r.skew_key: (r.n, r.q) for r in plain.collect()}
    s = {r.skew_key: (r.n, r.q) for r in salted.collect()}
    assert p == s


def test_salted_left_join_matches_plain(spark, sf_dir):
    large = _skewed(spark, sf_dir).limit(2000)
    # dim missing some keys → unmatched left rows must survive with NULLs
    small = load_table(spark, "supplier", sf_dir).filter(
        F.col("s_suppkey") % 2 == 0
    ).select(F.col("s_suppkey").alias("skew_key"), "s_name")
    plain = large.join(small, "skew_key", "left")
    salted = salted_join(large, small, "skew_key", num_salts=4, how="left")
    assert plain.count() == salted.count()
    assert (
        plain.filter(F.col("s_name").isNull()).count()
        == salted.filter(F.col("s_name").isNull()).count()
    )


def test_salted_join_rejects_unsupported_how(spark, sf_dir):
    large = _skewed(spark, sf_dir)
    with pytest.raises(ValueError):
        salted_join(large, large, "skew_key", how="full_outer")


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    """Write lineitem + orders bucketed by the join key into the
    warehouse — the on-disk co-location that removes the join shuffle
    (at 100 TB: bucket the fact tables once, join free forever)."""
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")
    (
        li.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("li_bucketed")
    )
    (
        orders.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("orders_bucketed")
    )
    yield spark.table("li_bucketed"), spark.table("orders_bucketed")
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    li, orders = bucketed_tables
    # Fixture tables are broadcast-sized, which bypasses bucketing —
    # disable auto-broadcast to expose the shuffle-join path that
    # bucketing exists to optimize (at 100 TB neither side broadcasts).
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
        plan = physical_plan(joined)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        # both sides pre-bucketed on the key → no Exchange needed
        assert "Exchange hashpartitioning" not in plan, plan[:2000]
        assert "Bucketed: true" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_unbucketed(spark, sf_dir, bucketed_tables):
    li_b, orders_b = bucketed_tables
    got = li_b.join(orders_b, li_b.l_orderkey == orders_b.o_orderkey).count()
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    want = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    assert got == want
