"""Approximate aggregates (HLL count-distinct, quantile sketches):
no cross-engine oracle (sketch internals differ), so they are pinned
by error-bound tests against the exact answers. At 100 TB these are
the first-choice forms — approx_count_distinct is one pass with a
fixed-size sketch where countDistinct is a full shuffle."""

from __future__ import annotations

from pyspark.sql import functions as F

from validation_database_spark.sources import load_table


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    exact = li.select(F.countDistinct("l_partkey")).collect()[0][0]
    approx = li.select(F.approx_count_distinct("l_partkey", rsd=0.02)).collect()[0][0]
    assert abs(approx - exact) / exact < 0.1, (approx, exact)


def test_percentile_approx_brackets_exact(spark, sf_dir):
    orders = load_table(spark, "orders", sf_dir)
    row = orders.select(
        F.expr("percentile(o_totalprice, 0.5)").alias("exact"),
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("approx"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.01, row


def test_approx_sketch_is_one_pass(spark, sf_dir):
    # plan shape: approx_count_distinct needs no distinct-expand — a
    # single partial/final aggregate pair, unlike countDistinct
    from validation_database_spark.plans import count_occurrences, physical_plan

    li = load_table(spark, "lineitem", sf_dir)
    approx = li.groupBy("l_returnflag").agg(F.approx_count_distinct("l_partkey"))
    exact = li.groupBy("l_returnflag").agg(F.countDistinct("l_partkey"))
    # exact distinct plans extra aggregate levels; the sketch is a
    # plain partial/final pair (formatted explain names each node
    # twice — tree + detail)
    n_approx = count_occurrences(approx, "HashAggregate")
    n_exact = count_occurrences(exact, "HashAggregate")
    assert n_approx == 4, n_approx
    assert n_exact > n_approx, (n_exact, n_approx)


def test_hll_sketches_merge_across_partitions(spark, sf_dir):
    """Mergeable HLL sketches (Apache DataSketches, built into Spark
    3.5+): per-group sketches union into a global one WITHOUT
    re-reading the data — the re-aggregatable distinct-count shape a
    100 TB rollup needs (count distinct per day -> per month -> total
    from the stored sketches, never a re-scan)."""
    from validation_database_spark.sources import load_table

    orders = load_table(spark, "orders", sf_dir)
    exact = orders.select("o_custkey").distinct().count()

    per_status = orders.groupBy("o_orderstatus").agg(
        F.hll_sketch_agg("o_custkey").alias("sk")
    )
    # second-level merge: union the per-group sketches
    merged = per_status.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    ).collect()[0].est
    assert abs(merged - exact) / exact < 0.05, (merged, exact)

    # per-group estimates are individually sane too
    rows = per_status.select(
        "o_orderstatus", F.hll_sketch_estimate("sk").alias("est")
    ).collect()
    exact_per = dict(
        orders.groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    )
    for r in rows:
        assert abs(r.est - exact_per[r.o_orderstatus]) / exact_per[r.o_orderstatus] < 0.05
