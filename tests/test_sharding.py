"""Semantic pins for the routing/compaction planners: the HRW
movement bound and the bin-packing fill invariant — measured on the
fixture, not asserted from theory."""

from __future__ import annotations

from pyspark.sql import functions as F

from validation_database_spark.suite.pipeline import (
    COMPACT_TARGET,
    HRW_K2,
    q_compaction_plan,
    q_shard_rendezvous,
)


def test_rendezvous_moves_about_one_in_k2(spark, sf_dir):
    """HRW's defining property: growing 8 → 9 shards moves ≈ 1/9 of
    keys (mod-k routing would move ~8/9). Band is generous for the
    500-doc fixture's sampling noise."""
    df = q_shard_rendezvous(spark, sf_dir)
    n = df.count()
    moved = df.filter("moved").count()
    frac = moved / n
    assert 0.03 <= frac <= 0.25, f"moved {frac:.3f}, expected ≈ {1 / HRW_K2:.3f}"


def test_rendezvous_shards_balanced(spark, sf_dir):
    """No shard owns a pathological share (md5 weights are uniform)."""
    df = q_shard_rendezvous(spark, sf_dir)
    n = df.count()
    counts = [r["c"] for r in df.groupBy("shard_k9").agg(F.count("*").alias("c")).collect()]
    assert len(counts) == HRW_K2
    assert max(counts) <= 3 * n / HRW_K2

def test_compaction_buckets_full_except_partition_tail(spark, sf_dir):
    """The running-sum rule's provable fill bound: a non-tail bucket
    starts within max_file bytes of its boundary (the previous file
    can overflow by at most its own size) and ends past the next
    boundary, so bytes >= COMPACT_TARGET - max_file_bytes for every
    bucket except each partition's last."""
    from pyspark.sql import Window

    from validation_database_spark.sources import load_table

    plan = q_compaction_plan(spark, sf_dir)
    maxdoc = (
        load_table(spark, "documents", sf_dir)
        .groupBy("source")
        .agg(F.max("n_chars").alias("max_file"))
    )
    w = Window.partitionBy("source")
    tagged = plan.withColumn("last_b", F.max("bucket").over(w)).join(maxdoc, "source")
    under = tagged.filter(
        (F.col("bucket") != F.col("last_b"))
        & (F.col("bytes") < COMPACT_TARGET - F.col("max_file"))
    )
    assert under.count() == 0


def test_rendezvous_moves_only_to_the_new_shard(spark, sf_dir):
    """The exact HRW law behind the ~1/k bound: adding shard 8 can
    only change an argmax if the NEW candidate wins, so every moved
    key must land on shard 8 — zero lateral movement."""
    df = q_shard_rendezvous(spark, sf_dir)
    lateral = df.filter("moved AND shard_k9 != 8").count()
    assert lateral == 0


def test_kcore_three_rounds_is_the_fixed_point(spark, sf_dir):
    """Peeling converges on the fixture within 2 rounds, so the
    shipped 3-round unroll IS the k-core, not an approximation."""
    from validation_database_spark.suite.advanced import q_kcore

    r2 = {tuple(r) for r in q_kcore(spark, sf_dir, rounds=2).collect()}
    r3 = {tuple(r) for r in q_kcore(spark, sf_dir, rounds=3).collect()}
    assert r2 == r3
    assert any(row[3] for row in r3)       # core is non-empty
    assert not all(row[3] for row in r3)   # and some vertex was peeled
