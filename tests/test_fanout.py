"""operators.fanout: the shared salted fan-out layout (VERDICT r11
ask #6) and its plan-time sizing (ask #2).

The exact-once invariance is parameterized over the salt-key
expressions of the real call sites (float ANN join, quant ANN
cogroup, quant RAG cogroup, RAG dropped-hint join) so adopting the
helper at a new site inherits the proof shape for free."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from validation_database_spark.operators.fanout import (
    fanout_layout,
    parquet_rows,
    salted_fanout,
)


def test_fanout_layout_fixture_floor():
    # tiny fan-outs keep the proven r10 fixture layout exactly
    assert fanout_layout(3_000, 64) == (4, 32)
    assert fanout_layout(1, 64) == (4, 32)


def test_fanout_layout_2m_anchor():
    # the round-11 2M-vector decade: est ≈ 3.1B pairs, nlist 64 →
    # (8, 391), the same salt the hand-sized 1,993 s run used
    # (SCALE.md round 11) with slabs of ~8M pairs.
    salt, parts = fanout_layout(3.125e9, 64)
    assert salt == 8
    assert parts == 391


def test_fanout_layout_monotone_and_bounded():
    prev_parts = 0
    for est in (1e3, 1e6, 1e8, 1e10, 1e12, 1e14):
        salt, parts = fanout_layout(est, 64)
        assert parts >= prev_parts
        assert 4 <= salt <= 64
        assert 32 <= parts <= 2048
        prev_parts = parts
    # ceiling: an absurd fan-out saturates, never overflows — salt
    # stops at parts/nlist (more salt than slabs buys nothing for a
    # join layout; the parts cap is what bounds the task count)
    assert fanout_layout(1e15, 64) == (32, 2048)


def test_ann_float_layout_anchors():
    from validation_database_spark.suite.similarity import ann_float_layout

    assert ann_float_layout(None) == (4, 32)
    assert ann_float_layout(500) == (4, 32)      # fixture SFs
    assert ann_float_layout(2_000) == (4, 32)    # sf0.1 embeddings
    salt, parts = ann_float_layout(2_000_000)    # the r11 replica
    assert salt == 8 and 256 <= parts <= 512


def test_parquet_rows_reads_footers_only():
    assert parquet_rows("/root/testdata/sf0.001", "documents") == 500
    assert parquet_rows("/root/testdata/sf0.001", "nope") is None
    assert parquet_rows("/root/nonexistent", "documents") is None


# salt-key FACTORIES (Column exprs need a live SparkContext, which
# doesn't exist at pytest collection time)
_ID_KEY = lambda: F.col("id").cast("string")  # noqa: E731
_COMPOSITE_KEY = lambda: F.concat_ws(  # noqa: E731
    "_", "id", (F.col("id") + 1).cast("string")
)


@pytest.mark.parametrize(
    "salt_key_fn, n_salt, parts",
    [
        # float ANN / quant ANN shape: single bigint id
        (_ID_KEY, 4, None),
        (_ID_KEY, 3, 7),
        # quant RAG shape: composite (doc_id, chunk_idx) key — here
        # modeled as (id, id+1)
        (_COMPOSITE_KEY, 5, None),
        # dropped-hint RAG join shape: composite key + explicit parts
        (_COMPOSITE_KEY, 8, 16),
    ],
)
def test_salted_fanout_exact_once(spark, salt_key_fn, n_salt, parts):
    """Every (big, probe) pair that shares a group key matches on
    EXACTLY one salt value — the join over (key, __salt) equals the
    unsalted join, with no duplicates and no losses."""
    big = spark.range(0, 200).select(
        F.col("id"), (F.col("id") % 5).alias("grp")
    )
    probe = spark.range(1000, 1030).select(
        F.col("id").alias("pid"), (F.col("pid") % 5).alias("grp")
    )
    kwargs = {"parts": parts, "partition_keys": ("grp",)} if parts else {}
    b_s, p_s = salted_fanout(big, probe, salt_key_fn(), n_salt, **kwargs)
    salted = sorted(
        (r.id, r.pid)
        for r in p_s.join(b_s, ["grp", "__salt"]).select("id", "pid").collect()
    )
    plain = sorted(
        (r.id, r.pid)
        for r in probe.join(big, "grp").select("id", "pid").collect()
    )
    assert salted == plain
    assert len(set(salted)) == len(salted)


def test_salted_fanout_repartition_by_num_pinned(spark):
    """parts set → the big side gets the REPARTITION_BY_NUM exchange
    AQE never coalesces, keyed on (keys..., __salt)."""
    big = spark.range(0, 100).select("id", (F.col("id") % 5).alias("grp"))
    probe = spark.range(0, 10).select(
        F.col("id").alias("pid"), (F.col("pid") % 5).alias("grp")
    )
    b_s, p_s = salted_fanout(
        big, probe, F.col("id").cast("string"), 4, parts=16,
        partition_keys=("grp",),
    )
    plan = p_s.join(b_s, ["grp", "__salt"])._jdf.queryExecution().toString()
    assert "REPARTITION_BY_NUM" in plan
