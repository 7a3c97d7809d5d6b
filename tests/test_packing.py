"""pack_greedy: reset-on-overflow semantics on hand-computed cases —
exact-fill boundaries, oversized rows, multiple independent groups —
and determinism under repartitioning."""

from __future__ import annotations

from validation_database_spark.operators.packing import pack_greedy


def _pack(spark, rows, budget, partitions=None):
    df = spark.createDataFrame(rows, "grp string, doc_id bigint, sz bigint")
    if partitions:
        df = df.repartition(partitions)
    out = pack_greedy(
        df, group_col="grp", order_cols=["doc_id"], size_col="sz", budget=budget
    )
    return {(r.grp, r.doc_id): r.pack_id for r in out.collect()}


def test_hand_computed_cases(spark):
    rows = [
        # group a, budget 10: 4+6 fills pack 0 exactly; 1 opens pack 1;
        # 25 (oversized) gets pack 2 alone; 10 fits pack 3 exactly.
        ("a", 1, 4), ("a", 2, 6), ("a", 3, 1), ("a", 4, 25), ("a", 5, 10),
        # group b independent: starts again at pack 0.
        ("b", 1, 9), ("b", 2, 2),
    ]
    got = _pack(spark, rows, budget=10)
    assert got == {
        ("a", 1): 0, ("a", 2): 0, ("a", 3): 1, ("a", 4): 2, ("a", 5): 3,
        ("b", 1): 0, ("b", 2): 1,
    }


def test_oversized_first_row_owns_pack_zero(spark):
    got = _pack(spark, [("a", 1, 99), ("a", 2, 1)], budget=10)
    assert got == {("a", 1): 0, ("a", 2): 1}


def test_partitioning_invariance(spark):
    rows = [("g", i, (i * 7) % 13 + 1) for i in range(1, 101)]
    base = _pack(spark, rows, budget=20)
    assert _pack(spark, rows, budget=20, partitions=7) == base
