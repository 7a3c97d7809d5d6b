"""interval_overlap_join: exactness vs the naive theta join on
adversarial intervals (touching endpoints, nesting, bin-boundary
crossing, point intervals, empty intervals), and a plan-shape pin —
the rewrite must execute as an equi-join, never a nested loop."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from validation_database_spark.operators.intervals import interval_overlap_join

T0 = dt.datetime(2024, 1, 1)


def _ts(hours: float) -> dt.datetime:
    return T0 + dt.timedelta(hours=hours)


def _frames(spark):
    # Bin width below is 1h; cases cross, touch, and nest bins.
    left = [
        # (id, start_h, end_h)
        ("L0", 0.0, 0.5),    # inside one bin
        ("L1", 0.9, 2.1),    # spans three bins
        ("L2", 5.0, 5.0),    # point interval
        ("L3", 7.0, 6.0),    # empty (end < start) — must be dropped
        ("L4", 10.0, 20.0),  # long interval nesting several rights
        ("L5", 30.0, 31.0),  # overlaps nothing
    ]
    right = [
        ("R0", 0.5, 0.9),    # touches L0 at 0.5 and L1 at 0.9 (closed ⇒ both overlap)
        ("R1", 2.1, 3.0),    # touches L1 exactly at its end
        ("R2", 4.5, 5.5),    # contains the point interval L2
        ("R3", 12.0, 13.0),  # nested inside L4
        ("R4", 19.9, 25.0),  # overlaps L4's tail
        ("R5", 40.0, 41.0),  # overlaps nothing
    ]
    l = spark.createDataFrame(
        [(i, _ts(s), _ts(e)) for i, s, e in left], "l_id string, l_s timestamp, l_e timestamp"
    )
    r = spark.createDataFrame(
        [(i, _ts(s), _ts(e)) for i, s, e in right], "r_id string, r_s timestamp, r_e timestamp"
    )
    return l, r


def test_matches_naive_theta_join(spark):
    l, r = _frames(spark)
    got = interval_overlap_join(
        l, r, left_span=("l_s", "l_e"), right_span=("r_s", "r_e"), bin_seconds=3600
    )
    naive = (
        l.filter(F.col("l_e") >= F.col("l_s"))
        .crossJoin(r.filter(F.col("r_e") >= F.col("r_s")))
        .filter((F.col("l_s") <= F.col("r_e")) & (F.col("r_s") <= F.col("l_e")))
    )
    got_pairs = sorted((x.l_id, x.r_id) for x in got.collect())
    naive_pairs = sorted((x.l_id, x.r_id) for x in naive.collect())
    assert got_pairs == naive_pairs
    # each overlapping pair exactly once, and the known closed-interval cases
    assert len(got_pairs) == len(set(got_pairs))
    assert ("L0", "R0") in got_pairs  # endpoint touch
    assert ("L1", "R1") in got_pairs  # endpoint touch at interval end
    assert ("L2", "R2") in got_pairs  # point interval
    assert ("L4", "R3") in got_pairs  # nesting
    assert all(p[0] != "L3" for p in got_pairs)  # empty interval dropped


def test_bin_width_invariance(spark):
    l, r = _frames(spark)
    base = None
    for bin_seconds in (60, 3600, 86400, 7 * 86400):
        pairs = sorted(
            (x.l_id, x.r_id)
            for x in interval_overlap_join(
                l, r, left_span=("l_s", "l_e"), right_span=("r_s", "r_e"),
                bin_seconds=bin_seconds,
            ).collect()
        )
        if base is None:
            base = pairs
        assert pairs == base, f"bin_seconds={bin_seconds} changed the result"


def test_plan_is_equi_join_not_nested_loop(spark):
    l, r = _frames(spark)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = interval_overlap_join(
            l, r, left_span=("l_s", "l_e"), right_span=("r_s", "r_e"), bin_seconds=3600
        )._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_randomized_against_python_model(spark):
    """200×200 seeded random intervals (lengths from sub-bin to
    many-bin, plus point intervals) against the O(n²) Python model —
    one Spark job, exact pair-set equality."""
    import random

    rng = random.Random(0xC0FFEE)

    def intervals(prefix, n):
        out = []
        for i in range(n):
            start = rng.randint(0, 500_000)  # seconds over ~5.8 days
            length = rng.choice([0, rng.randint(1, 600), rng.randint(1, 200_000)])
            out.append((f"{prefix}{i}", start, start + length))
        return out

    lefts, rights = intervals("L", 200), intervals("R", 200)
    expected = {
        (li, ri)
        for li, ls, le in lefts
        for ri, rs, re in rights
        if ls <= re and rs <= le
    }
    l = spark.createDataFrame(
        [(i, _ts(s / 3600), _ts(e / 3600)) for i, s, e in lefts],
        "l_id string, l_s timestamp, l_e timestamp",
    )
    r = spark.createDataFrame(
        [(i, _ts(s / 3600), _ts(e / 3600)) for i, s, e in rights],
        "r_id string, r_s timestamp, r_e timestamp",
    )
    got = [
        (x.l_id, x.r_id)
        for x in interval_overlap_join(
            l, r, left_span=("l_s", "l_e"), right_span=("r_s", "r_e"), bin_seconds=3600
        ).collect()
    ]
    assert len(got) == len(set(got)), "a pair was emitted more than once"
    assert set(got) == expected


def test_disjoint_column_names_enforced(spark):
    l, _ = _frames(spark)
    try:
        interval_overlap_join(
            l, l, left_span=("l_s", "l_e"), right_span=("l_s", "l_e"), bin_seconds=60
        )
    except ValueError as e:
        assert "disjoint" in str(e)
    else:
        raise AssertionError("shared column names must raise")
