"""Property tests for the CDC apply operator.

1. BATCH-SPLIT INVARIANCE (hypothesis): applying a random ordered
   change-log in one shot equals applying any prefix/suffix split
   sequentially — the algebraic fact the streaming foreachBatch apply
   (streaming/validation.py::streaming_cdc_apply) relies on.
2. A pure-Python last-writer-wins model cross-checks the Spark result
   on the same random logs.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from validation_database_spark.suite.pipeline import apply_cdc

_KEYS = st.integers(min_value=0, max_value=6)
_OPS = st.sampled_from(["U", "D"])
_VALS = st.integers(min_value=0, max_value=99)

# a change-log: list of (key, op, val); seq = list position (monotone)
_LOG = st.lists(st.tuples(_KEYS, _OPS, _VALS), min_size=0, max_size=16)
_SNAP = st.dictionaries(_KEYS, _VALS, max_size=7)

_prop_settings = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _model(snap: dict, log: list) -> dict:
    out = dict(snap)
    for key, op, val in log:  # list order IS the sequence order
        if op == "D":
            out.pop(key, None)
        else:
            out[key] = val
    return out


def _spark_apply(spark, snap: dict, log: list) -> dict:
    snap_df = spark.createDataFrame(
        [(k, v) for k, v in snap.items()] or [(None, None)], "k int, v int"
    ).filter("k IS NOT NULL")
    log_df = spark.createDataFrame(
        [(k, v, i, op) for i, (k, op, v) in enumerate(log)] or [(None,) * 4],
        "k int, v int, seq int, op string",
    ).filter("k IS NOT NULL")
    merged = apply_cdc(snap_df, log_df, "k")
    return {r.k: r.v for r in merged.collect()}


@_prop_settings
@given(snap=_SNAP, log=_LOG)
def test_apply_cdc_matches_lww_model(spark, snap, log):
    assert _spark_apply(spark, snap, log) == _model(snap, log)


@_prop_settings
@given(snap=_SNAP, log=_LOG, cut=st.integers(min_value=0, max_value=16))
def test_apply_cdc_batch_split_invariant(spark, snap, log, cut):
    cut = min(cut, len(log))
    one_shot = _spark_apply(spark, snap, log)
    mid = _spark_apply(spark, snap, log[:cut])
    staged = _spark_apply(spark, mid, log[cut:])
    assert staged == one_shot
