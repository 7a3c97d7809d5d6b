"""Distributed EWMA kernel: the time-step-vectorized mapInPandas
operator must be bitwise the per-key scalar recurrence for non-dyadic
alpha, including when a key's series spans multiple Arrow batches
(the carried-state path)."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd


def _val(k: int, t: int) -> float:
    h = int(hashlib.md5(f"{k}|{t}".encode()).hexdigest()[:8], 16)
    return (h % 200_000 - 100_000) / 100.0


def _fixture() -> pd.DataFrame:
    rows = []
    for k in range(7):
        for t in range(1 + 60 * k):  # lengths 1..361, forces batch spans
            rows.append((k, t, _val(k, t)))
    return pd.DataFrame(rows, columns=["k", "t", "v"])


def test_ewma_distributed_bitwise_matches_scalar_loop(spark):
    from validation_database_spark.operators.timeseries import ewma

    alpha = 0.9  # non-dyadic: the case the old ewm fast path got wrong
    pdf = _fixture()
    df = spark.createDataFrame(pdf)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "37")
    try:
        got = {
            (r.k, r.t): r.ewma
            for r in ewma(df, ["k"], ["t"], "v", alpha).collect()
        }
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)

    assert len(got) == len(pdf)
    a, b = alpha, 1.0 - alpha
    for k, grp in pdf.groupby("k"):
        x = grp.sort_values("t")["v"].to_numpy(dtype="float64")
        s = np.empty_like(x)
        s[0] = x[0]
        for i in range(1, len(x)):
            s[i] = a * x[i] + b * s[i - 1]
        for t, expect in enumerate(s):
            # bitwise: exact float equality, no tolerance
            assert got[(k, t)] == expect, (k, t, got[(k, t)], expect)


def test_ewma_sequential_fallback_bitwise(spark):
    """Force the matrix-cell cap to 1 so every batch takes the
    frompyfunc sequential path; results must be identical bits.
    (The cap is a closure-captured parameter so the override reaches
    the executor-side kernel.)"""
    from validation_database_spark.operators import timeseries

    alpha = 0.3
    pdf = _fixture()
    df = spark.createDataFrame(pdf)
    got = {
        (r.k, r.t): r.ewma
        for r in timeseries.ewma(
            df, ["k"], ["t"], "v", alpha, _matrix_cell_cap=1
        ).collect()
    }
    a, b = alpha, 1.0 - alpha
    for k, grp in pdf.groupby("k"):
        x = grp.sort_values("t")["v"].to_numpy(dtype="float64")
        s = np.empty_like(x)
        s[0] = x[0]
        for i in range(1, len(x)):
            s[i] = a * x[i] + b * s[i - 1]
        for t, expect in enumerate(s):
            assert got[(k, t)] == expect, (k, t)
