"""Sequential time-series recurrences (EWMA & friends).

A recurrence s_t = f(x_t, s_{t-1}) is the one shape tidy window
functions cannot express (Spark has no folding window aggregate), so
it runs as an ``applyInPandas`` kernel per key — the same pattern as
the packing operator (operators/packing.py): keys are independent, so
the shuffle is one hash partition on the key and every group computes
in parallel; within a group the recurrence is evaluated in C by
pandas (``ewm(adjust=False)``), which is bitwise-identical to the
explicit loop ``s_i = α·x_i + (1−α)·s_{i−1}`` (verified: IEEE
multiply/add in the same order; addition commutativity makes operand
order irrelevant). That bitwise determinism is what lets a DuckDB
recursive CTE replay the recurrence exactly for the oracle.

Generalization of the reference's row-comparison semantics
(running_validation.py:214-295) to ordered per-key state — none of
this exists in the reference; it is north-star surface for
time-series feature pipelines.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame


def ewma(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    alpha: float,
    out_col: str = "ewma",
) -> DataFrame:
    """Per-key exponentially-weighted moving average of ``value_col``
    along ``order_cols``: s_1 = x_1, s_t = α·x_t + (1−α)·s_{t−1}
    (the ``adjust=False`` recurrence). Output schema = input schema +
    ``out_col`` double.

    One shuffle (hash on the key), then embarrassingly parallel
    across keys; each group's pass is a vectorized C loop, not
    per-row Python.
    """
    from pyspark.sql import types as T

    schema = T.StructType(df.schema.fields + [T.StructField(out_col, T.DoubleType())])
    keys, order = list(key_cols), list(order_cols)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort")
        pdf[out_col] = pdf[value_col].astype("float64").ewm(
            alpha=alpha, adjust=False
        ).mean()
        return pdf

    return df.groupBy(*keys).applyInPandas(fn, schema=schema)
