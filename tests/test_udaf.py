"""Custom grouped aggregation via applyInPandas (the Python-UDAF
path), pinned against the exact JVM-expression regression query."""

from __future__ import annotations

import pytest

from validation_database_spark.sources import load_table
from validation_database_spark.suite.advanced import q_regression_spend_trend


def test_apply_in_pandas_ols_matches_exact_query(spark, sf_dir):
    orders = load_table(spark, "orders", sf_dir).select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )

    # Self-contained kernel: executor workers have numpy/pandas but
    # not this package.
    def ols(pdf):
        import numpy as np
        import pandas as pd

        x = (pdf["o_orderdate"].astype("datetime64[s]").astype("int64") // 86400).to_numpy(
            dtype="float64"
        )
        y = pdf["o_totalprice"].to_numpy(dtype="float64")
        if len(x) < 2 or np.ptp(x) == 0:
            slope = float("nan")
        else:
            slope = float(np.polyfit(x, y, 1)[0])
        return pd.DataFrame(
            {"o_custkey": [pdf["o_custkey"].iloc[0]], "slope": [slope], "n": [len(pdf)]}
        )

    via_udaf = orders.groupBy("o_custkey").applyInPandas(
        ols, schema="o_custkey long, slope double, n long"
    )
    got = {r.o_custkey: (r.slope, r.n) for r in via_udaf.collect()}

    exact = {
        r.o_custkey: (r.slope_per_day, r.n_orders)
        for r in q_regression_spend_trend(spark, sf_dir).collect()
    }
    assert set(got) == set(exact)
    for k, (slope, n) in got.items():
        e_slope, e_n = exact[k]
        assert n == e_n
        if e_slope is None:
            assert slope != slope  # NaN: degenerate group in both paths
        else:
            assert slope == pytest.approx(e_slope, rel=1e-4, abs=1e-4), (k, slope, e_slope)
