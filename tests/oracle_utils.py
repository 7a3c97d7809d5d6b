"""Local replica of the driver's Spark-vs-DuckDB differential check.

Runs a suite QuerySpec's Spark plan and its DuckDB oracle SQL over the
same parquet fixtures and asserts the result multisets match
(order-insensitive, columns sorted by name) — catching any parity
drift at sf0.001 before the driver's sf0.01 gate does.
"""

from __future__ import annotations

import datetime
import os

import duckdb
import numpy as np
import pandas as pd

from validation_database_spark.sources.registry import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.isdir(path):
            # multi-file layout (e.g. the /tmp scale replica)
            path = os.path.join(path, "*.parquet")
        elif not os.path.exists(path):
            continue
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def _canon_value(v):
    if v is None:
        return None
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_canon_value(x) for x in v)
    try:
        if pd.isna(v):
            return None
    except (TypeError, ValueError):
        pass
    if isinstance(v, (np.floating, float)):
        return round(float(v), 9)
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime().replace(tzinfo=None).isoformat(sep=" ")
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    return v


def _canon_frame(pdf: pd.DataFrame):
    cols = sorted(pdf.columns)
    rows = [
        tuple(_canon_value(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    ]
    rows.sort(key=repr)
    return cols, rows


def _dtype_kinds(pdf: pd.DataFrame) -> dict:
    """Column → numpy dtype kind, with the integer-valued-float
    fingerprint split out: DuckDB renders HUGEINT (e.g. SUM over
    integers) as float64, which the lenient value canonicalization
    cannot distinguish from a true int column — but the driver's
    stricter hash can (``11.0`` vs ``11``). Flag any column where one
    engine yields ints and the other NaN-free integer-valued floats."""
    kinds = {}
    for c in pdf.columns:
        k = pdf[c].dtype.kind
        if k == "f" and not pdf[c].isna().any():
            vals = pdf[c].to_numpy()
            if len(vals) and np.all(vals == np.floor(vals)):
                k = "f(int-valued)"
        kinds[c] = k
    return kinds


def assert_matches_oracle(spark, spec, sf_dir: str, max_report: int = 5) -> None:
    spark_pdf = spec.spark_fn(spark, sf_dir).toPandas()
    con = duckdb_conn(sf_dir)
    duck_pdf = con.execute(spec.oracle).fetchdf()
    con.close()

    s_kinds, d_kinds = _dtype_kinds(spark_pdf), _dtype_kinds(duck_pdf)
    drift = {
        c: (s_kinds.get(c), d_kinds.get(c))
        for c in set(s_kinds) | set(d_kinds)
        if {s_kinds.get(c), d_kinds.get(c)} in ({"i", "f(int-valued)"}, {"i", "f"})
    }
    assert not drift, (
        f"{spec.name}: int/float dtype drift (HUGEINT-class driver hash "
        f"mismatch): {drift}"
    )

    s_cols, s_rows = _canon_frame(spark_pdf)
    d_cols, d_rows = _canon_frame(duck_pdf)
    assert s_cols == d_cols, f"{spec.name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"{spec.name}: row count {len(s_rows)} vs oracle {len(d_rows)}"
    )
    if s_rows != d_rows:
        mism = [(a, b) for a, b in zip(s_rows, d_rows) if a != b][:max_report]
        raise AssertionError(f"{spec.name}: value mismatch, first diffs: {mism}")
