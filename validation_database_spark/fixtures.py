"""Deterministic derived validation pairs (FIXTURES.md §1).

The reference's real input was the *same* ``orders`` table living in
two databases, with a handful of missing ids and near-miss values
(golden output ids 84/94, reference
output/result/…_differing_values.csv). The engine's tests and the
driver's DuckDB cross-check recreate that scenario deterministically
from ``orders.parquet`` — no RNG, keyed on ``o_orderkey`` modular
arithmetic only, so Spark and DuckDB derive byte-identical inputs.

Derivation scheme (same for every mode):
- side A keeps rows where ``o_orderkey % 97 != 0`` (→ missing-in-A),
- side B keeps rows where ``o_orderkey % 89 != 0`` (→ missing-in-B),
- B's check value is mutated for ``% 101`` rows (differing value),
  NULL'd for ``% 103`` rows (one-sided null → must be REPORTED),
- both sides carry junk for ``% 109`` rows (coerces to NULL on both
  sides → must be DROPPED, the reference's both-NaN exclusion,
  running_validation.py:246-249),
- A carries junk for ``% 113`` rows (one-sided coercion failure →
  reported) [integer/date modes],
- integer mode formats B's ``% 107`` rows as ``'<n>.0'`` (must compare
  EQUAL to A's ``'<n>'`` per running_validation.py:241-243).

The expression fragments are emitted per dialect ("spark" /
"duckdb") from one template so the two engines can never drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .sources import load_table

MODES = ("integer", "string", "date")

A_FILTER = "o_orderkey % 97 <> 0"
B_FILTER = "o_orderkey % 89 <> 0"

_ID_EXPR = "CAST(o_orderkey AS STRING)"


def _fmt(dialect: str, expr: str) -> str:
    """Render a timestamp expression as 'YYYY-MM-DD HH:MM:SS' text."""
    if dialect == "spark":
        return f"date_format({expr}, 'yyyy-MM-dd HH:mm:ss')"
    return f"strftime({expr}, '%Y-%m-%d %H:%M:%S')"


def check_exprs(mode: str, dialect: str) -> tuple[str, str]:
    """(side-A check expression, side-B check expression) for a mode.

    The CASE branch order is part of the contract — it is identical in
    both dialects, so overlapping moduli resolve identically.
    """
    if dialect not in ("spark", "duckdb"):
        raise ValueError(f"unknown dialect {dialect!r}")
    if mode == "string":
        a = "o_orderpriority"
        b = (
            "CASE WHEN o_orderkey % 103 = 0 THEN NULL "
            "WHEN o_orderkey % 101 = 0 THEN concat(o_orderpriority, 'X') "
            "ELSE o_orderpriority END"
        )
        return a, b
    if mode == "integer":
        base = "CAST(o_orderkey % 1000 AS STRING)"
        a = (
            "CASE WHEN o_orderkey % 113 = 0 THEN 'bad' "
            f"WHEN o_orderkey % 109 = 0 THEN 'N/A' ELSE {base} END"
        )
        b = (
            "CASE WHEN o_orderkey % 103 = 0 THEN NULL "
            "WHEN o_orderkey % 109 = 0 THEN 'N/A' "
            "WHEN o_orderkey % 101 = 0 THEN CAST(o_orderkey % 1000 + 1 AS STRING) "
            f"WHEN o_orderkey % 107 = 0 THEN concat({base}, '.0') "
            f"ELSE {base} END"
        )
        return a, b
    if mode == "date":
        fa = _fmt(dialect, "o_orderdate")
        fb = _fmt(dialect, "o_orderdate + INTERVAL 1 DAY")
        a = (
            "CASE WHEN o_orderkey % 113 = 0 THEN 'bad-date' "
            f"WHEN o_orderkey % 109 = 0 THEN 'bad-date' ELSE {fa} END"
        )
        b = (
            "CASE WHEN o_orderkey % 103 = 0 THEN NULL "
            "WHEN o_orderkey % 109 = 0 THEN 'bad-date' "
            f"WHEN o_orderkey % 101 = 0 THEN {fb} "
            f"ELSE {fa} END"
        )
        return a, b
    raise ValueError(f"unknown mode {mode!r}; expected one of {MODES}")


def _select_sql(mode: str, dialect: str, side: str) -> str:
    a_expr, b_expr = check_exprs(mode, dialect)
    expr = a_expr if side == "a" else b_expr
    filt = A_FILTER if side == "a" else B_FILTER
    return (
        f"SELECT {_ID_EXPR} AS id, {expr} AS check_col, "
        f"o_orderdate AS month_id FROM orders WHERE {filt}"
    )


def pair_cte(mode: str, dialect: str = "duckdb", *, dup_keys: bool = False) -> str:
    """``WITH src_a AS (…), src_b AS (…)`` prefix for oracle SQL.

    ``dup_keys=True`` appends a UNION ALL of the ``% 127`` rows to
    side A — duplicate-id coverage pinning pandas-vs-Spark m:n join
    semantics (FIXTURES.md §4, SURVEY.md §7 "what's hard" #4).
    """
    a_sql = _select_sql(mode, dialect, "a")
    b_sql = _select_sql(mode, dialect, "b")
    if dup_keys:
        a_sql = (
            f"{a_sql} UNION ALL "
            f"{_select_sql(mode, dialect, 'a')} AND o_orderkey % 127 = 0"
        )
    return f"WITH src_a AS ({a_sql}), src_b AS ({b_sql})"


def validation_pair(
    spark: SparkSession,
    sf_dir: str,
    mode: str,
    *,
    dup_keys: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Spark-side derivation of (src_a, src_b): columns
    ``id string, check_col string, month_id timestamp``."""
    orders = load_table(spark, "orders", sf_dir)
    a_expr, b_expr = check_exprs(mode, "spark")
    src_a = orders.filter(A_FILTER).selectExpr(
        f"{_ID_EXPR} AS id", f"{a_expr} AS check_col", "o_orderdate AS month_id"
    )
    src_b = orders.filter(B_FILTER).selectExpr(
        f"{_ID_EXPR} AS id", f"{b_expr} AS check_col", "o_orderdate AS month_id"
    )
    if dup_keys:
        dup = orders.filter(A_FILTER).filter("o_orderkey % 127 = 0").selectExpr(
            f"{_ID_EXPR} AS id", f"{a_expr} AS check_col", "o_orderdate AS month_id"
        )
        src_a = src_a.unionAll(dup)
    return src_a, src_b
