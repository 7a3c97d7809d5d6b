"""Comparison predicates — the reference's three "validators".

Reference semantics (running_validation.py):
- integer mode (:214-295): ``pd.to_numeric(errors='coerce')`` both
  sides, keep rows where values differ, EXCEPT rows where both coerce
  to NaN. Truth table: equal → drop; both-null → drop; one-null →
  keep; ``'13'`` vs ``'13.0'`` → drop (equal as floats).
- string mode (:318-387): ``difflib.SequenceMatcher.ratio() >=
  threshold`` row-wise; both-NaN → match (drop), one-NaN → mismatch
  (keep). Shipped threshold is 1 (config.yaml:11) ⇒ exact equality.
- date mode (:389-453): ``pd.to_datetime(errors='coerce')`` both
  sides, same null-safe keep rule with NaT.

Spark mapping: ``try_cast`` / ``try_to_timestamp`` reproduce
``errors='coerce'`` (junk → NULL) independent of the session's ANSI
setting, and ``~eqNullSafe`` reproduces the keep rule exactly
(``eqNullSafe(NULL, NULL)`` is true, so both-null rows are dropped;
one-null rows compare unequal and are kept).

The fuzzy path (threshold < 1) is the engine's single Python UDF — an
Arrow-batched pandas UDF over the *already joined, already filtered*
pair rows, never over the raw scan. ``difflib`` is stdlib, so it is
available on executors with no extra deps. The threshold == 1 case
short-circuits to a pure-JVM null-safe equality (the shipped config's
behavior, confirmed by the reference's golden output where near-miss
strings like ``CTS-VS``/``CTS-V`` are reported as differing).
"""

from __future__ import annotations

import difflib

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MODES = ("integer", "string", "date")


def coerce_check(col: Column | str, mode: str) -> Column:
    """Coerce a check column per the reference's type modes."""
    c = F.col(col) if isinstance(col, str) else col
    mode = mode.lower()
    if mode == "integer":
        # pd.to_numeric(errors='coerce') → float64; try_cast to double
        # yields NULL on junk the same way.
        return c.cast("string").try_cast("double")
    if mode == "date":
        # pd.to_datetime(errors='coerce') → NaT on junk.
        return F.try_to_timestamp(c.cast("string"))
    if mode == "string":
        return c.cast("string")
    raise ValueError(f"unknown data_type mode {mode!r}; expected one of {MODES}")


def fuzzy_ratio_udf():
    """Pairwise ``difflib.SequenceMatcher(None, a, b).ratio()`` as an
    Arrow-batched pandas UDF (reference ``fuzzy_match``,
    running_validation.py:306-316).

    Argument order is (db1, db2) — ``SequenceMatcher.ratio`` is not
    symmetric in general, and the reference fixes this order at :348.
    NULL handling mirrors the reference: both-null → 1.0 (match),
    one-null → 0.0 (mismatch).
    """

    @F.pandas_udf("double")
    def _ratio(a: pd.Series, b: pd.Series) -> pd.Series:
        def one(x, y):
            x_null, y_null = pd.isna(x), pd.isna(y)
            if x_null and y_null:
                return 1.0
            if x_null or y_null:
                return 0.0
            return difflib.SequenceMatcher(None, str(x), str(y)).ratio()

        return pd.Series([one(x, y) for x, y in zip(a, b)], dtype="float64")

    return _ratio


def differing_predicate(
    c1: Column | str,
    c2: Column | str,
    mode: str,
    *,
    threshold: float = 1.0,
) -> Column:
    """Boolean column: True for rows the reference would REPORT as
    differing (the keep rule of ops 15-17)."""
    a = F.col(c1) if isinstance(c1, str) else c1
    b = F.col(c2) if isinstance(c2, str) else c2
    mode = mode.lower()
    if mode in ("integer", "date"):
        return ~coerce_check(a, mode).eqNullSafe(coerce_check(b, mode))
    if mode == "string":
        if threshold >= 1.0:
            # Exact-equality fast path: stays in whole-stage codegen.
            return ~a.cast("string").eqNullSafe(b.cast("string"))
        return fuzzy_ratio_udf()(a.cast("string"), b.cast("string")) < F.lit(threshold)
    raise ValueError(f"unknown data_type mode {mode!r}; expected one of {MODES}")


def differing_values(
    pairs: DataFrame,
    c1: str,
    c2: str,
    mode: str,
    *,
    threshold: float = 1.0,
) -> DataFrame:
    """Filter joined pairs down to the rows whose check values differ.

    Fuzzy path (string, threshold < 1): exactly-equal pairs can never
    be reported (ratio 1 ≥ any threshold), so a JVM null-safe
    inequality prefilter runs BEFORE the Python UDF — the Arrow stage
    only ever sees the (typically tiny) differing candidate set, not
    the full join. Semantics are unchanged: both-null pairs are
    dropped by the prefilter (ratio would be 1.0 → match) and one-null
    pairs pass it (ratio 0.0 → kept iff 0 < threshold).
    """
    if mode.lower() == "string" and threshold < 1.0:
        a, b = F.col(c1).cast("string"), F.col(c2).cast("string")
        candidates = pairs.filter(~a.eqNullSafe(b))
        return candidates.filter(
            fuzzy_ratio_udf()(a, b) < F.lit(threshold)
        )
    return pairs.filter(differing_predicate(c1, c2, mode, threshold=threshold))
