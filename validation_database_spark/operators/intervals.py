"""Interval-overlap join via bin explosion — the scale path for
interval × interval predicates.

Spark executes ``l_start <= r_end AND r_start <= l_end`` as a
BroadcastNestedLoopJoin (or a cartesian product when neither side
fits in a broadcast): O(|L|·|R|) comparisons. The standard rewrite
(used by every temporal-join engine; generalizes the point-in-band
bucket trick in ``suite/advanced.py::q_range_join_price_bands``)
tiles time into fixed-width bins, explodes each interval into the
bins it touches, and equi-joins on the bin id — each candidate pair
is compared only in bins both intervals touch, so cost is
O(n · span/bin + true_pairs), hash-partitioned on the bin key.

Duplicate elimination is free: a pair of overlapping closed
intervals is emitted ONLY in the bin containing the later of the two
start points (that bin lies inside both intervals, and is unique),
so no post-join ``distinct`` shuffle is needed.

Scale notes: pick ``bin_seconds`` near the typical interval length —
too small multiplies the explode fan-out (span/bin rows per
interval), too large turns one bin into a mini cross product of
everything alive in it. Calendar-skewed data (everything in one hot
day) degrades a day-sized bin to the quadratic case; shrink the bin
or salt the hot bin with ``operators.skew.salted_join`` semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def micros(df: DataFrame, col: str) -> Column:
    """Microseconds since epoch for a TIMESTAMP or TIMESTAMP_NTZ
    column. NTZ values (e.g. the events table's nanosecond-sourced
    ``ts``) are measured against an NTZ epoch so the result never
    depends on the session timezone."""
    if dict(df.dtypes)[col] == "timestamp_ntz":
        return F.timestamp_diff(
            "MICROSECOND",
            F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
            F.col(col),
        )
    return F.unix_micros(F.col(col))


def _bin_id(us: Column, bin_us: int) -> Column:
    # Integral floor-division of the microsecond epoch. The cast
    # truncates toward zero == floor for the positive epochs this
    # engine handles (fixtures start 2024; pre-1970 data would need
    # a pmod-based floor).
    return (us / F.lit(bin_us)).cast("bigint")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_span: tuple[str, str],
    right_span: tuple[str, str],
    bin_seconds: int,
) -> DataFrame:
    """Inner-join rows whose CLOSED intervals ``[start, end]``
    overlap: ``l_start <= r_end AND r_start <= l_end``.

    ``left_span`` / ``right_span`` name the (start, end) timestamp
    columns. Column names must be disjoint between the two sides
    (alias before calling). Rows with ``end < start`` are dropped
    (an empty closed interval overlaps nothing).

    Returns all left columns followed by all right columns, exactly
    the rows the naive theta join would produce, in a plan that is
    an equi-join on the bin id (shuffle- or broadcast-hash), never a
    nested loop.
    """
    overlap_cols = set(left.columns) & set(right.columns)
    if overlap_cols:
        raise ValueError(f"column names must be disjoint, shared: {sorted(overlap_cols)}")
    bin_us = bin_seconds * 1_000_000
    ls, le = (F.col(c) for c in left_span)
    rs, re = (F.col(c) for c in right_span)

    def tiled(df: DataFrame, span: tuple[str, str]) -> DataFrame:
        s, e = span
        return df.filter(F.col(e) >= F.col(s)).withColumn(
            "__bin",
            F.explode(
                F.sequence(_bin_id(micros(df, s), bin_us), _bin_id(micros(df, e), bin_us))
            ),
        )

    l = tiled(left, left_span)
    r = tiled(right, right_span)
    # The later start lies inside both intervals of an overlapping
    # pair, so its bin is shared and unique — emit there only.
    l_start_us = micros(left, left_span[0])
    r_start_us = micros(right, right_span[0])
    anchor = _bin_id(F.greatest(l_start_us, r_start_us), bin_us)
    return (
        l.join(r, "__bin")
        .filter((ls <= re) & (rs <= le) & (F.col("__bin") == anchor))
        .drop("__bin")
        .select(*left.columns, *right.columns)
    )
