"""Composite-key canonicalization.

The reference builds a per-dialect SQL fragment that stringifies each
key column, substitutes ``'0'`` for NULL parts, and joins the parts
with ``'_'`` (reference running_validation.py:471-476; dialect
variants VARCHAR / STRING / VARCHAR2(255) at :491-559). In Spark this
is a single JVM-side expression — whole-stage codegen'd, no UDF — and
dialect variants are obsolete.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def composite_id(
    key_columns: Sequence[str | Column],
    *,
    null_literal: str = "0",
    separator: str = "_",
) -> Column:
    """``CAST(COALESCE(CAST(col AS STRING), '0') AS STRING)`` per key
    column, concatenated with ``'_'``.

    The single-column unique-id case is just the 1-element list, as in
    the reference's shipped config (config.yaml:19).

    Note ``concat_ws`` alone would *skip* NULLs rather than substitute
    the literal, which changes the id for rows with NULL key parts —
    hence the explicit per-part ``coalesce``.
    """
    if not key_columns:
        raise ValueError("composite_id requires at least one key column")
    parts = [
        F.coalesce(
            (F.col(c) if isinstance(c, str) else c).cast("string"),
            F.lit(null_literal),
        )
        for c in key_columns
    ]
    return F.concat_ws(separator, *parts)
