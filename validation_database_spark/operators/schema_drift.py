"""Schema-drift detection: the metadata half of cross-source
validation.

The reference compares VALUES between two sources but trusts that
their schemas already line up (its generated SQL hard-codes the
column list, reference running_validation.py:489-562, and a drifted
source surfaces as an opaque DB error). A validation engine at lake
scale needs the schema diff as a first-class report: which columns
appeared, disappeared, or changed type between two sources / two
snapshots of one source.

Pure metadata — ``DataFrame.schema`` is driver-side state, so the
report costs ZERO Spark jobs and works identically on a 10-row
fixture and a 100 TB table. The report itself is returned as a
(small) DataFrame so it composes with the engine's sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: drift statuses, in report order.
ADDED = "added"          # present only in the second schema
REMOVED = "removed"      # present only in the first schema
TYPE_CHANGED = "type_changed"
NULLABILITY_CHANGED = "nullability_changed"
UNCHANGED = "unchanged"

_REPORT_SCHEMA = T.StructType(
    [
        T.StructField("column", T.StringType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("type_first", T.StringType(), True),
        T.StructField("type_second", T.StringType(), True),
    ]
)


def schema_drift(
    first: DataFrame,
    second: DataFrame,
    *,
    include_unchanged: bool = False,
    check_nullability: bool = False,
) -> DataFrame:
    """Diff two DataFrame schemas into a drift report.

    Column identity is by (case-sensitive) name; types compare by
    Spark ``simpleString`` (so ``decimal(18,2)`` vs ``decimal(38,6)``
    IS drift). Order: first schema's column order, then added
    columns in second-schema order — deterministic for downstream
    hashing.
    """
    spark = first.sparkSession
    a = {f.name: f for f in first.schema.fields}
    b = {f.name: f for f in second.schema.fields}
    rows: list[tuple[str, str, str | None, str | None]] = []
    for name, fa in a.items():
        fb = b.get(name)
        ta = fa.dataType.simpleString()
        if fb is None:
            rows.append((name, REMOVED, ta, None))
            continue
        tb = fb.dataType.simpleString()
        if ta != tb:
            rows.append((name, TYPE_CHANGED, ta, tb))
        elif check_nullability and fa.nullable != fb.nullable:
            rows.append((name, NULLABILITY_CHANGED, ta, tb))
        elif include_unchanged:
            rows.append((name, UNCHANGED, ta, tb))
    for name, fb in b.items():
        if name not in a:
            rows.append((name, ADDED, None, fb.dataType.simpleString()))
    return spark.createDataFrame(rows, _REPORT_SCHEMA)


def has_breaking_drift(first: DataFrame, second: DataFrame) -> bool:
    """True when reconciling ``first`` vs ``second`` would silently
    mis-compare: a column vanished or changed type. (ADDED columns
    are non-breaking — the validation projects the configured
    columns.) Driver-side only; no jobs."""
    report = schema_drift(first, second)
    breaking = {REMOVED, TYPE_CHANGED}
    # schema_drift builds from driver-side lists; collect() here is a
    # local-relation materialization, not a cluster job.
    return any(r.status in breaking for r in report.collect())


def assert_schemas_compatible(
    first: DataFrame, second: DataFrame, *, context: str = "validation"
) -> None:
    """Raise with the full drift report when breaking drift exists —
    the guard the reference lacked (it would die inside the DB with
    an opaque column error instead)."""
    if has_breaking_drift(first, second):
        detail = ", ".join(
            f"{r.column}: {r.status} ({r.type_first} -> {r.type_second})"
            for r in schema_drift(first, second).collect()
            if r.status in (REMOVED, TYPE_CHANGED)
        )
        raise ValueError(f"breaking schema drift before {context}: {detail}")
