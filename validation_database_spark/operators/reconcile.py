"""Reconciliation core: missing-id anti-joins + differing-value pairs.

This is the heart of the reference (running_validation.py:214-453):
for two sources sharing a canonical id,

1. ids present in one side and absent in the other, both directions
   (pandas ``~isin`` at :225-226/:329-330/:399-400) →
   ``left_anti`` joins here. Set-membership semantics: duplicate ids
   on the probe side are each reported, exactly as pandas ``isin``.
2. ids present on BOTH sides whose check values differ (pandas inner
   ``merge`` with ``_{db}`` suffixes at :233-239 + the mode-specific
   comparison) → inner equi-join + ``differing_predicate``. The m:n
   fan-out on duplicate ids is identical between pandas merge and
   Spark's inner join.

Scale posture: both anti-joins and the inner join shuffle on ``id``
once each; Catalyst broadcasts automatically when one side is small
(the reference's golden run had a 2-row side — that becomes a
BroadcastHashJoin). Nothing is materialized on the driver; the
reference's ``.tolist()`` driver materialization (:225-226) is exactly
what this module does NOT do.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .compare import differing_values


def missing_ids(first: DataFrame, second: DataFrame, id_col: str = "id") -> tuple[DataFrame, DataFrame]:
    """(rows of ``second`` whose id is absent from ``first``,
    rows of ``first`` whose id is absent from ``second``).

    Matches the reference's order: ``missing_in_first`` =
    ``second[~second.id.isin(first.id)]`` (running_validation.py:225).
    """
    missing_in_first = second.join(first.select(id_col), id_col, "left_anti")
    missing_in_second = first.join(second.select(id_col), id_col, "left_anti")
    return missing_in_first, missing_in_second


def join_pairs(
    first: DataFrame,
    second: DataFrame,
    check_column: str,
    db1: str,
    db2: str,
    id_col: str = "id",
) -> DataFrame:
    """Inner equi-join of the two sources on id, check columns suffixed
    ``_{db1}`` / ``_{db2}`` (reference :233-239)."""
    a = first.select(id_col, F.col(check_column).alias(f"{check_column}_{db1}"))
    b = second.select(id_col, F.col(check_column).alias(f"{check_column}_{db2}"))
    return a.join(b, id_col, "inner")


@dataclass
class ReconcileResult:
    missing_in_first: DataFrame
    missing_in_second: DataFrame
    differing: DataFrame
    db1: str
    db2: str
    check_column: str


def reconcile(
    first: DataFrame,
    second: DataFrame,
    *,
    check_column: str,
    mode: str,
    db1: str = "db1",
    db2: str = "db2",
    threshold: float = 1.0,
    id_col: str = "id",
) -> ReconcileResult:
    """Full validation pipeline for one table pair (the reference's
    ``validate_data_{integer,string,date}`` dispatch,
    running_validation.py:643-653)."""
    m1, m2 = missing_ids(first, second, id_col)
    pairs = join_pairs(first, second, check_column, db1, db2, id_col)
    diff = differing_values(
        pairs,
        f"{check_column}_{db1}",
        f"{check_column}_{db2}",
        mode,
        threshold=threshold,
    )
    return ReconcileResult(m1, m2, diff, db1, db2, check_column)


def reconcile_many(
    sources: dict[str, DataFrame],
    check_column: str,
    id_col: str = "id",
) -> DataFrame:
    """N-source generalization of the 2-source pipeline (the reference
    hard-codes exactly two, running_validation.py:614-615): union the
    tagged sources and aggregate per id — which sources carry the id,
    how many distinct check values exist, and the majority (consensus)
    value with deterministic tie-breaking (lexicographically smallest
    among the most frequent).

    One shuffle regardless of source count. Output:
    ``id, n_sources, present_in (csv of source names), n_distinct_values,
    consensus_value, is_consistent``.
    """
    tagged = None
    for name in sorted(sources):
        part = sources[name].select(
            F.col(id_col).alias("id"),
            F.col(check_column).cast("string").alias("val"),
            F.lit(name).alias("src"),
        )
        tagged = part if tagged is None else tagged.unionByName(part)

    from pyspark.sql import Window

    per_val = tagged.groupBy("id", "val").agg(F.count("*").alias("n"))
    ranked = per_val.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("id").orderBy(
                F.col("n").desc(), F.asc_nulls_last("val")
            )
        ),
    )
    majority = ranked.filter(F.col("rk") == 1).select(
        "id", F.col("val").alias("consensus_value")
    )
    agg = tagged.groupBy("id").agg(
        F.countDistinct("src").alias("n_sources"),
        F.concat_ws(",", F.sort_array(F.collect_set("src"))).alias("present_in"),
        F.countDistinct("val").alias("n_distinct_values"),
        F.max(F.col("val").isNull().cast("int")).alias("_has_null"),
    )
    return (
        agg.join(majority, "id")
        .select(
            "id",
            "n_sources",
            "present_in",
            "n_distinct_values",
            "consensus_value",
            (
                (F.col("n_distinct_values") == 1) & (F.col("_has_null") == 0)
            ).alias("is_consistent"),
        )
    )


def snapshot_diff(
    old: DataFrame, new: DataFrame, check_column: str, id_col: str = "id"
) -> DataFrame:
    """CDC changelog between two snapshots of one table: full outer
    join on id → inserted / deleted / updated rows (unchanged rows are
    dropped). The incremental form of the reconciliation pipeline."""
    a = old.select(
        F.col(id_col).alias("id"), F.col(check_column).cast("string").alias("old_val")
    ).withColumn("_in_old", F.lit(1))
    b = new.select(
        F.col(id_col).alias("id"), F.col(check_column).cast("string").alias("new_val")
    ).withColumn("_in_new", F.lit(1))
    joined = a.join(b, "id", "full_outer")
    status = (
        F.when(F.col("_in_old").isNull(), "inserted")
        .when(F.col("_in_new").isNull(), "deleted")
        .when(~F.col("old_val").eqNullSafe(F.col("new_val")), "updated")
        .otherwise("unchanged")
    )
    return (
        joined.withColumn("change", status)
        .filter(F.col("change") != "unchanged")
        .select("id", "change", "old_val", "new_val")
    )
