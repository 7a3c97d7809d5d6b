"""Declarative data-quality rules — the generalization of the
reference's single hard-wired check ("do these two tables agree on
one column") into a rule engine over any table
(BASELINE.json north star: "DataFrame validation rules + SQL
checks").

A rule compiles to a violation-count expression; all column rules for
a table evaluate in ONE aggregation pass over the data (a single
scan, map-side combined), then unpivot to one row per rule.
Referential rules (foreign keys) need a join and are unioned in.

Output schema: ``rule string, column string, violations bigint,
n_rows bigint, passed boolean`` — a machine-checkable quality report
that stays distributed regardless of table size.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    name: str
    column: str
    #: builds the violation-count aggregate expression
    agg: Callable[[], Column]


def not_null(column: str) -> Rule:
    return Rule(
        "not_null",
        column,
        lambda: F.sum(F.when(F.col(column).isNull(), 1).otherwise(0)),
    )


def unique(column: str) -> Rule:
    # violations = non-null rows beyond the first of each value
    return Rule(
        "unique",
        column,
        lambda: F.count(column) - F.countDistinct(column),
    )


def in_range(column: str, lo: float | None = None, hi: float | None = None) -> Rule:
    def agg() -> Column:
        cond = F.lit(False)
        if lo is not None:
            cond = cond | (F.col(column) < lo)
        if hi is not None:
            cond = cond | (F.col(column) > hi)
        return F.sum(F.when(cond, 1).otherwise(0))

    return Rule(f"in_range[{lo},{hi}]", column, agg)


def allowed_values(column: str, values: Sequence[str]) -> Rule:
    vals = list(values)
    return Rule(
        f"allowed_values[{len(vals)}]",
        column,
        lambda: F.sum(
            F.when(~F.col(column).isin(vals) | F.col(column).isNull(), 1).otherwise(0)
        ),
    )


def matches_regex(column: str, pattern: str) -> Rule:
    return Rule(
        "matches_regex",
        column,
        lambda: F.sum(
            F.when(~F.col(column).rlike(pattern) | F.col(column).isNull(), 1).otherwise(0)
        ),
    )


def min_row_count(n: int) -> Rule:
    return Rule(
        f"min_row_count[{n}]",
        "*",
        lambda: F.when(F.count(F.lit(1)) < n, F.count(F.lit(1))).otherwise(0),
    )


def run_rules(df: DataFrame, rules: Sequence[Rule]) -> DataFrame:
    """Evaluate all column rules in one aggregation pass; one output
    row per rule."""
    aggs = [F.count(F.lit(1)).alias("__n_rows")] + [
        r.agg().cast("bigint").alias(f"__r{i}") for i, r in enumerate(rules)
    ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{r.name}', '{r.column}', __r{i}" for i, r in enumerate(rules)
    )
    return one.selectExpr(
        "__n_rows", f"stack({len(rules)}, {stack_args}) AS (rule, column, violations)"
    ).select(
        "rule",
        "column",
        F.coalesce("violations", F.lit(0)).alias("violations"),
        F.col("__n_rows").alias("n_rows"),
        (F.coalesce("violations", F.lit(0)) == 0).alias("passed"),
    )


def foreign_key(
    child: DataFrame, child_col: str, parent: DataFrame, parent_col: str
) -> DataFrame:
    """Referential-integrity rule: child keys missing from the parent
    (left_anti join; NULL child keys are not violations, matching SQL
    FK semantics). Same output schema as run_rules."""
    n_rows = child.agg(F.count(F.lit(1)).alias("n")).withColumnRenamed("n", "n_rows")
    orphans = (
        child.filter(F.col(child_col).isNotNull())
        .join(
            parent.select(F.col(parent_col).alias(child_col)), child_col, "left_anti"
        )
        .agg(F.count(F.lit(1)).alias("violations"))
    )
    return orphans.crossJoin(n_rows).select(
        F.lit("foreign_key").alias("rule"),
        F.lit(child_col).alias("column"),
        F.col("violations").cast("bigint").alias("violations"),
        F.col("n_rows").cast("bigint").alias("n_rows"),
        (F.col("violations") == 0).alias("passed"),
    )
