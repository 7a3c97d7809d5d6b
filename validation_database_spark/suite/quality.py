"""Data-quality report queries: the declarative rule engine
(operators/quality.py) run over the fixture tables, oracle-checked
rule by rule."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import quality as Q
from ..sources import load_table
from . import QuerySpec


def q_dq_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality report for orders (+ a lineitem→orders FK): seven rules
    in one scan + one anti-join. The fixture data is clean, so passing
    rules report 0 violations — and two deliberately-too-strict rules
    prove violations are actually counted."""
    orders = load_table(spark, "orders", sf_dir)
    lineitem = load_table(spark, "lineitem", sf_dir)
    rules = [
        Q.not_null("o_custkey"),
        Q.unique("o_orderkey"),
        Q.in_range("o_totalprice", lo=0.0),
        Q.allowed_values("o_orderstatus", ["O", "F", "P"]),
        Q.matches_regex("o_orderpriority", "^[1-5]-"),
        # deliberately strict: prices are well above 1000, statuses
        # include all three → nonzero violation counts
        Q.in_range("o_totalprice", lo=100000.0),
        Q.allowed_values("o_orderstatus", ["O"]),
    ]
    report = Q.run_rules(orders, rules)
    fk = Q.foreign_key(lineitem, "l_orderkey", orders, "o_orderkey")
    return report.unionByName(fk)


ORACLE_DQ_ORDERS = """
WITH n AS (SELECT count(*) AS n_rows FROM orders),
nl AS (SELECT count(*) AS n_rows FROM lineitem)
SELECT 'not_null' AS rule, 'o_custkey' AS column,
       (SELECT count(*) FROM orders WHERE o_custkey IS NULL) AS violations,
       n.n_rows, (SELECT count(*) FROM orders WHERE o_custkey IS NULL) = 0 AS passed
FROM n
UNION ALL
SELECT 'unique', 'o_orderkey',
       (SELECT count(o_orderkey) - count(DISTINCT o_orderkey) FROM orders),
       n.n_rows,
       (SELECT count(o_orderkey) - count(DISTINCT o_orderkey) FROM orders) = 0
FROM n
UNION ALL
SELECT 'in_range[0.0,None]', 'o_totalprice',
       (SELECT count(*) FROM orders WHERE o_totalprice < 0.0), n.n_rows,
       (SELECT count(*) FROM orders WHERE o_totalprice < 0.0) = 0
FROM n
UNION ALL
SELECT 'allowed_values[3]', 'o_orderstatus',
       (SELECT count(*) FROM orders
         WHERE o_orderstatus IS NULL OR o_orderstatus NOT IN ('O','F','P')), n.n_rows,
       (SELECT count(*) FROM orders
         WHERE o_orderstatus IS NULL OR o_orderstatus NOT IN ('O','F','P')) = 0
FROM n
UNION ALL
SELECT 'matches_regex', 'o_orderpriority',
       (SELECT count(*) FROM orders
         WHERE o_orderpriority IS NULL OR NOT regexp_matches(o_orderpriority, '^[1-5]-')),
       n.n_rows,
       (SELECT count(*) FROM orders
         WHERE o_orderpriority IS NULL OR NOT regexp_matches(o_orderpriority, '^[1-5]-')) = 0
FROM n
UNION ALL
SELECT 'in_range[100000.0,None]', 'o_totalprice',
       (SELECT count(*) FROM orders WHERE o_totalprice < 100000.0), n.n_rows,
       (SELECT count(*) FROM orders WHERE o_totalprice < 100000.0) = 0
FROM n
UNION ALL
SELECT 'allowed_values[1]', 'o_orderstatus',
       (SELECT count(*) FROM orders
         WHERE o_orderstatus IS NULL OR o_orderstatus NOT IN ('O')), n.n_rows,
       (SELECT count(*) FROM orders
         WHERE o_orderstatus IS NULL OR o_orderstatus NOT IN ('O')) = 0
FROM n
UNION ALL
SELECT 'foreign_key', 'l_orderkey',
       (SELECT count(*) FROM lineitem l
         WHERE l_orderkey IS NOT NULL
           AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)),
       nl.n_rows,
       (SELECT count(*) FROM lineitem l
         WHERE l_orderkey IS NOT NULL
           AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) = 0
FROM nl
"""



def q_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling in one aggregation pass: null count, exact
    distinct count, numeric min/max (NULL for string columns) and
    lexicographic min/max (NULL for numerics) for every orders
    column — the profiling sibling of the rule report."""
    orders = load_table(spark, "orders", sf_dir)
    num_cols = ["o_orderkey", "o_custkey", "o_totalprice"]
    str_cols = ["o_orderstatus", "o_orderpriority"]
    aggs = []
    for c in num_cols + str_cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("bigint").alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
        ]
    for c in num_cols:
        aggs += [
            F.round(F.min(F.col(c).cast("double")), 6).alias(f"{c}__min_num"),
            F.round(F.max(F.col(c).cast("double")), 6).alias(f"{c}__max_num"),
        ]
    for c in str_cols:
        aggs += [F.min(c).alias(f"{c}__min_str"), F.max(c).alias(f"{c}__max_str")]
    one = orders.agg(*aggs)

    def row(c: str, numeric: bool) -> str:
        min_num = f"{c}__min_num" if numeric else "CAST(NULL AS DOUBLE)"
        max_num = f"{c}__max_num" if numeric else "CAST(NULL AS DOUBLE)"
        min_str = "CAST(NULL AS STRING)" if numeric else f"{c}__min_str"
        max_str = "CAST(NULL AS STRING)" if numeric else f"{c}__max_str"
        return f"'{c}', {c}__nulls, {c}__distinct, {min_num}, {max_num}, {min_str}, {max_str}"

    parts = [row(c, True) for c in num_cols] + [row(c, False) for c in str_cols]
    n = len(parts)
    return one.selectExpr(
        f"stack({n}, {', '.join(parts)}) AS "
        "(column, n_nulls, n_distinct, min_num, max_num, min_str, max_str)"
    )


def _profile_row(c: str, numeric: bool) -> str:
    min_num = f"ROUND(min(CAST({c} AS DOUBLE)), 6)" if numeric else "CAST(NULL AS DOUBLE)"
    max_num = f"ROUND(max(CAST({c} AS DOUBLE)), 6)" if numeric else "CAST(NULL AS DOUBLE)"
    min_str = "CAST(NULL AS STRING)" if numeric else f"min({c})"
    max_str = "CAST(NULL AS STRING)" if numeric else f"max({c})"
    return (
        f"SELECT '{c}' AS column, "
        f"CAST(count(*) FILTER ({c} IS NULL) AS BIGINT) AS n_nulls, "
        f"count(DISTINCT {c}) AS n_distinct, "
        f"{min_num} AS min_num, {max_num} AS max_num, "
        f"{min_str} AS min_str, {max_str} AS max_str FROM orders"
    )


ORACLE_PROFILE_ORDERS = "\nUNION ALL\n".join(
    [_profile_row(c, True) for c in ("o_orderkey", "o_custkey", "o_totalprice")]
    + [_profile_row(c, False) for c in ("o_orderstatus", "o_orderpriority")]
)



def q_dq_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law screening on order totals: observed leading-digit
    frequencies vs the log10(1+1/d) expectation — the classic
    fabricated-data smell test. Deterministic: counts + rounded
    frequencies only."""
    orders = load_table(spark, "orders", sf_dir)
    digit = F.substring(F.floor("o_totalprice").cast("string"), 1, 1).cast("int")
    per_digit = (
        orders.filter(F.col("o_totalprice") > 0)
        .groupBy(digit.alias("digit"))
        .agg(F.count("*").alias("n"))
    )
    total = per_digit.agg(F.sum("n").alias("total"))
    expected = F.round(F.log10(1 + 1 / F.col("digit").cast("double")), 6)
    return (
        per_digit.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n",
            F.round(F.col("n").cast("double") / F.col("total"), 6).alias("observed_freq"),
            expected.alias("benford_freq"),
            F.round(
                F.abs(
                    F.round(F.col("n").cast("double") / F.col("total"), 6)
                    - F.round(F.log10(1 + 1 / F.col("digit").cast("double")), 6)
                ),
                6,
            ).alias("abs_deviation"),
        )
    )


ORACLE_DQ_BENFORD = """
WITH d AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS STRING), 1, 1) AS INT) AS digit,
         count(*) AS n
  FROM orders WHERE o_totalprice > 0 GROUP BY 1
),
t AS (SELECT sum(n) AS total FROM d)
SELECT digit, n,
       ROUND(CAST(n AS DOUBLE) / total, 6) AS observed_freq,
       ROUND(log10(1 + 1 / CAST(digit AS DOUBLE)), 6) AS benford_freq,
       ROUND(abs(ROUND(CAST(n AS DOUBLE) / total, 6)
                 - ROUND(log10(1 + 1 / CAST(digit AS DOUBLE)), 6)), 6) AS abs_deviation
FROM d, t
"""


SPECS = [
    QuerySpec("dq_orders", q_dq_orders, ORACLE_DQ_ORDERS,
              "declarative data-quality rule report (7 rules + FK)"),
    QuerySpec("profile_orders", q_profile_orders, ORACLE_PROFILE_ORDERS,
              "single-pass column profiling (nulls/distinct/min/max)"),
    QuerySpec("dq_benford", q_dq_benford, ORACLE_DQ_BENFORD,
              "Benford leading-digit distribution screening"),
]
