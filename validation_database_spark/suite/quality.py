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


# --- corpus quality-filter funnel ---------------------------------------

FUNNEL_LANGS = ("en", "es", "de", "fr")
FUNNEL_MIN_CHARS = 100
FUNNEL_MIN_TOKENS = 20


def q_quality_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stage drop accounting for a C4-style corpus filter chain:
    min-length → language keep-list → min token count → unique-token
    ratio. Each stage applies to the previous stage's survivors; the
    report is (stage, n_in, n_dropped, n_out) — the observability a
    pipeline needs to explain where 100 TB of crawl went.

    ONE scan: the four predicates and their cumulative survivals are
    conditional sums in a single aggregation; the 4-row report is a
    ``stack`` over that single row. The unique-token-ratio threshold
    is compared by integer cross-multiplication (10·distinct ≥
    3·total), so no float boundary can split the engines."""
    from .text import _tokens

    docs = load_table(spark, "documents", sf_dir)
    toks = _tokens(F.col("text"))
    n_tok = F.size(toks)
    p1 = F.col("n_chars") >= FUNNEL_MIN_CHARS
    p2 = F.col("lang").isin(*FUNNEL_LANGS)
    p3 = n_tok >= FUNNEL_MIN_TOKENS
    p4 = F.size(F.array_distinct(toks)) * 10 >= n_tok * 3
    s1 = p1
    s2 = s1 & p2
    s3 = s2 & p3
    s4 = s3 & p4

    def cnt(cond):
        return F.sum(cond.cast("bigint"))

    agg = docs.agg(
        F.count("*").alias("n"),
        cnt(s1).alias("c1"),
        cnt(s2).alias("c2"),
        cnt(s3).alias("c3"),
        cnt(s4).alias("c4"),
    )
    return agg.select(
        F.expr(
            "stack(4, "
            "1L, 'min_chars',  n,  n - c1, c1, "
            "2L, 'lang_keep',  c1, c1 - c2, c2, "
            "3L, 'min_tokens', c2, c2 - c3, c3, "
            "4L, 'uniq_ratio', c3, c3 - c4, c4) "
            "AS (stage_idx, stage, n_in, n_dropped, n_out)"
        )
    )


def _oracle_quality_funnel() -> str:
    from .text import _tokens_sql

    langs = ", ".join(f"'{l}'" for l in FUNNEL_LANGS)
    return f"""
WITH d AS (
  SELECT n_chars, lang, {_tokens_sql('text')} AS toks FROM documents
),
p AS (
  SELECT n_chars >= {FUNNEL_MIN_CHARS} AS p1,
         lang IN ({langs}) AS p2,
         len(toks) >= {FUNNEL_MIN_TOKENS} AS p3,
         len(list_distinct(toks)) * 10 >= len(toks) * 3 AS p4
  FROM d
),
a AS (
  SELECT count(*) AS n,
         CAST(sum(CASE WHEN p1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         CAST(sum(CASE WHEN p1 AND p2 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
         CAST(sum(CASE WHEN p1 AND p2 AND p3 THEN 1 ELSE 0 END) AS BIGINT) AS c3,
         CAST(sum(CASE WHEN p1 AND p2 AND p3 AND p4 THEN 1 ELSE 0 END) AS BIGINT) AS c4
  FROM p
)
SELECT * FROM (
  SELECT CAST(1 AS BIGINT) AS stage_idx, 'min_chars' AS stage, n AS n_in, n - c1 AS n_dropped, c1 AS n_out FROM a
  UNION ALL SELECT 2, 'lang_keep', c1, c1 - c2, c2 FROM a
  UNION ALL SELECT 3, 'min_tokens', c2, c2 - c3, c3 FROM a
  UNION ALL SELECT 4, 'uniq_ratio', c3, c3 - c4, c4 FROM a
)
"""



# --- k-anonymity release gate -------------------------------------------

K_ANON = 10
PRICE_BAND = 20_000  # generalization width for the o_totalprice QI


def q_k_anonymize(spark, sf_dir):
    """k-anonymity release gate over the orders table: generalize the
    quasi-identifiers (totalprice → fixed bands, orderdate → year),
    then suppress every equivalence class smaller than k=10 — the
    aggregation-side privacy control that complements doc_redact's
    value-side PII masking. Output is the class table with counts and
    the released flag (suppressed classes stay visible to the auditor,
    their members are what a release pipeline would drop).

    One map-side-combining groupBy on the generalized QIs — the class
    table is bounded by the generalization grid, not the row count."""
    from pyspark.sql import functions as F

    from ..sources import load_table

    orders = load_table(spark, "orders", sf_dir)
    cls = orders.groupBy(
        F.floor(F.col("o_totalprice") / PRICE_BAND).cast("bigint").alias("price_band"),
        F.year("o_orderdate").alias("order_year"),
        F.col("o_orderpriority").alias("priority"),
    ).agg(F.count("*").alias("n"))
    return cls.select(
        "price_band",
        "order_year",
        "priority",
        "n",
        (F.col("n") >= K_ANON).alias("released"),
    )


ORACLE_K_ANONYMIZE = f"""
SELECT CAST(floor(o_totalprice / {PRICE_BAND}) AS BIGINT) AS price_band,
       CAST(year(o_orderdate) AS BIGINT) AS order_year,
       o_orderpriority AS priority,
       count(*) AS n,
       count(*) >= {K_ANON} AS released
FROM orders
GROUP BY 1, 2, 3
"""


# --- join-key skew diagnostics ------------------------------------------

SKEW_TOP_N = 20


def q_key_skew_stats(spark, sf_dir):
    """Join-key distribution diagnostics for lineitem.l_orderkey — the
    measurement you run BEFORE choosing a skew mitigation (salting /
    AQE skew join): the top-20 heaviest keys with each key's share of
    the table and the cumulative share, plus the rows-per-key mean in
    every row for context. Two map-side-combining aggregations + one
    window over the top slice — diagnostics cost never scales with
    key cardinality beyond the count pass."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..sources import load_table

    li = load_table(spark, "lineitem", sf_dir)
    per_key = li.groupBy("l_orderkey").agg(F.count("*").alias("n"))
    totals = per_key.agg(
        F.sum("n").alias("total_rows"),
        F.count("*").alias("n_keys"),
    )
    # orderBy+limit compiles to TakeOrdered (per-partition partial
    # top-N, then a merge of N-row heads) — never a global sort of
    # the key table; the rank window then runs over only the N rows.
    topn = per_key.orderBy(F.desc("n"), "l_orderkey").limit(SKEW_TOP_N)
    w = Window.orderBy(F.desc("n"), "l_orderkey")
    top = topn.withColumn("rk", F.row_number().over(w).cast("bigint"))
    cum = Window.orderBy("rk").rowsBetween(Window.unboundedPreceding, 0)
    return top.crossJoin(F.broadcast(totals)).select(
        "rk",
        F.col("l_orderkey").alias("key"),
        "n",
        F.round(F.col("n") / F.col("total_rows"), 6).alias("share"),
        F.round(F.sum(F.col("n") / F.col("total_rows")).over(cum), 6).alias(
            "cum_share"
        ),
        F.round(F.col("total_rows") / F.col("n_keys"), 6).alias("mean_rows_per_key"),
    )


ORACLE_KEY_SKEW_STATS = f"""
WITH per_key AS (
  SELECT l_orderkey, count(*) AS n FROM lineitem GROUP BY l_orderkey
),
totals AS (
  SELECT CAST(sum(n) AS BIGINT) AS total_rows, count(*) AS n_keys FROM per_key
),
top AS (
  SELECT * FROM (
    SELECT l_orderkey, n,
           row_number() OVER (ORDER BY n DESC, l_orderkey) AS rk
    FROM per_key
  ) WHERE rk <= {SKEW_TOP_N}
)
SELECT rk, l_orderkey AS key, n,
       ROUND(CAST(n AS DOUBLE) / total_rows, 6) AS share,
       ROUND(SUM(CAST(n AS DOUBLE) / total_rows)
               OVER (ORDER BY rk ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
         AS cum_share,
       ROUND(CAST(total_rows AS DOUBLE) / n_keys, 6) AS mean_rows_per_key
FROM top CROSS JOIN totals
"""


SPECS = [
    QuerySpec("dq_orders", q_dq_orders, ORACLE_DQ_ORDERS,
              "declarative data-quality rule report (7 rules + FK)"),
    QuerySpec("profile_orders", q_profile_orders, ORACLE_PROFILE_ORDERS,
              "single-pass column profiling (nulls/distinct/min/max)"),
    QuerySpec("dq_benford", q_dq_benford, ORACLE_DQ_BENFORD,
              "Benford leading-digit distribution screening"),
    # round 4 rotation into the driver window:
    QuerySpec("unit_k_anonymize", q_k_anonymize, ORACLE_K_ANONYMIZE,
              "k-anonymity release gate: QI generalization + class suppression"),
]


UNIT_SPECS = [
    QuerySpec("unit_quality_funnel", q_quality_funnel, _oracle_quality_funnel(),
              "C4-style corpus filter funnel with per-stage drop counts"),
    QuerySpec("unit_key_skew_stats", q_key_skew_stats, ORACLE_KEY_SKEW_STATS,
              "join-key skew diagnostics: top-N heavy keys + shares"),
]
