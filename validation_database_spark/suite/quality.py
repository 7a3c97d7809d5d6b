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


# --- pre-join cardinality / fan-out audit -------------------------------

def q_join_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-join diagnostic for lineitem ⋈ orders on the order key: key
    overlap (matched / left-only / right-only), per-side max fan-out,
    and the EXACT join output cardinality Σ |L(k)|·|R(k)| — computed
    from per-key COUNT aggregates, never by running the join. This is
    the guardrail you run before an expensive production join: a fan-
    out explosion or an unexpected m:n shows up here as one cheap row
    (complements `unit_key_skew_stats`, which ranks the heavy keys).

    Scale: two map-side-combining per-key counts (shuffle is
    O(distinct keys), not rows), one full-outer merge on the key, one
    final scalar aggregate. All integer arithmetic."""
    li = (
        load_table(spark, "lineitem", sf_dir)
        .groupBy(F.col("l_orderkey").alias("k"))
        .agg(F.count("*").alias("lc"))
    )
    od = (
        load_table(spark, "orders", sf_dir)
        .groupBy(F.col("o_orderkey").alias("k"))
        .agg(F.count("*").alias("rc"))
    )
    both = li.join(od, "k", "full_outer")
    return both.agg(
        F.sum(F.when(F.col("lc").isNotNull() & F.col("rc").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("matched_keys"),
        F.sum(F.when(F.col("rc").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("left_only_keys"),
        F.sum(F.when(F.col("lc").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("right_only_keys"),
        F.max(F.coalesce("lc", F.lit(0))).cast("bigint").alias("max_fanout_left"),
        F.max(F.coalesce("rc", F.lit(0))).cast("bigint").alias("max_fanout_right"),
        F.sum(
            F.coalesce("lc", F.lit(0)) * F.coalesce("rc", F.lit(0))
        )
        .cast("bigint")
        .alias("est_output_rows"),
    )


ORACLE_JOIN_AUDIT = """
WITH li AS (SELECT l_orderkey AS k, count(*) AS lc FROM lineitem GROUP BY 1),
od AS (SELECT o_orderkey AS k, count(*) AS rc FROM orders GROUP BY 1),
b AS (SELECT li.k AS lk, od.k AS rk, lc, rc
      FROM li FULL OUTER JOIN od ON li.k = od.k)
SELECT CAST(sum(CASE WHEN lc IS NOT NULL AND rc IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS matched_keys,
       CAST(sum(CASE WHEN rc IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS left_only_keys,
       CAST(sum(CASE WHEN lc IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS right_only_keys,
       CAST(max(COALESCE(lc, 0)) AS BIGINT) AS max_fanout_left,
       CAST(max(COALESCE(rc, 0)) AS BIGINT) AS max_fanout_right,
       CAST(sum(COALESCE(lc, 0) * COALESCE(rc, 0)) AS BIGINT) AS est_output_rows
FROM b
"""


# --- HyperLogLog distinct-count sketch ---------------------------------

HLL_M = 64          # registers (p = 6 index bits)
HLL_RHO_MAX = 55    # rho for w = 0 (w has 54 usable bits, max rho 54)
# alpha_64 * m^2 * 2^RHO_MAX, folded to one double literal in Python so
# the Spark and DuckDB estimates are ONE identical IEEE division each
# (the S-sum below is exact integer arithmetic in both engines).
# alpha_64 = 0.709 (Flajolet et al. 2007, HyperLogLog, Table 1).
_HLL_C = 0.709 * float(HLL_M * HLL_M) * 2.0 ** HLL_RHO_MAX


def hll_registers(df: DataFrame) -> DataFrame:
    """(priority, j, m): HLL register table of a (priority, k) frame —
    max trailing-zero rank per md5-derived register. Partial register
    tables over disjoint slices merge by elementwise max, which is
    also what Spark's partial aggregation does with this very plan
    (mergeability pinned by tests/test_hll_properties.py)."""
    h = F.conv(F.substring(F.md5(F.col("k")), 1, 15), 16, 10).cast("bigint")
    base = df.select("priority", h.alias("h"))
    w = F.expr(f"h DIV {HLL_M}")
    jw = base.select(
        "priority",
        (F.col("h") % HLL_M).alias("j"),
        F.when(w == 0, F.lit(HLL_RHO_MAX))
        .otherwise(F.bit_count(w.bitwiseAND(-w) - 1) + 1)
        .cast("int")
        .alias("rho"),
    )
    return jw.groupBy("priority", "j").agg(F.max("rho").alias("m"))


def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-count estimation (Flajolet, Fusy,
    Gandouet & Meunier 2007) with a DETERMINISTIC md5 hash family —
    like the CMS sketch (suite/text.py), the DuckDB oracle rebuilds
    the identical 64-register sketch, so the comparison is hash-exact
    where ``approx_count_distinct`` (Spark's own HLL++) could only get
    a rows-only check.

    Per value: h = first 60 bits of md5; register j = h mod 64; rho =
    trailing-zero rank of w = h div 64 (``bit_count((w & -w) - 1) + 1``
    — pure integer, no log2 float). Registers keep max rho. The
    estimate sums S = Σ 2^(RHO_MAX - M[j]) as an EXACT bigint (≤ 2^61)
    and applies one double division alpha·m²·2^RHO_MAX / S. The
    small-range linear-counting branch is reported as the
    ``lc_applicable`` flag rather than a value: its ``ln`` is the one
    op whose last ulp may differ across engines (the exact failure
    mode ADVICE r3 flagged on BM25), and the fixture group sizes
    (≥300 distinct per priority at sf0.001) keep the branch dead.

    Scale: this IS the 100 TB distinct-count shape — the sketch is a
    map-side-combining groupBy to 64 rows per group regardless of
    input size, partial sketches merge by elementwise max (exactly
    what partial aggregation does), and the exact-count column exists
    only as the fixture-scale accuracy audit."""
    orders = load_table(spark, "orders", sf_dir)
    regs = hll_registers(
        orders.select(
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderkey").cast("string").alias("k"),
        )
    )
    grid = (
        orders.select(F.col("o_orderpriority").alias("priority"))
        .distinct()
        .select("priority", F.explode(F.sequence(F.lit(0), F.lit(HLL_M - 1))).alias("j"))
    )
    full = grid.join(regs, ["priority", "j"], "left").select(
        "priority", "j", F.coalesce("m", F.lit(0)).alias("m")
    )
    sketch = full.groupBy("priority").agg(
        F.sum(
            # shiftleft() the SQL function takes a column shift amount;
            # the classic-API F.shiftleft only takes a Python int.
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_RHO_MAX} - m)")
        ).alias("sketch_sum"),
        F.sum(F.when(F.col("m") == 0, 1).otherwise(0)).cast("bigint").alias("v_zero"),
    )
    exact = orders.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count_distinct("o_orderkey").alias("n_exact")
    )
    est = F.round(F.lit(_HLL_C) / F.col("sketch_sum").cast("double"), 2)
    return (
        sketch.join(exact, "priority")
        .select(
            "priority",
            "n_exact",
            "sketch_sum",
            "v_zero",
            est.alias("hll_est"),
            ((est <= 2.5 * HLL_M) & (F.col("v_zero") > 0)).alias("lc_applicable"),
        )
    )


ORACLE_HLL_DISTINCT = f"""
WITH base AS (
  SELECT o_orderpriority AS priority,
         CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15)) AS BIGINT) AS h
  FROM orders
),
jw AS (
  SELECT priority, h % {HLL_M} AS j,
         CASE WHEN h // {HLL_M} = 0 THEN {HLL_RHO_MAX}
              ELSE CAST(bit_count(CAST(((h // {HLL_M}) & (-(h // {HLL_M}))) - 1
                                       AS BIGINT)) AS INTEGER) + 1
         END AS rho
  FROM base
),
regs AS (SELECT priority, j, max(rho) AS m FROM jw GROUP BY priority, j),
grid AS (
  SELECT DISTINCT priority, gs.j
  FROM base, generate_series(0, {HLL_M - 1}) AS gs(j)
),
filled AS (
  SELECT grid.priority, grid.j, COALESCE(m, 0) AS m
  FROM grid LEFT JOIN regs ON grid.priority = regs.priority AND grid.j = regs.j
),
sk AS (
  SELECT priority,
         CAST(sum(CAST(1 AS BIGINT) << ({HLL_RHO_MAX} - m)) AS BIGINT) AS sketch_sum,
         CAST(sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_zero
  FROM filled GROUP BY priority
),
ex AS (
  SELECT o_orderpriority AS priority, count(DISTINCT o_orderkey) AS n_exact
  FROM orders GROUP BY o_orderpriority
)
SELECT sk.priority AS priority, n_exact, sketch_sum, v_zero,
       ROUND({_HLL_C!r} / CAST(sketch_sum AS DOUBLE), 2) AS hll_est,
       (ROUND({_HLL_C!r} / CAST(sketch_sum AS DOUBLE), 2) <= {2.5 * HLL_M}
        AND v_zero > 0) AS lc_applicable
FROM sk JOIN ex ON sk.priority = ex.priority
"""


# --- HLL join-key overlap estimation ------------------------------------

HLL_YEAR_A = 1997
HLL_YEAR_B = 1998


def q_hll_join_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-join key-overlap ESTIMATION from mergeable HLL sketches —
    the sketch-cost sibling of ``unit_join_audit`` (which computes the
    same overlap exactly from per-key aggregates). Sides are the
    customer keys active in 1997 vs 1998; each side
    folds to a 64-register HLL (same deterministic md5 family as
    ``unit_hll_distinct``), the union sketch is the elementwise max of
    the two register tables (the HLL union law — exact, not an
    approximation of the union), and the intersection estimate is
    inclusion–exclusion est_a + est_b − est_union. Exact counts ride
    along as the fixture-scale accuracy audit.

    Why it matters at 100 TB: join planning (broadcast vs shuffle vs
    prune-first) wants |keys(A) ∩ keys(B)| BEFORE executing the join,
    and each side here reduces map-side to 64 rows regardless of input
    size — no shuffle of either fact table, and sketches built once
    per table serve every pairwise overlap question. All register
    sums are exact bigints; each estimate is ONE shared-literal IEEE
    division (rounded to 2), and inclusion–exclusion combines the
    already-rounded estimates so both engines do the identical
    float ops in the identical order."""
    orders = load_table(spark, "orders", sf_dir)
    yr = F.year("o_orderdate")
    both = orders.filter(yr.isin(HLL_YEAR_A, HLL_YEAR_B)).select(
        F.when(yr == HLL_YEAR_A, "a").otherwise("b").alias("priority"),
        F.col("o_custkey").cast("string").alias("k"),
    )
    regs = hll_registers(both)
    union_regs = regs.groupBy("j").agg(F.max("m").alias("m")).select(
        F.lit("u").alias("priority"), "j", "m"
    )
    grid = (
        spark.range(1)
        .select(
            F.explode(
                F.array(F.lit("a"), F.lit("b"), F.lit("u"))
            ).alias("priority")
        )
        .select(
            "priority",
            F.explode(F.sequence(F.lit(0), F.lit(HLL_M - 1))).alias("j"),
        )
    )
    full = grid.join(
        regs.unionByName(union_regs), ["priority", "j"], "left"
    ).select("priority", F.coalesce("m", F.lit(0)).alias("m"))
    sums = full.groupBy("priority").agg(
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_RHO_MAX} - m)")
        ).alias("s")
    )
    one = sums.agg(
        F.sum(F.when(F.col("priority") == "a", F.col("s"))).alias("s_a"),
        F.sum(F.when(F.col("priority") == "b", F.col("s"))).alias("s_b"),
        F.sum(F.when(F.col("priority") == "u", F.col("s"))).alias("s_u"),
    )
    est = lambda c: F.round(F.lit(_HLL_C) / F.col(c).cast("double"), 2)  # noqa: E731
    ests = one.select(
        est("s_a").alias("est_a"),
        est("s_b").alias("est_b"),
        est("s_u").alias("est_union"),
    ).withColumn(
        "est_inter",
        F.round(F.col("est_a") + F.col("est_b") - F.col("est_union"), 2),
    )
    flags = orders.filter(yr.isin(HLL_YEAR_A, HLL_YEAR_B)).groupBy(
        "o_custkey"
    ).agg(
        F.max((yr == HLL_YEAR_A).cast("int")).alias("in_a"),
        F.max((yr == HLL_YEAR_B).cast("int")).alias("in_b"),
    )
    exact = flags.agg(
        F.sum("in_a").cast("bigint").alias("exact_a"),
        F.sum("in_b").cast("bigint").alias("exact_b"),
        F.count("*").cast("bigint").alias("exact_union"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("bigint").alias("exact_inter"),
    )
    return ests.crossJoin(F.broadcast(exact))


ORACLE_HLL_JOIN_OVERLAP = f"""
WITH base AS (
  SELECT CASE WHEN year(o_orderdate) = {HLL_YEAR_A} THEN 'a' ELSE 'b' END
           AS side,
         CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))
              AS BIGINT) AS h
  FROM orders
  WHERE year(o_orderdate) IN ({HLL_YEAR_A}, {HLL_YEAR_B})
),
jw AS (
  SELECT side, h % {HLL_M} AS j,
         CASE WHEN h // {HLL_M} = 0 THEN {HLL_RHO_MAX}
              ELSE CAST(bit_count(CAST(((h // {HLL_M}) & (-(h // {HLL_M}))) - 1
                                       AS BIGINT)) AS INTEGER) + 1
         END AS rho
  FROM base
),
regs AS (SELECT side, j, max(rho) AS m FROM jw GROUP BY side, j),
all_regs AS (
  SELECT * FROM regs
  UNION ALL
  SELECT 'u' AS side, j, max(m) AS m FROM regs GROUP BY j
),
grid AS (
  SELECT s.side, gs.j
  FROM (SELECT unnest(['a', 'b', 'u']) AS side) s,
       generate_series(0, {HLL_M - 1}) AS gs(j)
),
filled AS (
  SELECT grid.side, COALESCE(m, 0) AS m
  FROM grid LEFT JOIN all_regs
    ON grid.side = all_regs.side AND grid.j = all_regs.j
),
sums AS (
  SELECT CAST(sum(CASE WHEN side = 'a'
                       THEN CAST(1 AS BIGINT) << ({HLL_RHO_MAX} - m) END)
              AS BIGINT) AS s_a,
         CAST(sum(CASE WHEN side = 'b'
                       THEN CAST(1 AS BIGINT) << ({HLL_RHO_MAX} - m) END)
              AS BIGINT) AS s_b,
         CAST(sum(CASE WHEN side = 'u'
                       THEN CAST(1 AS BIGINT) << ({HLL_RHO_MAX} - m) END)
              AS BIGINT) AS s_u
  FROM filled
),
ests AS (
  SELECT ROUND({_HLL_C!r} / CAST(s_a AS DOUBLE), 2) AS est_a,
         ROUND({_HLL_C!r} / CAST(s_b AS DOUBLE), 2) AS est_b,
         ROUND({_HLL_C!r} / CAST(s_u AS DOUBLE), 2) AS est_union
  FROM sums
),
flags AS (
  SELECT o_custkey,
         max(CASE WHEN year(o_orderdate) = {HLL_YEAR_A} THEN 1 ELSE 0 END)
           AS in_a,
         max(CASE WHEN year(o_orderdate) = {HLL_YEAR_B} THEN 1 ELSE 0 END)
           AS in_b
  FROM orders
  WHERE year(o_orderdate) IN ({HLL_YEAR_A}, {HLL_YEAR_B})
  GROUP BY o_custkey
),
exact AS (
  SELECT CAST(sum(in_a) AS BIGINT) AS exact_a,
         CAST(sum(in_b) AS BIGINT) AS exact_b,
         CAST(count(*) AS BIGINT) AS exact_union,
         CAST(sum(in_a * in_b) AS BIGINT) AS exact_inter
  FROM flags
)
SELECT est_a, est_b, est_union,
       ROUND(est_a + est_b - est_union, 2) AS est_inter,
       exact_a, exact_b, exact_union, exact_inter
FROM ests CROSS JOIN exact
"""


# --- Bloom-filter join pruning ------------------------------------------

BLOOM_M = 4096       # filter bits, packed 63 per signed-64 word
                     # (bit 63 would overflow DuckDB's checked <<)
BLOOM_K = 4          # hash probes per key
BLOOM_SEGMENT = "BUILDING"


def q_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter join pruning audit (Bloom 1970): build an m=4096-bit
    filter over the BUILDING-segment customer keys, probe every order's
    o_custkey through it, and report the pruning quality against the
    exact semi-join — bloom passes, true matches, false positives, the
    guaranteed-zero false negatives, and the fraction of the fact table
    the filter would prune before the join.

    This is the row-level pre-join filter Spark itself injects at
    runtime (``spark.sql.optimizer.runtime.bloomFilter.enabled``); the
    declarative rebuild makes the mechanism auditable and the fp-rate
    measurable. Hash family is DETERMINISTIC double hashing
    (Kirsch & Mitzenmacher 2006): h_i = (h1 + i*h2) mod m with h1/h2
    two 60-bit md5 slices — so the DuckDB oracle rebuilds the IDENTICAL
    filter and the check is hash-exact (the HLL/CMS pattern).

    Scale: the filter is a ≤64-row (word, bits) table built by one
    map-side-combining groupBy over the DIM side only, broadcast to the
    fact scan; the probe is k bit-tests per row via a broadcast join —
    the 100 TB fact table is never shuffled. The audit aggregate is the
    measurement you run before trusting the pruned plan."""
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)

    def hashed(df: DataFrame, key) -> DataFrame:
        m = F.md5(key.cast("string"))
        return df.select(
            "*",
            F.conv(F.substring(m, 1, 15), 16, 10).cast("bigint").alias("h1"),
            F.conv(F.substring(m, 17, 15), 16, 10).cast("bigint").alias("h2"),
        )

    keys = (
        cust.filter(F.col("c_mktsegment") == BLOOM_SEGMENT)
        .select(F.col("c_custkey").alias("k"))
        .distinct()
    )
    kpos = hashed(keys, F.col("k")).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(BLOOM_K - 1)),
                lambda i: (F.col("h1") + i * F.col("h2")) % BLOOM_M,
            )
        ).alias("pos")
    )
    filt = (
        kpos.select(
            F.expr("pos DIV 63").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 63 AS INT))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )
    probes = (
        hashed(orders.select(F.col("o_orderkey"), F.col("o_custkey").alias("k")), F.col("k"))
        .select(
            "o_orderkey",
            "k",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(BLOOM_K - 1)),
                    lambda i: (F.col("h1") + i * F.col("h2")) % BLOOM_M,
                )
            ).alias("pos"),
        )
        .select(
            "o_orderkey",
            "k",
            F.expr("pos DIV 63").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 63 AS INT))").alias("mask"),
        )
    )
    hits = (
        probes.join(F.broadcast(filt), "word", "left")
        .groupBy("o_orderkey", "k")
        .agg(
            F.bool_and(
                F.coalesce(F.col("bits").bitwiseAND(F.col("mask")) != 0, F.lit(False))
            ).alias("bloom_pass")
        )
    )
    mem = hits.join(
        keys.select("k", F.lit(True).alias("is_member")), "k", "left"
    ).withColumn("is_member", F.coalesce("is_member", F.lit(False)))
    n_keys = keys.agg(F.count("*").alias("n_keys"))
    bits_set = filt.agg(F.sum(F.bit_count("bits")).cast("bigint").alias("bits_set"))
    audit = mem.agg(
        F.count("*").alias("n_probed"),
        F.sum(F.col("bloom_pass").cast("bigint")).alias("n_bloom_pass"),
        F.sum(F.col("is_member").cast("bigint")).alias("n_true"),
        F.sum((F.col("bloom_pass") & ~F.col("is_member")).cast("bigint")).alias("n_false_pos"),
        F.sum((~F.col("bloom_pass") & F.col("is_member")).cast("bigint")).alias("n_false_neg"),
    )
    return (
        audit.crossJoin(F.broadcast(n_keys))
        .crossJoin(F.broadcast(bits_set))
        .select(
            F.lit(BLOOM_SEGMENT).alias("segment"),
            "n_keys",
            "bits_set",
            "n_probed",
            "n_bloom_pass",
            "n_true",
            "n_false_pos",
            "n_false_neg",
            F.round(
                F.col("n_false_pos").cast("double")
                / F.greatest(F.col("n_probed") - F.col("n_true"), F.lit(1)),
                6,
            ).alias("fp_rate"),
            F.round(
                F.lit(1.0) - F.col("n_bloom_pass").cast("double") / F.col("n_probed"), 6
            ).alias("pruned_frac"),
        )
    )


ORACLE_BLOOM_PRUNE = f"""
WITH keys AS (
  SELECT DISTINCT c_custkey AS k FROM customer WHERE c_mktsegment = '{BLOOM_SEGMENT}'
),
kh AS (
  SELECT k,
         CAST(('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 15)) AS BIGINT) AS h1,
         CAST(('0x' || substr(md5(CAST(k AS VARCHAR)), 17, 15)) AS BIGINT) AS h2
  FROM keys
),
kp AS (
  SELECT (h1 + gs.i * h2) % {BLOOM_M} AS pos
  FROM kh, generate_series(0, {BLOOM_K - 1}) AS gs(i)
),
filt AS (
  SELECT pos // 63 AS word,
         bit_or(CAST(1 AS BIGINT) << CAST(pos % 63 AS INTEGER)) AS bits
  FROM kp GROUP BY 1
),
oh AS (
  SELECT o_orderkey, o_custkey AS k,
         CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15)) AS BIGINT) AS h1,
         CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 17, 15)) AS BIGINT) AS h2
  FROM orders
),
opr AS (
  SELECT o_orderkey, k,
         (h1 + gs.i * h2) % {BLOOM_M} AS pos
  FROM oh, generate_series(0, {BLOOM_K - 1}) AS gs(i)
),
hits AS (
  SELECT o_orderkey, k,
         bool_and(COALESCE(
           (f.bits & (CAST(1 AS BIGINT) << CAST(pos % 63 AS INTEGER))) != 0, FALSE))
           AS bloom_pass
  FROM opr LEFT JOIN filt f ON opr.pos // 63 = f.word
  GROUP BY 1, 2
),
mem AS (
  SELECT h.o_orderkey, h.bloom_pass, keys.k IS NOT NULL AS is_member
  FROM hits h LEFT JOIN keys ON h.k = keys.k
),
a AS (
  SELECT count(*) AS n_probed,
         CAST(sum(CASE WHEN bloom_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_pass,
         CAST(sum(CASE WHEN is_member THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
         CAST(sum(CASE WHEN bloom_pass AND NOT is_member THEN 1 ELSE 0 END) AS BIGINT)
           AS n_false_pos,
         CAST(sum(CASE WHEN NOT bloom_pass AND is_member THEN 1 ELSE 0 END) AS BIGINT)
           AS n_false_neg
  FROM mem
)
SELECT '{BLOOM_SEGMENT}' AS segment,
       (SELECT count(*) FROM keys) AS n_keys,
       (SELECT CAST(sum(bit_count(bits)) AS BIGINT) FROM filt) AS bits_set,
       n_probed, n_bloom_pass, n_true, n_false_pos, n_false_neg,
       ROUND(CAST(n_false_pos AS DOUBLE) / greatest(n_probed - n_true, 1), 6) AS fp_rate,
       ROUND(1.0 - CAST(n_bloom_pass AS DOUBLE) / n_probed, 6) AS pruned_frac
FROM a
"""


# --- distribution drift: PSI between two snapshots -----------------------

PSI_YEAR_A = 1995
PSI_YEAR_B = 1998
PSI_BAND = 50_000  # o_totalprice band width


def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between two yearly order snapshots —
    the standard ML-monitoring drift screen (PSI < 0.1 stable, > 0.25
    drifted) run over fixed price bands: psi = Σ (p_a − p_b)·ln(p_a/p_b).
    Complements `unit_ab_ztest` (mean shift) with a full-distribution
    comparison, and `dq_benford` (one snapshot vs a law) with
    snapshot-vs-snapshot.

    Determinism: bands are fixed-width (no quantile sort); shares use
    add-one smoothing over the observed band grid so empty bands stay
    finite; each band's psi term is rounded to 6 decimals and the total
    is an exact DECIMAL(18,6) sum of the rounded terms — float ln/÷ are
    written in identical textual order in both engines, and no
    order-dependent float accumulation exists anywhere.

    Scale: two map-side-combining counts into O(bands) rows, a tiny
    full-outer band merge, one broadcast of the two totals — input size
    only touches the first aggregation."""
    orders = load_table(spark, "orders", sf_dir)
    band = F.floor(F.col("o_totalprice") / PSI_BAND).cast("bigint")

    def counts(year: int, alias: str) -> DataFrame:
        return (
            orders.filter(F.year("o_orderdate") == year)
            .groupBy(band.alias("band"))
            .agg(F.count("*").alias(alias))
        )

    a = counts(PSI_YEAR_A, "n_a")
    b = counts(PSI_YEAR_B, "n_b")
    grid = a.join(b, "band", "full_outer").select(
        "band",
        F.coalesce("n_a", F.lit(0)).alias("n_a"),
        F.coalesce("n_b", F.lit(0)).alias("n_b"),
    )
    tot = grid.agg(
        F.sum("n_a").alias("tot_a"),
        F.sum("n_b").alias("tot_b"),
        F.count("*").alias("n_bands"),
    )
    w = grid.crossJoin(F.broadcast(tot))
    p_a = (F.col("n_a") + 1).cast("double") / (F.col("tot_a") + F.col("n_bands")).cast("double")
    p_b = (F.col("n_b") + 1).cast("double") / (F.col("tot_b") + F.col("n_bands")).cast("double")
    term = F.round((p_a - p_b) * F.log(p_a / p_b), 6)
    per_band = w.select(
        "band",
        "n_a",
        "n_b",
        F.round(p_a, 6).alias("p_a"),
        F.round(p_b, 6).alias("p_b"),
        term.alias("psi_term"),
    )
    total = per_band.agg(
        F.sum(F.col("psi_term").cast("decimal(18,6)")).cast("double").alias("psi_total")
    )
    return per_band.crossJoin(F.broadcast(total)).select(
        "band", "n_a", "n_b", "p_a", "p_b", "psi_term",
        "psi_total", (F.col("psi_total") > 0.25).alias("drifted"),
    )


ORACLE_PSI_DRIFT = f"""
WITH a AS (
  SELECT CAST(floor(o_totalprice / {PSI_BAND}) AS BIGINT) AS band, count(*) AS n_a
  FROM orders WHERE year(o_orderdate) = {PSI_YEAR_A} GROUP BY 1
),
b AS (
  SELECT CAST(floor(o_totalprice / {PSI_BAND}) AS BIGINT) AS band, count(*) AS n_b
  FROM orders WHERE year(o_orderdate) = {PSI_YEAR_B} GROUP BY 1
),
grid AS (
  SELECT COALESCE(a.band, b.band) AS band,
         CAST(COALESCE(n_a, 0) AS BIGINT) AS n_a,
         CAST(COALESCE(n_b, 0) AS BIGINT) AS n_b
  FROM a FULL OUTER JOIN b ON a.band = b.band
),
tot AS (
  SELECT CAST(sum(n_a) AS BIGINT) AS tot_a, CAST(sum(n_b) AS BIGINT) AS tot_b,
         count(*) AS n_bands
  FROM grid
),
per_band AS (
  SELECT band, n_a, n_b,
         ROUND(CAST(n_a + 1 AS DOUBLE) / CAST(tot_a + n_bands AS DOUBLE), 6) AS p_a,
         ROUND(CAST(n_b + 1 AS DOUBLE) / CAST(tot_b + n_bands AS DOUBLE), 6) AS p_b,
         ROUND((CAST(n_a + 1 AS DOUBLE) / CAST(tot_a + n_bands AS DOUBLE)
                - CAST(n_b + 1 AS DOUBLE) / CAST(tot_b + n_bands AS DOUBLE))
               * ln((CAST(n_a + 1 AS DOUBLE) / CAST(tot_a + n_bands AS DOUBLE))
                    / (CAST(n_b + 1 AS DOUBLE) / CAST(tot_b + n_bands AS DOUBLE))), 6)
           AS psi_term
  FROM grid CROSS JOIN tot
),
total AS (
  SELECT CAST(sum(CAST(psi_term AS DECIMAL(18,6))) AS DOUBLE) AS psi_total
  FROM per_band
)
SELECT band, n_a, n_b, p_a, p_b, psi_term, psi_total, psi_total > 0.25 AS drifted
FROM per_band CROSS JOIN total
"""


# --- data freshness / staleness check -------------------------------------

FRESH_REF = "2026-01-01 00:00:00"  # fixed audit instant (fixtures end 2024/2001)
FRESH_SLA_DAYS = {"events": 600, "orders": 9500, "lineitem": 9500}


def q_dq_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness monitor: per fact table, the age of the newest event
    time against a fixed audit instant, with an SLA flag — the
    is-the-pipeline-still-landing-data check every warehouse runs
    first. The reference instant is a config literal rather than
    ``now()`` (a non-deterministic function would make the result
    unverifiable and the alert un-replayable — the same determinism
    rule as the sampling suite's no-rand policy). The events SLA is
    deliberately tight enough to trip on the fixture (stale → false),
    proving the flag really fires.

    Three 1-row max aggregations (map-side combining; a metadata-only
    footer read in a stats-enabled lakehouse), integer day ages."""
    ev = load_table(spark, "events", sf_dir).agg(F.max("ts").alias("m"))
    od = load_table(spark, "orders", sf_dir).agg(F.max("o_orderdate").alias("m"))
    li = load_table(spark, "lineitem", sf_dir).agg(F.max("l_shipdate").alias("m"))

    def row(df, name):
        return df.select(
            F.lit(name).alias("table_name"),
            F.col("m").alias("max_event_time"),
            F.datediff(F.lit(FRESH_REF).cast("date"), F.col("m").cast("date"))
            .cast("bigint")
            .alias("age_days"),
            (
                F.datediff(F.lit(FRESH_REF).cast("date"), F.col("m").cast("date"))
                <= FRESH_SLA_DAYS[name]
            ).alias("fresh"),
        )

    return row(ev, "events").unionByName(row(od, "orders")).unionByName(
        row(li, "lineitem")
    )


ORACLE_DQ_FRESHNESS = f"""
SELECT 'events' AS table_name,
       make_timestamp(epoch_ns(max(ts)) // 1000) AS max_event_time,
       CAST(date_diff('day', CAST(make_timestamp(epoch_ns(max(ts)) // 1000) AS DATE),
                      DATE '2026-01-01') AS BIGINT) AS age_days,
       date_diff('day', CAST(make_timestamp(epoch_ns(max(ts)) // 1000) AS DATE),
                 DATE '2026-01-01') <= {FRESH_SLA_DAYS['events']} AS fresh
FROM events
UNION ALL
SELECT 'orders', max(o_orderdate),
       CAST(date_diff('day', CAST(max(o_orderdate) AS DATE), DATE '2026-01-01') AS BIGINT),
       date_diff('day', CAST(max(o_orderdate) AS DATE), DATE '2026-01-01')
         <= {FRESH_SLA_DAYS['orders']}
FROM orders
UNION ALL
SELECT 'lineitem', max(l_shipdate),
       CAST(date_diff('day', CAST(max(l_shipdate) AS DATE), DATE '2026-01-01') AS BIGINT),
       date_diff('day', CAST(max(l_shipdate) AS DATE), DATE '2026-01-01')
         <= {FRESH_SLA_DAYS['lineitem']}
FROM lineitem
"""


SPECS = [
    # Third round-6 rotation: unit_hll_distinct (green r5) yields its
    # seat; the sketch family keeps unit_hll_join_overlap below.
    # round 6 rotation: the never-driver-checked HLL join-overlap
    # estimator takes the dq_orders/dq_benford slots (driver-green
    # r2–r5; pytest oracles keep them true).
    QuerySpec("unit_hll_join_overlap", q_hll_join_overlap,
              ORACLE_HLL_JOIN_OVERLAP,
              "HLL union + inclusion-exclusion join-key overlap estimate"),
    # second round-6 rotation (never driver-checked before):
    QuerySpec("unit_dq_freshness", q_dq_freshness, ORACLE_DQ_FRESHNESS,
              "per-table freshness ages + SLA flags vs a fixed instant"),
]


UNIT_SPECS = [
    # rotated out in the third round-6 rotation (driver-green r5):
    QuerySpec("unit_hll_distinct", q_hll_distinct, ORACLE_HLL_DISTINCT,
              "HyperLogLog distinct sketch, deterministic hash-exact oracle"),
    # rotated out of the driver window in round 5 (driver-green in r4;
    # pytest oracles keep them true):
    QuerySpec("unit_psi_drift", q_psi_drift, ORACLE_PSI_DRIFT,
              "PSI distribution-drift screen between two snapshots"),
    QuerySpec("unit_bloom_prune", q_bloom_prune, ORACLE_BLOOM_PRUNE,
              "Bloom-filter join pruning audit, deterministic hash-exact filter"),
    QuerySpec("unit_k_anonymize", q_k_anonymize, ORACLE_K_ANONYMIZE,
              "k-anonymity release gate: QI generalization + class suppression"),
    # rotated out in the second round-5 rotation (driver-green r2-r4):
    QuerySpec("profile_orders", q_profile_orders, ORACLE_PROFILE_ORDERS,
              "single-pass column profiling (nulls/distinct/min/max)"),
    QuerySpec("unit_join_audit", q_join_audit, ORACLE_JOIN_AUDIT,
              "pre-join key-overlap / fan-out / cardinality audit"),
    # rotated out in round 6 (driver-green r2–r5):
    QuerySpec("dq_orders", q_dq_orders, ORACLE_DQ_ORDERS,
              "declarative data-quality rule report (7 rules + FK)"),
    QuerySpec("dq_benford", q_dq_benford, ORACLE_DQ_BENFORD,
              "Benford leading-digit distribution screening"),
    QuerySpec("unit_quality_funnel", q_quality_funnel, _oracle_quality_funnel(),
              "C4-style corpus filter funnel with per-stage drop counts"),
    QuerySpec("unit_key_skew_stats", q_key_skew_stats, ORACLE_KEY_SKEW_STATS,
              "join-key skew diagnostics: top-N heavy keys + shares"),
]
