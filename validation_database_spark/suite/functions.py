"""Scalar/collection function coverage: correlated-subquery
semantics, map construction/extraction, array higher-order functions,
math functions — the general-purpose expression surface a user
migrating onto this engine expects (SURVEY.md §2.7 gap list)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from . import QuerySpec


# --- correlated subquery ----------------------------------------------

def q_orders_above_cust_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders priced above their customer's average. The correlated
    scalar subquery decorrelates to a window average over the
    customer partition — one shuffle, no per-row subquery execution;
    the oracle states it as the correlated form."""
    orders = load_table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_custkey")
    avg_exact = (
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double")
        / F.count("*").over(w)
    )
    return (
        orders.withColumn("cust_avg", F.round(avg_exact, 6))
        .filter(F.col("o_totalprice") > F.col("cust_avg"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "cust_avg")
    )


ORACLE_ORDERS_ABOVE_CUST_AVG = """
SELECT o_orderkey, o_custkey, o_totalprice,
       ROUND(
         (SELECT CAST(SUM(CAST(i.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
          FROM orders i WHERE i.o_custkey = o.o_custkey), 6) AS cust_avg
FROM orders o
WHERE o_totalprice > ROUND(
         (SELECT CAST(SUM(CAST(i.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
          FROM orders i WHERE i.o_custkey = o.o_custkey), 6)
"""


# --- map functions -----------------------------------------------------

def q_map_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user map<event_type, count> built with map_from_entries,
    consumed with element_at/map_keys. The map is internal — outputs
    are extracted scalars (map serialization order is not portable)."""
    ev = load_table(spark, "events", sf_dir)
    per_type = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    as_map = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "n"))
        ).alias("counts")
    )
    return as_map.select(
        "user_id",
        F.coalesce(F.element_at("counts", "click"), F.lit(0)).alias("n_click"),
        F.coalesce(F.element_at("counts", "purchase"), F.lit(0)).alias("n_purchase"),
        F.size(F.map_keys(F.col("counts"))).cast("bigint").alias("n_types"),
    )


ORACLE_MAP_EVENT_COUNTS = """
SELECT user_id,
       coalesce(count(*) FILTER (event_type = 'click'), 0) AS n_click,
       coalesce(count(*) FILTER (event_type = 'purchase'), 0) AS n_purchase,
       count(DISTINCT event_type) AS n_types
FROM events GROUP BY user_id
"""


# --- array higher-order functions -------------------------------------

def q_array_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array surface over embeddings: slice, reverse, sort, min/max,
    filter/transform/aggregate — all JVM higher-order expressions."""
    emb = load_table(spark, "embeddings", sf_dir)
    arr = F.col("embedding")
    dbl = F.transform(arr, lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.size(arr).cast("bigint").alias("dim"),
        F.round(F.array_max(dbl), 6).alias("v_max"),
        F.round(F.array_min(dbl), 6).alias("v_min"),
        F.round(F.get(F.sort_array(dbl), 0), 6).alias("sorted_first"),
        F.round(F.get(F.reverse(F.slice(dbl, 1, 4)), 0), 6).alias("fourth"),
        F.size(F.filter(dbl, lambda x: x > 0)).cast("bigint").alias("n_positive"),
        F.round(
            F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + F.abs(x)), 6
        ).alias("l1_norm"),
    )


ORACLE_ARRAY_STATS = """
WITH t AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS d FROM embeddings)
SELECT vec_id,
       len(d) AS dim,
       ROUND(list_max(d), 6) AS v_max,
       ROUND(list_min(d), 6) AS v_min,
       ROUND(list_sort(d)[1], 6) AS sorted_first,
       ROUND(list_reverse(d[1:4])[1], 6) AS fourth,
       len(list_filter(d, x -> x > 0)) AS n_positive,
       ROUND(list_aggregate(list_transform(d, x -> abs(x)), 'sum'), 6) AS l1_norm
FROM t
"""


# --- math functions ----------------------------------------------------

def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar math over part prices: sqrt/ln/exp/pow/abs/sign/
    floor/ceil/mod — rounded to absorb any last-ulp libm divergence
    between the JVM and DuckDB."""
    part = load_table(spark, "part", sf_dir)
    p = F.col("p_retailprice")
    return part.select(
        "p_partkey",
        F.round(F.sqrt(p), 6).alias("sqrt_price"),
        F.round(F.log(p), 6).alias("ln_price"),
        F.round(F.pow(p, F.lit(0.25)), 6).alias("price_4th_root"),
        F.round(F.exp(p / 1000.0), 6).alias("exp_scaled"),
        F.abs(F.col("p_size") - 25).cast("bigint").alias("size_dev"),
        F.signum(F.col("p_size") - 25).cast("double").alias("size_sign"),
        F.floor(p).cast("bigint").alias("price_floor"),
        F.ceil(p).cast("bigint").alias("price_ceil"),
        (F.col("p_partkey") % 7).cast("bigint").alias("key_mod7"),
    )


ORACLE_MATH_FUNCS = """
SELECT p_partkey,
       ROUND(sqrt(p_retailprice), 6) AS sqrt_price,
       ROUND(ln(p_retailprice), 6) AS ln_price,
       ROUND(pow(p_retailprice, 0.25), 6) AS price_4th_root,
       ROUND(exp(p_retailprice / 1000.0), 6) AS exp_scaled,
       CAST(abs(p_size - 25) AS BIGINT) AS size_dev,
       CAST(sign(p_size - 25) AS DOUBLE) AS size_sign,
       CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
       CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
       p_partkey % 7 AS key_mod7
FROM part
"""


# --- string functions --------------------------------------------------

def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String surface: case, trim/pad, substring, replace, split,
    position, translate, repeat-free deterministic transforms."""
    cust = load_table(spark, "customer", sf_dir)
    name = F.col("c_name")
    return cust.select(
        "c_custkey",
        F.upper(name).alias("upper_name"),
        F.length(name).cast("bigint").alias("name_len"),
        F.substring(name, 1, 8).alias("prefix8"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_key"),
        F.regexp_replace(name, "[0-9]", "#").alias("masked"),
        F.instr(name, "#").cast("bigint").alias("hash_pos"),
        F.translate(name, "ACE", "ace").alias("translated"),
        F.reverse(name).alias("reversed"),
        F.concat_ws("-", F.lit("cust"), F.col("c_mktsegment")).alias("tagged"),
    )


ORACLE_STRING_FUNCS = """
SELECT c_custkey,
       upper(c_name) AS upper_name,
       length(c_name) AS name_len,
       substring(c_name, 1, 8) AS prefix8,
       lpad(CAST(c_custkey AS STRING), 10, '0') AS padded_key,
       regexp_replace(c_name, '[0-9]', '#', 'g') AS masked,
       CAST(strpos(c_name, '#') AS BIGINT) AS hash_pos,
       translate(c_name, 'ACE', 'ace') AS translated,
       reverse(c_name) AS reversed,
       concat_ws('-', 'cust', c_mktsegment) AS tagged
FROM customer
"""



# --- window-function showcase -----------------------------------------

def q_window_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking/analytic window surface in one partitioned
    window: rank, dense_rank, percent_rank, cume_dist, ntile, lag,
    lead, first/last value. Total ordering (price, orderkey) makes
    every function deterministic."""
    orders = load_table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.lag("o_orderkey", 1).over(w).alias("prev_key"),
        F.lead("o_orderkey", 1).over(w).alias("next_key"),
        F.first("o_orderkey").over(wf).alias("top_key"),
        F.last("o_orderkey").over(wf).alias("bottom_key"),
    )


ORACLE_WINDOW_FUNCTIONS = """
SELECT o_custkey, o_orderkey,
       rank() OVER w AS rnk,
       dense_rank() OVER w AS drnk,
       ROUND(percent_rank() OVER w, 6) AS pct_rank,
       ROUND(cume_dist() OVER w, 6) AS cume,
       ntile(4) OVER w AS quartile,
       lag(o_orderkey, 1) OVER w AS prev_key,
       lead(o_orderkey, 1) OVER w AS next_key,
       first_value(o_orderkey) OVER wf AS top_key,
       last_value(o_orderkey) OVER wf AS bottom_key
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey),
       wf AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


# --- datetime-function showcase ---------------------------------------

def q_datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar surface: extraction, arithmetic, boundaries. Spark's
    dayofweek is 1=Sunday; the oracle maps DuckDB's 0=Sunday
    convention to match."""
    orders = load_table(spark, "orders", sf_dir)
    d = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.year(d).cast("bigint").alias("yr"),
        F.quarter(d).cast("bigint").alias("qtr"),
        F.month(d).cast("bigint").alias("mon"),
        F.dayofmonth(d).cast("bigint").alias("dom"),
        F.dayofweek(d).cast("bigint").alias("dow_sun1"),
        F.weekofyear(d).cast("bigint").alias("iso_week"),
        # timestamp-typed (not DATE) outputs: pandas/driver
        # canonicalization of DATE differs between engines
        F.last_day(d).cast("timestamp").alias("month_end"),
        F.add_months(d.cast("date"), 3).cast("timestamp").alias("plus_3mo"),
        F.date_add(d.cast("date"), 90).cast("timestamp").alias("plus_90d"),
        F.datediff(F.lit("1998-12-31").cast("date"), d.cast("date"))
        .cast("bigint")
        .alias("days_to_eoy98"),
    )


ORACLE_DATETIME_FUNCTIONS = """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS BIGINT) AS yr,
       CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
       CAST(month(o_orderdate) AS BIGINT) AS mon,
       CAST(day(o_orderdate) AS BIGINT) AS dom,
       CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow_sun1,
       CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS TIMESTAMP) AS plus_3mo,
       CAST(CAST(o_orderdate AS DATE) + 90 AS TIMESTAMP) AS plus_90d,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS BIGINT)
         AS days_to_eoy98
FROM orders
"""


# --- consolidated showcases (driver-window economy) --------------------

def q_scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scalar expression surface (math + string) in one projection
    over ``part`` — one scan, every function value-checked."""
    part = load_table(spark, "part", sf_dir)
    p = F.col("p_retailprice")
    name = F.col("p_name")
    return part.select(
        "p_partkey",
        # math
        F.round(F.sqrt(p), 6).alias("sqrt_price"),
        F.round(F.log(p), 6).alias("ln_price"),
        F.round(F.pow(p, F.lit(0.25)), 6).alias("price_4th_root"),
        F.round(F.exp(p / 1000.0), 6).alias("exp_scaled"),
        F.abs(F.col("p_size") - 25).cast("bigint").alias("size_dev"),
        F.signum(F.col("p_size") - 25).cast("double").alias("size_sign"),
        F.floor(p).cast("bigint").alias("price_floor"),
        F.ceil(p).cast("bigint").alias("price_ceil"),
        (F.col("p_partkey") % 7).cast("bigint").alias("key_mod7"),
        # string
        F.upper(name).alias("upper_name"),
        F.length(name).cast("bigint").alias("name_len"),
        F.substring(name, 1, 8).alias("prefix8"),
        F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("padded_key"),
        F.regexp_replace(name, "[0-9]", "#").alias("masked"),
        F.instr(name, "#").cast("bigint").alias("hash_pos"),
        F.translate(name, "ACE", "ace").alias("translated"),
        F.reverse(name).alias("reversed"),
        F.concat_ws("-", F.lit("part"), F.col("p_brand")).alias("tagged"),
    )


ORACLE_SCALAR_FUNCS = """
SELECT p_partkey,
       ROUND(sqrt(p_retailprice), 6) AS sqrt_price,
       ROUND(ln(p_retailprice), 6) AS ln_price,
       ROUND(pow(p_retailprice, 0.25), 6) AS price_4th_root,
       ROUND(exp(p_retailprice / 1000.0), 6) AS exp_scaled,
       CAST(abs(p_size - 25) AS BIGINT) AS size_dev,
       CAST(sign(p_size - 25) AS DOUBLE) AS size_sign,
       CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
       CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
       p_partkey % 7 AS key_mod7,
       upper(p_name) AS upper_name,
       length(p_name) AS name_len,
       substring(p_name, 1, 8) AS prefix8,
       lpad(CAST(p_partkey AS STRING), 10, '0') AS padded_key,
       regexp_replace(p_name, '[0-9]', '#', 'g') AS masked,
       CAST(strpos(p_name, '#') AS BIGINT) AS hash_pos,
       translate(p_name, 'ACE', 'ace') AS translated,
       reverse(p_name) AS reversed,
       concat_ws('-', 'part', p_brand) AS tagged
FROM part
"""


def q_window_calendar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ranking/analytic window surface, the calendar surface, the
    running-total window, and the correlated-subquery decorrelation in
    one projection over ``orders`` — all per-row over the same scan,
    ONE shuffle on o_custkey feeding three window frames (price-
    ordered ranking, date-ordered running sum, whole-partition
    average). ``rnk``/``above_cust_avg`` materialize the top-K-per-
    group and orders-above-customer-average predicates (filtering on
    them is the trivial last step — the values are what's checked)."""
    orders = load_table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    wd = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wp = Window.partitionBy("o_custkey")
    cust_avg = F.round(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(wp).cast("double")
        / F.count("*").over(wp),
        6,
    )
    d = F.col("o_orderdate")
    # Window columns FIRST, calendar columns in a SECOND projection
    # ABOVE the window (round 12): built as one projection, Catalyst
    # collapsed the calendar expressions below the o_custkey exchange,
    # so the shuffle carried all 15 derived columns (9.7 MB at sf0.1)
    # instead of the 4 scan columns (~2.4 MB) the windows actually
    # need — per-row derivations belong after the exchange, where
    # they cost the same CPU but zero shuffle bytes. Values and
    # column order are unchanged.
    windowed = orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(wd)
        .cast("double")
        .alias("running_total"),
        cust_avg.alias("cust_avg"),
        (F.col("o_totalprice") > cust_avg).alias("above_cust_avg"),
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.lag("o_orderkey", 1).over(w).alias("prev_key"),
        F.lead("o_orderkey", 1).over(w).alias("next_key"),
        F.first("o_orderkey").over(wf).alias("top_key"),
        F.last("o_orderkey").over(wf).alias("bottom_key"),
    )
    return windowed.select(
        "o_custkey",
        "o_orderkey",
        "running_total",
        "cust_avg",
        "above_cust_avg",
        "rnk",
        "drnk",
        "pct_rank",
        "cume",
        "quartile",
        "prev_key",
        "next_key",
        "top_key",
        "bottom_key",
        F.year(d).cast("bigint").alias("yr"),
        F.quarter(d).cast("bigint").alias("qtr"),
        F.month(d).cast("bigint").alias("mon"),
        F.dayofmonth(d).cast("bigint").alias("dom"),
        F.dayofweek(d).cast("bigint").alias("dow_sun1"),
        F.weekofyear(d).cast("bigint").alias("iso_week"),
        F.last_day(d).cast("timestamp").alias("month_end"),
        F.add_months(d.cast("date"), 3).cast("timestamp").alias("plus_3mo"),
        F.date_add(d.cast("date"), 90).cast("timestamp").alias("plus_90d"),
        F.datediff(F.lit("1998-12-31").cast("date"), d.cast("date"))
        .cast("bigint")
        .alias("days_to_eoy98"),
    )


ORACLE_WINDOW_CALENDAR_FUNCS = """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER wp AS DOUBLE)
             / (COUNT(*) OVER wp), 6) AS cust_avg,
       (o_totalprice > ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER wp AS DOUBLE)
             / (COUNT(*) OVER wp), 6)) AS above_cust_avg,
       rank() OVER w AS rnk,
       dense_rank() OVER w AS drnk,
       ROUND(percent_rank() OVER w, 6) AS pct_rank,
       ROUND(cume_dist() OVER w, 6) AS cume,
       ntile(4) OVER w AS quartile,
       lag(o_orderkey, 1) OVER w AS prev_key,
       lead(o_orderkey, 1) OVER w AS next_key,
       first_value(o_orderkey) OVER wf AS top_key,
       last_value(o_orderkey) OVER wf AS bottom_key,
       CAST(year(o_orderdate) AS BIGINT) AS yr,
       CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
       CAST(month(o_orderdate) AS BIGINT) AS mon,
       CAST(day(o_orderdate) AS BIGINT) AS dom,
       CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow_sun1,
       CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS TIMESTAMP) AS plus_3mo,
       CAST(CAST(o_orderdate AS DATE) + 90 AS TIMESTAMP) AS plus_90d,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS BIGINT)
         AS days_to_eoy98
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey),
       wf AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
       wp AS (PARTITION BY o_custkey)
"""


SPECS = []


# Unit operator surface: the function showcases consolidated into
# scalar_funcs / window_calendar_funcs / events_user_stats, which in
# round 4 were themselves rotated out of the 50-entry driver window
# (driver-green r1-r3) to make room for previously unit-only
# operators. Parity-tested locally so the per-function docs stay
# executable.
UNIT_SPECS = [
    # rotated out of the driver window in round 4 (driver-green r1-r3):
    QuerySpec("array_stats", q_array_stats, ORACLE_ARRAY_STATS,
              "array slice/sort/reverse/filter/aggregate"),
    QuerySpec("scalar_funcs", q_scalar_funcs, ORACLE_SCALAR_FUNCS,
              "math + string scalar surface in one projection"),
    QuerySpec("window_calendar_funcs", q_window_calendar_funcs,
              ORACLE_WINDOW_CALENDAR_FUNCS,
              "ranking/running/decorrelated windows + calendar in one pass",
              headline=True),
    QuerySpec("unit_orders_above_cust_avg", q_orders_above_cust_avg,
              ORACLE_ORDERS_ABOVE_CUST_AVG, "decorrelated scalar subquery"),
    QuerySpec("unit_map_event_counts", q_map_event_counts,
              ORACLE_MAP_EVENT_COUNTS, "map<event_type,count> build/consume"),
    QuerySpec("unit_math_funcs", q_math_funcs, ORACLE_MATH_FUNCS,
              "math scalar function showcase"),
    QuerySpec("unit_string_funcs", q_string_funcs, ORACLE_STRING_FUNCS,
              "string scalar function showcase"),
    QuerySpec("unit_window_functions", q_window_functions,
              ORACLE_WINDOW_FUNCTIONS, "ranking/running window showcase"),
    QuerySpec("unit_datetime_functions", q_datetime_functions,
              ORACLE_DATETIME_FUNCTIONS, "calendar function showcase"),
]
