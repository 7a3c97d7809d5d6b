"""Event-stream analytics over the ``events`` table — the batch
semantics of the streaming operators (see
``validation_database_spark.streaming`` for the Structured Streaming
versions with watermarks; these batch twins are the oracle-checkable
surface)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from . import QuerySpec

SESSION_GAP = "30"  # minutes

# Unit-safe ts canonicalization: epoch_ns(ts) // 1000 truncates
# nanosecond-vintage fixtures to Spark's microseconds and is the
# identity on microsecond-vintage ones — both engines always compare
# the same instants (see sources/registry.py::events_ts_unit).
_EV_CTE = (
    "ev AS (SELECT event_id, make_timestamp(epoch_ns(ts) // 1000) AS ts, "
    "user_id, event_type, value, props FROM events)"
)


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: per user, a new session starts when the gap
    from the previous event exceeds 30 minutes. lag + cumulative-sum
    over a per-user window — no global sort, fully parallel across
    users."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    is_new = F.when(
        F.col("prev_ts").isNull()
        | (F.col("ts") > F.col("prev_ts") + F.expr(f"INTERVAL {SESSION_GAP} MINUTES")),
        F.lit(1),
    ).otherwise(F.lit(0))
    with_sess = (
        ev.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn("is_new", is_new)
        .withColumn(
            "session_idx",
            F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    return with_sess.groupBy("user_id", "session_idx").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
    )


ORACLE_EVENTS_SESSIONIZE = f"""
WITH {_EV_CTE},
lagged AS (
  SELECT user_id, event_id, ts, value,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM ev
),
flagged AS (
  SELECT *, CASE WHEN prev_ts IS NULL
                   OR ts > prev_ts + INTERVAL {SESSION_GAP} MINUTE
                 THEN 1 ELSE 0 END AS is_new
  FROM lagged
),
sessioned AS (
  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
  FROM flagged
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       min(ts) AS session_start,
       max(ts) AS session_end,
       count(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM sessioned GROUP BY user_id, session_idx
"""


def q_events_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregation per event type (the batch
    twin of the streaming windowed aggregation)."""
    ev = load_table(spark, "events", sf_dir)
    return ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour_start"), "event_type"
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


ORACLE_EVENTS_WINDOW_AGG = f"""
WITH {_EV_CTE}
SELECT date_trunc('hour', ts) AS hour_start, event_type,
       count(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
       count(DISTINCT user_id) AS n_users
FROM ev GROUP BY 1, 2
"""


def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user funnel: first view → first click → first purchase
    timestamps (conditional min aggregation) + conversion flags."""
    ev = load_table(spark, "events", sf_dir)

    def first_ts(etype: str):
        return F.min(F.when(F.col("event_type") == etype, F.col("ts")))

    return ev.groupBy("user_id").agg(
        first_ts("view").alias("first_view"),
        first_ts("click").alias("first_click"),
        first_ts("purchase").alias("first_purchase"),
        (
            first_ts("view").isNotNull()
            & first_ts("click").isNotNull()
            & first_ts("purchase").isNotNull()
        ).alias("full_funnel"),
    )


ORACLE_EVENTS_FUNNEL = f"""
WITH {_EV_CTE}
SELECT user_id,
       min(ts) FILTER (event_type = 'view') AS first_view,
       min(ts) FILTER (event_type = 'click') AS first_click,
       min(ts) FILTER (event_type = 'purchase') AS first_purchase,
       (min(ts) FILTER (event_type = 'view') IS NOT NULL
        AND min(ts) FILTER (event_type = 'click') IS NOT NULL
        AND min(ts) FILTER (event_type = 'purchase') IS NOT NULL) AS full_funnel
FROM ev GROUP BY user_id
"""


def q_events_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event stats in one driver-checked query: the funnel
    (conditional-min first_view/click/purchase + conversion flag)
    joined with the map-function surface (per-user map<event_type,
    count> built with map_from_entries, consumed with element_at /
    map_keys). Both sides aggregate on user_id — same shuffle key, one
    user-grain join."""
    from .functions import q_map_event_counts

    funnel = q_events_funnel(spark, sf_dir)
    counts = q_map_event_counts(spark, sf_dir)
    return funnel.join(counts, "user_id")


ORACLE_EVENTS_USER_STATS = f"""
WITH {_EV_CTE}
SELECT user_id,
       min(ts) FILTER (event_type = 'view') AS first_view,
       min(ts) FILTER (event_type = 'click') AS first_click,
       min(ts) FILTER (event_type = 'purchase') AS first_purchase,
       (min(ts) FILTER (event_type = 'view') IS NOT NULL
        AND min(ts) FILTER (event_type = 'click') IS NOT NULL
        AND min(ts) FILTER (event_type = 'purchase') IS NOT NULL) AS full_funnel,
       coalesce(count(*) FILTER (event_type = 'click'), 0) AS n_click,
       coalesce(count(*) FILTER (event_type = 'purchase'), 0) AS n_purchase,
       count(DISTINCT event_type) AS n_types
FROM ev GROUP BY user_id
"""


def q_events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the ``props`` string column —
    get_json_object stays JVM-side (Jackson), no UDF."""
    ev = load_table(spark, "events", sf_dir)
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("prop_k"),
    )


ORACLE_EVENTS_JSON_PROPS = f"""
WITH {_EV_CTE}
SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
FROM ev
"""



def q_events_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling with forward fill: per user, a daily
    grid over the event span, each grid point carrying the last
    observed value at-or-before it. Encoded as grid ∪ events + one
    last_value(IGNORE NULLS) window per user — no per-gap joins, one
    shuffle on user_id."""
    ev = load_table(spark, "events", sf_dir).select("user_id", "event_id", "ts", "value")
    span = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("t0"),
        F.date_trunc("day", F.max("ts")).alias("t1"),
    )
    grid = span.select(
        "user_id",
        F.explode(
            F.sequence(F.col("t0"), F.col("t1"), F.expr("INTERVAL 1 DAY"))
        ).alias("ts"),
    ).select(
        "user_id",
        "ts",
        F.lit(None).cast("bigint").alias("event_id"),
        F.lit(None).cast("double").alias("value"),
        F.lit(1).alias("is_grid"),
    )
    tagged = ev.withColumn("is_grid", F.lit(0)).unionByName(grid)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_grid", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = tagged.withColumn(
        "ffill_value", F.last("value", ignorenulls=True).over(w)
    )
    return filled.filter(F.col("is_grid") == 1).select(
        "user_id",
        F.col("ts").alias("grid_ts"),
        F.round(F.coalesce("ffill_value", F.lit(0.0)), 2).alias("ffill_value"),
    )


ORACLE_EVENTS_RESAMPLE = f"""
WITH {{ev}},
span AS (
  SELECT user_id, date_trunc('day', min(ts)) AS t0, date_trunc('day', max(ts)) AS t1
  FROM ev GROUP BY user_id
),
grid AS (
  SELECT user_id, unnest(generate_series(t0, t1, INTERVAL 1 DAY)) AS ts,
         CAST(NULL AS BIGINT) AS event_id, CAST(NULL AS DOUBLE) AS value, 1 AS is_grid
  FROM span
),
tagged AS (
  SELECT user_id, ts, event_id, value, 0 AS is_grid FROM ev
  UNION ALL SELECT user_id, ts, event_id, value, is_grid FROM grid
),
filled AS (
  SELECT user_id, ts, is_grid,
         last_value(value IGNORE NULLS) OVER (
           PARTITION BY user_id
           ORDER BY ts ASC, is_grid ASC, event_id ASC NULLS FIRST
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ffill_value
  FROM tagged
)
SELECT user_id, ts AS grid_ts, ROUND(coalesce(ffill_value, 0.0), 2) AS ffill_value
FROM filled WHERE is_grid = 1
""".format(ev=_EV_CTE.replace("props FROM events", "props FROM events"))



def q_events_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event enrichment: z-score outlier detection (value vs the
    event-type mean, flagged at |z| > 2.5) plus JSON prop extraction
    (get_json_object stays JVM-side — Jackson, no UDF). Moments are
    accumulated as exact integer cents, so mean/std (population) and
    the z-scores are bit-deterministic across engines; the anomaly
    flag on the rounded z is identical row labeling on both."""
    ev = load_table(spark, "events", sf_dir)
    y = F.round(F.col("value") * 100).cast("bigint")  # cents
    stats = (
        ev.select("event_type", y.alias("y"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("y").alias("sy"),
            F.sum(F.col("y") * F.col("y")).alias("syy"),
        )
        .select(
            "event_type",
            "n",
            (F.col("sy").cast("double") / F.col("n")).alias("mean_cents"),
            (
                F.sqrt(
                    (
                        F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
                    ).cast("double")
                )
                / F.col("n")
            ).alias("std_cents"),
        )
    )
    scored = ev.join(F.broadcast(stats), "event_type").select(
        "event_id",
        "event_type",
        "value",
        F.get_json_object("props", "$.k").cast("bigint").alias("prop_k"),
        F.round(
            (F.round(F.col("value") * 100).cast("bigint") - F.col("mean_cents"))
            / F.col("std_cents"),
            4,
        ).alias("z"),
    )
    return scored.withColumn("is_anomaly", F.abs(F.col("z")) > 2.5)


ORACLE_EVENTS_ANOMALIES = f"""
WITH {{ev}},
m AS (
  SELECT event_type, count(*) AS n, sum(y) AS sy, sum(y * y) AS syy
  FROM (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS y FROM ev)
  GROUP BY event_type
),
stats AS (
  SELECT event_type,
         CAST(sy AS DOUBLE) / n AS mean_cents,
         sqrt(CAST(n * syy - sy * sy AS DOUBLE)) / n AS std_cents
  FROM m
)
SELECT event_id, e.event_type, value,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k,
       ROUND((CAST(round(value * 100) AS BIGINT) - mean_cents) / std_cents, 4) AS z,
       abs(ROUND((CAST(round(value * 100) AS BIGINT) - mean_cents) / std_cents, 4)) > 2.5
         AS is_anomaly
FROM ev e JOIN stats USING (event_type)
""".format(ev=_EV_CTE)


# --- top-K behavioral paths ---------------------------------------------

PATH_TOP_K = 10


def q_events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most frequent 3-step event-type paths across users (the
    behavioral-sequence mining behind funnel discovery): two lead()
    windows per user build the sliding trigram of event types, one
    map-side-combining count, one top-K window over the tiny distinct-
    path table. Path space is |event_types|³ — bounded regardless of
    corpus size."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tri = (
        ev.select(
            "user_id",
            "event_type",
            F.lead("event_type", 1).over(w).alias("e2"),
            F.lead("event_type", 2).over(w).alias("e3"),
        )
        .filter(F.col("e3").isNotNull())
        .select(
            F.concat_ws(">", "event_type", "e2", "e3").alias("path")
        )
    )
    counts = tri.groupBy("path").agg(F.count("*").alias("n"))
    rk_w = Window.orderBy(F.desc("n"), "path")
    return (
        counts.withColumn("rk", F.row_number().over(rk_w).cast("bigint"))
        .filter(F.col("rk") <= PATH_TOP_K)
        .select("rk", "path", "n")
    )


ORACLE_EVENTS_TOP_PATHS = f"""
WITH {_EV_CTE},
tri AS (
  SELECT event_type || '>' || e2 || '>' || e3 AS path FROM (
    SELECT event_type,
           lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e2,
           lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e3
    FROM ev
  ) WHERE e3 IS NOT NULL
),
counts AS (SELECT path, count(*) AS n FROM tri GROUP BY path)
SELECT rk, path, n FROM (
  SELECT *, row_number() OVER (ORDER BY n DESC, path) AS rk FROM counts
) WHERE rk <= {PATH_TOP_K}
"""


# --- per-user EWMA (sequential recurrence) ------------------------------

EWMA_ALPHA = 0.25  # exactly representable: recurrence constants exact


def q_ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA of the event value over time — the sequential
    recurrence no window aggregate can fold, run as the time-step-
    vectorized mapInPandas kernel (operators/timeseries.py). Every
    produced value is bitwise s_t = α·x_t + (1−α)·s_{t−1}, so the
    DuckDB recursive-CTE replay matches exactly; output rounded to 6
    only at the edge."""
    from ..operators.timeseries import ewma

    ev = load_table(spark, "events", sf_dir).select(
        "user_id", "event_id", "ts", "value"
    )
    r = ewma(ev, ["user_id"], ["ts", "event_id"], "value", EWMA_ALPHA)
    # Explicit half-away rounding: the dyadic α makes exact .xxxxxx5
    # ties reachable, where the engines' ROUND dialects differ; this
    # spelling is the same IEEE ops on both (embed_quantize pattern).
    s = F.col("ewma")
    rounded = F.signum(s) * F.floor(F.abs(s) * 1_000_000 + F.lit(0.5)) / 1_000_000
    return r.select("user_id", "event_id", rounded.alias("ewma"))


ORACLE_EWMA = f"""
WITH RECURSIVE {_EV_CTE},
o AS (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM ev
),
r AS (
  SELECT user_id, event_id, rn, CAST(value AS DOUBLE) AS s FROM o WHERE rn = 1
  UNION ALL
  SELECT o.user_id, o.event_id, o.rn,
         {EWMA_ALPHA} * o.value + {1.0 - EWMA_ALPHA} * r.s AS s
  FROM r JOIN o ON o.user_id = r.user_id AND o.rn = r.rn + 1
)
SELECT user_id, event_id,
       sign(s) * floor(abs(s) * 1000000 + 0.5) / 1000000 AS ewma
FROM r
"""


SPECS = [
    # round 5 rotations into the driver window are appended after
    # their definitions (see the SPECS += block next to UNIT_SPECS).
]


# Unit operator surface (merged into events_anomalies' prop_k column
# for the driver window); parity-tested locally.
def q_funnel_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRICT-ORDER funnel mining: stage N counts only if it happens
    AFTER the user's stage N-1 time (first view → first click after
    that view → first purchase after that click). The unordered
    variant (:func:`q_events_funnel`, folded into ``events_user_stats``)
    over-counts users whose click predates their first view; this is
    the semantics product analytics actually wants (cf. windowed
    funnels in stream processors, e.g. Flink's CEP ordered-pattern
    matching — public API semantics only).

    Plan: three conditional-min aggregations, each a hash shuffle on
    ``user_id``; the stage joins are all on that same key, so AQE
    coalesces them into co-partitioned exchanges — no broadcast
    needed and no window over the full event stream. Scale: per-stage
    state is one row per user (not per event); the event scan is
    filtered to the stage's type before the shuffle, so each stage
    shuffles only its own event class."""
    ev = load_table(spark, "events", sf_dir).select("user_id", "event_type", "ts")
    t1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    t2 = (
        ev.filter(F.col("event_type") == "click")
        .join(t1, "user_id")
        .filter(F.col("ts") > F.col("first_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click"))
    )
    t3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(t2, "user_id")
        .filter(F.col("ts") > F.col("first_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    return (
        t1.join(t2, "user_id", "left")
        .join(t3, "user_id", "left")
        .select(
            "user_id",
            "first_view",
            "first_click",
            "first_purchase",
            (
                F.lit(1)
                + F.when(F.col("first_click").isNotNull(), 1).otherwise(0)
                + F.when(F.col("first_purchase").isNotNull(), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("stage_reached"),
        )
    )


ORACLE_FUNNEL_STRICT = f"""
WITH {_EV_CTE},
v AS (SELECT user_id, min(ts) AS first_view FROM ev
      WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT e.user_id, min(e.ts) AS first_click
      FROM ev e JOIN v USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > v.first_view
      GROUP BY e.user_id),
p AS (SELECT e.user_id, min(e.ts) AS first_purchase
      FROM ev e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > c.first_click
      GROUP BY e.user_id)
SELECT v.user_id AS user_id, first_view, first_click, first_purchase,
       CAST(1 + (CASE WHEN first_click IS NOT NULL THEN 1 ELSE 0 END)
              + (CASE WHEN first_purchase IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS stage_reached
FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
"""


def q_feature_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user lag / rolling feature engineering — the standard
    training-feature shape over an event log: previous value, delta,
    inter-event gap, and a trailing 3-event mean. Ordering is the
    total order (ts, event_id) so ties are deterministic; the gap uses
    ``timestampdiff`` (TZ-free on NTZ timestamps); the rolling mean is
    summed in EXACT integer cents and divided once (module
    float-determinism pattern), so both engines emit identical bits.

    Scale: everything is per-user windows over one hash shuffle of the
    event log — the feature table is the same size as the input, no
    global sort, no driver collect; at 100 TB this partitions by
    user_id exactly like the sessionizer."""
    ev = load_table(spark, "events", sf_dir).select(
        "user_id", "event_id", "ts", "value"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w3 = w.rowsBetween(-2, Window.currentRow)
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    prev_ts = F.lag("ts").over(w)
    prev_value = F.lag("value").over(w)
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        prev_value.alias("prev_value"),
        F.round(F.col("value") - prev_value, 6).alias("delta"),
        F.expr("timestampdiff(SECOND, lag(ts) OVER "
               "(PARTITION BY user_id ORDER BY ts, event_id), ts)")
        .cast("bigint")
        .alias("gap_seconds"),
        F.round(
            F.sum(cents).over(w3).cast("double")
            / (F.count("*").over(w3) * F.lit(100.0)),
            6,
        ).alias("roll3_mean"),
        F.count("*").over(w3).cast("bigint").alias("roll3_n"),
    )


ORACLE_FEATURE_LAGS = f"""
WITH {_EV_CTE}
SELECT user_id, event_id, ts, value,
       lag(value) OVER w AS prev_value,
       ROUND(value - lag(value) OVER w, 6) AS delta,
       -- date_sub = COMPLETE elapsed seconds (matches Spark's
       -- timestampdiff); date_diff would count boundary CROSSINGS.
       CAST(date_sub('second', lag(ts) OVER w, ts) AS BIGINT) AS gap_seconds,
       ROUND(CAST(CAST(sum(CAST(ROUND(value * 100) AS BIGINT)) OVER w3 AS BIGINT)
                  AS DOUBLE)
             / (count(*) OVER w3 * 100.0), 6) AS roll3_mean,
       CAST(count(*) OVER w3 AS BIGINT) AS roll3_n
FROM ev
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
       w3 AS (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
"""


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention — the standard product-analytics
    matrix: users are cohorted by the ISO week of their first
    ``signup`` event; each later week of ANY activity marks them
    retained at ``weeks_since`` = (activity_week − cohort_week)/7
    (both weeks are Mondays via ``date_trunc``, so the division is
    exact). Output: (cohort_week, weeks_since, n_active, cohort_size,
    retention) — retention is one IEEE division of exact integers.

    Scale: two aggregations on user_id (signup min + distinct
    activity weeks, both map-side combining), one join on user_id,
    then a groupBy whose result is bounded by weeks² — the matrix is
    tiny no matter the event volume."""
    ev = load_table(spark, "events", sf_dir).select("user_id", "event_type", "ts")
    # weeks stay TIMESTAMP: the fixtures store dates as timestamps and
    # pandas folds DuckDB DATE into Timestamp anyway — a cast-to-date
    # on one side only would render asymmetrically in the comparator.
    week = lambda c: F.date_trunc("week", c)  # noqa: E731
    signup = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(week(F.col("ts"))).alias("cohort_week"))
    )
    activity = ev.select("user_id", week(F.col("ts")).alias("act_week")).distinct()
    joined = activity.join(signup, "user_id").filter(
        F.col("act_week") >= F.col("cohort_week")
    )
    ret = joined.groupBy(
        "cohort_week",
        (F.datediff("act_week", "cohort_week") / 7).cast("bigint").alias("weeks_since"),
    ).agg(F.count_distinct("user_id").alias("n_active"))
    size = signup.groupBy("cohort_week").agg(F.count("*").alias("cohort_size"))
    return ret.join(size, "cohort_week").select(
        "cohort_week",
        "weeks_since",
        "n_active",
        "cohort_size",
        F.round(
            F.col("n_active").cast("double") / F.col("cohort_size"), 6
        ).alias("retention"),
    )


ORACLE_COHORT_RETENTION = f"""
WITH {_EV_CTE},
signup AS (
  SELECT user_id, min(date_trunc('week', ts)) AS cohort_week
  FROM ev WHERE event_type = 'signup' GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS act_week FROM ev
),
ret AS (
  SELECT cohort_week,
         CAST(date_diff('day', cohort_week, act_week) // 7 AS BIGINT) AS weeks_since,
         count(DISTINCT a.user_id) AS n_active
  FROM activity a JOIN signup s ON a.user_id = s.user_id
  WHERE act_week >= cohort_week
  GROUP BY 1, 2
),
sz AS (SELECT cohort_week, count(*) AS cohort_size FROM signup GROUP BY 1)
SELECT ret.cohort_week AS cohort_week, weeks_since, n_active, cohort_size,
       ROUND(CAST(n_active AS DOUBLE) / cohort_size, 6) AS retention
FROM ret JOIN sz ON ret.cohort_week = sz.cohort_week
"""


# --- robust (median/MAD) outlier detection -------------------------------

MAD_K = 0.6745      # Φ⁻¹(0.75): scales MAD to σ under normality
MAD_CUT = 3.5       # Iglewicz–Hoaglin modified-z threshold


def q_mad_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per event type: modified z-score
    0.6745·(x − median)/MAD flagged at |z| > 3.5 (Iglewicz & Hoaglin
    1993) — the heavy-tail-safe sibling of `events_anomalies`' mean/σ
    z-score, whose moments a single extreme value can drag.

    Exact order statistics, no approx-percentile — and computed as
    value HISTOGRAMS, not rank windows: the median is the smallest
    value whose cumulative count reaches ⌈n/2⌉ over the per-type
    distinct-value histogram (map-side-combining groupBy, fully
    parallel at any type cardinality — the rank-window form serializes
    each type into one sort task, the low-cardinality ceiling SCALE.md
    measures), and the MAD repeats the same trick on the |x − median|
    histogram. Identical elements to the (value, event_id) rank pick —
    the rank-r value depends only on the value multiset — so the
    oracle stays the rank formulation and the check stays hash-exact.
    Only the final shared-shape scale/divide is float, rounded to 6."""
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "event_type", "value"
    )

    def hist_pick(df, col, out):
        """Smallest `col` whose cumulative count reaches ⌈n/2⌉."""
        h = df.groupBy("event_type", col).agg(F.count("*").alias("n"))
        wv = Window.partitionBy("event_type").orderBy(col)
        c = h.withColumn(
            "cum", F.sum("n").over(wv.rowsBetween(Window.unboundedPreceding, 0))
        ).withColumn("total", F.sum("n").over(Window.partitionBy("event_type")))
        return (
            c.filter(F.col("cum") >= F.expr("(total + 1) DIV 2"))
            .groupBy("event_type")
            .agg(F.min(col).alias(out))
        )

    med = hist_pick(ev, "value", "med")
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = hist_pick(dev, "adev", "mad")
    z = F.round(
        F.lit(MAD_K) * (F.col("value") - F.col("med")) / F.nullif("mad", F.lit(0.0)), 6
    )
    return (
        ev.join(F.broadcast(med), "event_type")
        .join(F.broadcast(mad), "event_type")
        .select(
            "event_id",
            "event_type",
            "value",
            F.round("med", 6).alias("median_value"),
            F.round("mad", 6).alias("mad"),
            z.alias("robust_z"),
            (F.abs(z) > MAD_CUT).alias("is_outlier"),
        )
    )


ORACLE_MAD_ANOMALIES = f"""
WITH ev AS (SELECT event_id, event_type, value FROM events),
rk1 AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rk,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM ev
),
med AS (
  SELECT event_type, value AS med FROM rk1 WHERE rk = (n + 1) // 2
),
dev AS (
  SELECT ev.event_id, ev.event_type, ev.value, med,
         abs(ev.value - med) AS adev
  FROM ev JOIN med USING (event_type)
),
rk2 AS (
  SELECT event_type, adev,
         row_number() OVER (PARTITION BY event_type ORDER BY adev, event_id) AS rk,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM dev
),
mad AS (
  SELECT event_type, adev AS mad FROM rk2 WHERE rk = (n + 1) // 2
)
SELECT event_id, d.event_type AS event_type, value,
       ROUND(med, 6) AS median_value,
       ROUND(mad, 6) AS mad,
       ROUND({MAD_K} * (value - med) / nullif(mad, 0.0), 6) AS robust_z,
       abs(ROUND({MAD_K} * (value - med) / nullif(mad, 0.0), 6)) > {MAD_CUT}
         AS is_outlier
FROM dev d JOIN mad USING (event_type)
"""


# --- hourly error-rate alert ------------------------------------------------

ERR_ALERT_RATE = 0.3  # alert when errors exceed 30% of an hour's events


def q_error_rate_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly error-rate monitor with an alert flag: per hour, total
    events, error events, the rate, and whether it crosses the 30%
    alert line — the pager query, batch-shaped (its streaming twin is
    the windowed-count family in `streaming/validation.py`). One
    map-side-combining hour rollup; exact counts; one rounded
    division compared against a literal."""
    ev = load_table(spark, "events", sf_dir)
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("hour")).agg(
        F.count("*").alias("n_events"),
        F.sum((F.col("event_type") == "error").cast("bigint")).alias("n_errors"),
    )
    rate = F.round(F.col("n_errors").cast("double") / F.col("n_events"), 6)
    return hourly.select(
        "hour", "n_events", "n_errors",
        rate.alias("error_rate"),
        (rate > ERR_ALERT_RATE).alias("alert"),
    )


ORACLE_ERROR_RATE_HOURLY = f"""
WITH {{EV}}
SELECT date_trunc('hour', ts) AS hour,
       count(*) AS n_events,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_errors,
       ROUND(CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS error_rate,
       ROUND(CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) > {ERR_ALERT_RATE} AS alert
FROM ev GROUP BY 1
"""


# --- new vs returning users per day -----------------------------------------

def q_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day split of active users into NEW (first-ever active day)
    and RETURNING — the acquisition-vs-retention decomposition every
    growth dashboard leads with, and the daily-grain companion of
    `unit_cohort_retention`. First-day table is one per-user min; the
    split is an equality test on the (user, day) activity table. The
    first-day join is left UNHINTED: it is a USER-dimension frame, so
    AQE broadcasts it while it fits and shuffle-joins on user_id when
    the user base outgrows the threshold (both sides already hash the
    same key). Exact counts; the new-share ratio is the one rounded
    division."""
    ev = load_table(spark, "events", sf_dir).select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    )
    ud = ev.distinct()
    first = ud.groupBy("user_id").agg(F.min("day").alias("first_day"))
    tagged = ud.join(first, "user_id").withColumn(
        "is_new", F.col("day") == F.col("first_day")
    )
    return (
        tagged.groupBy("day")
        .agg(
            F.sum(F.col("is_new").cast("bigint")).alias("new_users"),
            F.sum((~F.col("is_new")).cast("bigint")).alias("returning_users"),
        )
        .select(
            "day",
            "new_users",
            "returning_users",
            F.round(
                F.col("new_users").cast("double")
                / (F.col("new_users") + F.col("returning_users")),
                6,
            ).alias("new_share"),
        )
    )


ORACLE_NEW_VS_RETURNING = f"""
WITH {{EV}},
ud AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM ev),
first AS (SELECT user_id, min(day) AS first_day FROM ud GROUP BY user_id)
SELECT day,
       CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT) AS new_users,
       CAST(sum(CASE WHEN day <> first_day THEN 1 ELSE 0 END) AS BIGINT)
         AS returning_users,
       ROUND(CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS new_share
FROM ud JOIN first USING (user_id)
GROUP BY day
"""


# --- per-user active time (interval union) ----------------------------------

def q_active_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total ACTIVE time per user: the union length of their session
    intervals in exact microseconds — the billable-usage / engagement-
    depth number, where summing raw session durations double-counts
    any overlap. Per-user sessions from the gap sessionizer cannot
    overlap by construction, so the merge step is provably a no-op
    here — the operator still runs the full interval-UNION algebra
    (sort by start per user, running max of ends, island merge) so it
    stays correct for interval sources that DO overlap (device × user
    sessions, ad exposure windows). The islands window is per-user —
    fully parallel, the sweep-line's partitionable sibling."""
    from pyspark.sql import Window

    sess = q_events_sessionize(spark, sf_dir).select(
        "user_id", "session_start", "session_end"
    )
    w = Window.partitionBy("user_id").orderBy("session_start", "session_end")
    run_end = F.max("session_end").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    isl = sess.withColumn("prev_end", run_end).withColumn(
        "brk",
        F.when(
            F.col("prev_end").isNull() | (F.col("session_start") > F.col("prev_end")),
            1,
        ).otherwise(0),
    ).withColumn(
        "island", F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    merged = isl.groupBy("user_id", "island").agg(
        F.min("session_start").alias("s"), F.max("session_end").alias("e")
    )
    return merged.groupBy("user_id").agg(
        F.count("*").alias("n_spans"),
        F.sum(F.expr("timestampdiff(MICROSECOND, s, e)")).alias("active_us"),
    )


def _oracle_active_time() -> str:
    return f"""
WITH sessions AS ({{SESS}}),
isl AS (
  SELECT user_id, session_start, session_end,
         SUM(CASE WHEN prev_end IS NULL OR session_start > prev_end
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY session_start, session_end
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM (
    SELECT user_id, session_start, session_end,
           max(session_end) OVER (PARTITION BY user_id
                                  ORDER BY session_start, session_end
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS prev_end
    FROM sessions
  )
),
merged AS (
  SELECT user_id, island, min(session_start) AS s, max(session_end) AS e
  FROM isl GROUP BY user_id, island
)
SELECT user_id, count(*) AS n_spans,
       CAST(sum(epoch_us(e) - epoch_us(s)) AS BIGINT) AS active_us
FROM merged GROUP BY user_id
"""


# --- DAU / WAU engagement curve --------------------------------------------

def q_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The product engagement dashboard: daily active users, trailing
    7-day active users, and stickiness (DAU/WAU) per day. WAU is the
    distinct-user count over a trailing window — NOT a sum of DAUs
    (users active on several days must count once), so the plan joins
    each day to its trailing 7 calendar days at (user, day) grain and
    re-distincts: day-grain tables throughout (the (user, day)
    activity table is the only event-scan product), never a
    distinct-over-range window, which Spark cannot express and a
    micro-batch recompute would get wrong.

    Exact counts; stickiness is the one rounded division."""
    ev = load_table(spark, "events", sf_dir).select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    )
    ud = ev.distinct()
    dau = ud.groupBy("day").agg(F.count("*").alias("dau"))
    days = dau.select("day")
    trail = days.alias("d").join(
        ud.alias("a"),
        (F.col("a.day") <= F.col("d.day"))
        & (F.col("a.day") > F.col("d.day") - F.expr("INTERVAL 7 DAYS")),
    )
    wau = (
        trail.select(F.col("d.day").alias("day"), "a.user_id")
        .distinct()
        .groupBy("day")
        .agg(F.count("*").alias("wau"))
    )
    return dau.join(wau, "day").select(
        "day",
        "dau",
        "wau",
        F.round(F.col("dau").cast("double") / F.col("wau"), 6).alias("stickiness"),
    )


ORACLE_DAU_WAU = f"""
WITH {{EV}},
ud AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM ev),
dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY day),
wau AS (
  SELECT d.day, count(DISTINCT a.user_id) AS wau
  FROM (SELECT day FROM dau) d
  JOIN ud a ON a.day <= d.day AND a.day > d.day - INTERVAL 7 DAY
  GROUP BY d.day
)
SELECT dau.day AS day, dau, wau,
       ROUND(CAST(dau AS DOUBLE) / wau, 6) AS stickiness
FROM dau JOIN wau ON dau.day = wau.day
"""


# --- sliding-window distinct via HLL register merge ----------------------

def q_hll_sliding_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct users per day from MERGED daily HLL
    sketches — the at-scale approximate twin of ``q_dau_wau``'s exact
    WAU, and the op that demonstrates WHY sketches earn their keep:
    the sliding distinct needs no re-distinct over the trailing
    window, just an elementwise register max across the 7 daily
    64-register sketches (the HLL union law — exact, the estimate's
    error doesn't compound across merges). Two properties do the
    heavy lifting at 100 TB: (1) the daily register build needs NO
    dedup — duplicate (day, user) rows hash identically and fold into
    the same max — so the event scan goes straight into a map-side-
    combining (day, j) aggregation; (2) each day is 64 rows
    thereafter, so the calendar self-join costs days × 7 × 64 rows no
    matter how many events exist. Exact WAU rides along as the
    fixture-scale accuracy audit (same shape as unit_hll_distinct).
    Hash family and estimate arithmetic identical to
    ``suite/quality.py``'s sketch — register sums exact bigints, one
    shared-literal IEEE division per day."""
    from .quality import _HLL_C, HLL_M, HLL_RHO_MAX, hll_registers

    ev = load_table(spark, "events", sf_dir).select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    )
    # the ONE register builder (same hash family, same rho arithmetic
    # as unit_hll_distinct / unit_hll_join_overlap — by construction,
    # not by parallel maintenance): day plays the builder's group key
    daily = hll_registers(
        ev.select(
            F.col("day").alias("priority"),
            F.col("user_id").cast("string").alias("k"),
        )
    ).select(F.col("priority").alias("day"), "j", "m")
    days = daily.select("day").distinct()
    trail = (
        days.alias("d")
        .join(
            daily.alias("r"),
            (F.col("r.day") <= F.col("d.day"))
            & (F.col("r.day") > F.col("d.day") - F.expr("INTERVAL 7 DAYS")),
        )
        .groupBy(F.col("d.day").alias("day"), F.col("r.j").alias("j"))
        .agg(F.max("r.m").alias("m"))
    )
    grid = days.select(
        "day", F.explode(F.sequence(F.lit(0), F.lit(HLL_M - 1))).alias("j")
    )
    full = grid.join(trail, ["day", "j"], "left").select(
        "day", F.coalesce("m", F.lit(0)).alias("m")
    )
    sketch = full.groupBy("day").agg(
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_RHO_MAX} - m)")
        ).alias("s")
    )
    ud = ev.distinct()
    exact = (
        days.alias("d")
        .join(
            ud.alias("a"),
            (F.col("a.day") <= F.col("d.day"))
            & (F.col("a.day") > F.col("d.day") - F.expr("INTERVAL 7 DAYS")),
        )
        .select(F.col("d.day").alias("day"), "a.user_id")
        .distinct()
        .groupBy("day")
        .agg(F.count("*").alias("wau_exact"))
    )
    est = F.round(F.lit(_HLL_C) / F.col("s").cast("double"), 2)
    return sketch.join(exact, "day").select(
        "day", "wau_exact", est.alias("wau_est")
    )


def _oracle_hll_sliding_wau() -> str:
    from .quality import _HLL_C, HLL_M, HLL_RHO_MAX

    return f"""
WITH {{EV}},
base AS (
  SELECT date_trunc('day', ts) AS day,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
  FROM ev
),
jw AS (
  SELECT day, h % {HLL_M} AS j,
         CASE WHEN h // {HLL_M} = 0 THEN {HLL_RHO_MAX}
              ELSE CAST(bit_count(CAST(((h // {HLL_M}) & (-(h // {HLL_M}))) - 1
                                       AS BIGINT)) AS INTEGER) + 1
         END AS rho
  FROM base
),
daily AS (SELECT day, j, max(rho) AS m FROM jw GROUP BY day, j),
days AS (SELECT DISTINCT day FROM daily),
trail AS (
  SELECT d.day AS day, r.j, max(r.m) AS m
  FROM days d JOIN daily r
    ON r.day <= d.day AND r.day > d.day - INTERVAL 7 DAY
  GROUP BY d.day, r.j
),
grid AS (
  SELECT days.day, gs.j FROM days, generate_series(0, {HLL_M - 1}) AS gs(j)
),
sk AS (
  SELECT grid.day,
         CAST(sum(CAST(1 AS BIGINT) << ({HLL_RHO_MAX} - COALESCE(m, 0)))
              AS BIGINT) AS s
  FROM grid LEFT JOIN trail
    ON grid.day = trail.day AND grid.j = trail.j
  GROUP BY grid.day
),
ud AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM ev),
exact AS (
  SELECT d.day AS day, count(DISTINCT a.user_id) AS wau_exact
  FROM days d JOIN ud a
    ON a.day <= d.day AND a.day > d.day - INTERVAL 7 DAY
  GROUP BY d.day
)
SELECT sk.day AS day, wau_exact,
       ROUND({_HLL_C!r} / CAST(s AS DOUBLE), 2) AS wau_est
FROM sk JOIN exact ON sk.day = exact.day
"""


# --- backfill planner: missing hourly partitions ----------------------------

def q_backfill_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backfill work-order generation: per event type, the hour slots
    of the corpus span with NO data, merged into contiguous ranges —
    the output a scheduler feeds to re-ingestion jobs (one row = one
    backfill task with its hour span), and the detector behind "the
    error stream went dark for 6 hours on Tuesday".

    Grid ∪ anti-join ∪ islands: the expected (type, hour) grid comes
    from one sequence explode over the global span (a broadcast 1-row
    bound), observed slots anti-join it away, and consecutive missing
    hours merge via the gaps-and-islands window (the ExactSubstr /
    sweep-line machinery on the calendar axis). Bounded by the
    calendar × |types|, not the event count."""
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir).select(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    )
    bounds = ev.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    types = ev.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("h"),
    )
    observed = ev.distinct()
    missing = grid.join(observed, ["event_type", "h"], "left_anti")
    w = Window.partitionBy("event_type").orderBy("h")
    isl = (
        missing.withColumn("lag_h", F.lag("h").over(w))
        .withColumn(
            "brk",
            F.when(
                F.col("lag_h").isNull()
                | (F.col("h") > F.col("lag_h") + F.expr("INTERVAL 1 HOUR")),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "island", F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0))
        )
    )
    return isl.groupBy("event_type", "island").agg(
        F.min("h").alias("backfill_start"),
        F.max("h").alias("backfill_end"),
        F.count("*").alias("n_hours"),
    ).select(
        "event_type",
        F.col("island").cast("bigint").alias("gap_idx"),
        "backfill_start",
        "backfill_end",
        "n_hours",
    )


ORACLE_BACKFILL_PLAN = f"""
WITH {{EV}},
slots AS (SELECT event_type, date_trunc('hour', ts) AS h FROM ev),
bounds AS (SELECT min(h) AS h0, max(h) AS h1 FROM slots),
grid AS (
  SELECT t.event_type, g.h
  FROM (SELECT DISTINCT event_type FROM slots) t,
       (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
        FROM bounds) g
),
observed AS (SELECT DISTINCT event_type, h FROM slots),
missing AS (
  SELECT grid.event_type, grid.h FROM grid
  WHERE NOT EXISTS (SELECT 1 FROM observed o
                    WHERE o.event_type = grid.event_type AND o.h = grid.h)
),
isl AS (
  SELECT event_type, h,
         SUM(CASE WHEN lag_h IS NULL OR h > lag_h + INTERVAL 1 HOUR
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY event_type ORDER BY h
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM (
    SELECT event_type, h,
           lag(h) OVER (PARTITION BY event_type ORDER BY h) AS lag_h
    FROM missing
  )
)
SELECT event_type, CAST(island AS BIGINT) AS gap_idx,
       min(h) AS backfill_start, max(h) AS backfill_end,
       count(*) AS n_hours
FROM isl GROUP BY event_type, island
"""


# --- peak session concurrency (sweep line) ---------------------------------

def q_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day — the capacity-planning number
    (how many sessions were open AT ONCE, not per-day totals) — via
    the classic sweep line over the sessionized intervals: +1 at each
    session start, −1 at each end, a running sum in time order, then
    the per-day maximum. Ties are totally ordered (+1 before −1 at
    the same instant — a session ending exactly when another starts
    overlaps it), so both engines walk the identical sweep.

    Distributed sweep-line split: because ``date_trunc('day', ts)``
    is monotone in the sweep order, the global running sum factors
    into a per-DAY running sum (window partitioned by day — shards
    across executors, no single-partition WindowExec) plus a
    carry-in prefix of whole-day delta totals (a window over the
    #days frame — calendar-bounded at any corpus size, never
    session grain). ``peak(day) = carry_in(day) + max(local_open)``
    is an integer identity, so the result is bit-equal to the
    single-sweep oracle at any scale."""
    from pyspark.sql import Window

    sess = q_events_sessionize(spark, sf_dir).select(
        "user_id", "session_idx", "session_start", "session_end"
    )
    pts = sess.select(
        F.col("session_start").alias("ts"), F.lit(1).alias("delta"),
        "user_id", "session_idx",
    ).unionByName(
        sess.select(
            F.col("session_end").alias("ts"), F.lit(-1).alias("delta"),
            "user_id", "session_idx",
        )
    ).withColumn("day", F.date_trunc("day", "ts"))
    # per-day sharded sweep: running sum within each day partition
    w_day = Window.partitionBy("day").orderBy(
        "ts", F.desc("delta"), "user_id", "session_idx"
    ).rowsBetween(Window.unboundedPreceding, 0)
    local = pts.withColumn("local_open", F.sum("delta").over(w_day))
    per_day = local.groupBy("day").agg(
        F.max("local_open").alias("local_peak"),
        F.sum("delta").alias("day_total"),
    )
    # carry-in = open sessions at each day's start: prefix sum of the
    # PRIOR days' whole-day totals over the calendar-bounded day frame
    w_cal = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, -1
    )
    return (
        per_day.withColumn(
            "carry_in", F.coalesce(F.sum("day_total").over(w_cal), F.lit(0))
        )
        .select(
            "day",
            (F.col("carry_in") + F.col("local_peak"))
            .cast("bigint")
            .alias("peak_concurrency"),
        )
    )


def _oracle_peak_concurrency() -> str:
    return f"""
WITH sessions AS ({{SESS}}),
pts AS (
  SELECT session_start AS ts, 1 AS delta, user_id, session_idx FROM sessions
  UNION ALL
  SELECT session_end, -1, user_id, session_idx FROM sessions
),
swept AS (
  SELECT ts, SUM(delta) OVER (ORDER BY ts, delta DESC, user_id, session_idx
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS open_sessions
  FROM pts
)
SELECT date_trunc('day', ts) AS day,
       CAST(max(open_sessions) AS BIGINT) AS peak_concurrency
FROM swept GROUP BY 1
"""


# --- seasonal-naive forecast backtest --------------------------------------

SN_LAG_DAYS = 7


def q_seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-quality floor: the seasonal-naive model (predict each
    day's total value per event type with the value 7 days earlier)
    backtested over the whole corpus — per type: days evaluated, MAE
    and mean bias. Any real forecaster must beat THIS number; shipping
    the baseline as an operator makes "is the fancy model worth it"
    a query, not a notebook.

    The 7-day-back join is a calendar equi-join (day = day − 7), not a
    positional lag — robust to gaps in the daily grid. Daily totals
    are exact cents; MAE/bias are exact-integer sums with one rounded
    division each."""
    ev = load_table(spark, "events", sf_dir)
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents"))
    actual = daily.select("event_type", "day", F.col("cents").alias("a"))
    lagged = daily.select(
        "event_type",
        (F.col("day") + F.expr(f"INTERVAL {SN_LAG_DAYS} DAYS")).alias("day"),
        F.col("cents").alias("f"),
    )
    joined = actual.join(lagged, ["event_type", "day"])
    return joined.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.round(
            F.sum(F.abs(F.col("a") - F.col("f"))).cast("double") / F.count("*") / 100,
            6,
        ).alias("mae_value"),
        F.round(
            F.sum(F.col("a") - F.col("f")).cast("double") / F.count("*") / 100, 6
        ).alias("bias_value"),
    )


ORACLE_SEASONAL_NAIVE = f"""
WITH {{EV}},
daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM ev GROUP BY 1, 2
),
joined AS (
  SELECT a.event_type, a.cents AS a, f.cents AS f
  FROM daily a JOIN daily f
    ON a.event_type = f.event_type AND f.day + INTERVAL {SN_LAG_DAYS} DAY = a.day
)
SELECT event_type, count(*) AS n_days,
       ROUND(CAST(CAST(sum(abs(a - f)) AS BIGINT) AS DOUBLE) / count(*) / 100, 6)
         AS mae_value,
       ROUND(CAST(CAST(sum(a - f) AS BIGINT) AS DOUBLE) / count(*) / 100, 6)
         AS bias_value
FROM joined GROUP BY event_type
"""


# --- churn-label training table -------------------------------------------

CHURN_DAYS = 14  # inactive for the trailing window => churned


def q_churn_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Churn-model TRAINING TABLE generation: one row per user with
    the label (no activity in the corpus's trailing 14 days) and the
    leakage-safe feature set computed ONLY from events before the
    label window (activity span, event/purchase counts, exact-cents
    mean value, events per active day). The label-window cutoff comes
    from the global max event time — broadcast as a 1-row scalar, the
    only non-per-user quantity.

    This is the supervised companion of `unit_cohort_retention`
    (population-level) and `unit_feature_lags` (event-grain): the
    table a gradient-boosted churn model actually trains on. Features
    strictly predate the label window — the temporal-leakage rule a
    naive join gets wrong.

    One scan each side of the cutoff, one per-user aggregate, one
    broadcast join. Exact integers everywhere; the two ratio columns
    are shared-shape rounded divisions."""
    ev = load_table(spark, "events", sf_dir)
    cutoff = ev.agg(
        (F.max("ts") - F.expr(f"INTERVAL {CHURN_DAYS} DAYS")).alias("cutoff")
    )
    with_cut = ev.crossJoin(F.broadcast(cutoff))
    feat = (
        with_cut.filter(F.col("ts") < F.col("cutoff"))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum((F.col("event_type") == "purchase").cast("bigint")).alias("n_purchases"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("sum_cents"),
            F.countDistinct(F.date_trunc("day", "ts")).alias("active_days"),
            F.max("ts").alias("last_feat_ts"),
        )
    )
    future = (
        with_cut.filter(F.col("ts") >= F.col("cutoff"))
        .select("user_id")
        .distinct()
        .withColumn("active_in_window", F.lit(True))
    )
    return (
        feat.join(future, "user_id", "left")
        .select(
            "user_id",
            "n_events",
            "n_purchases",
            "active_days",
            F.round(F.col("sum_cents").cast("double") / F.col("n_events") / 100, 6).alias(
                "mean_value"
            ),
            F.round(
                F.col("n_events").cast("double") / F.col("active_days"), 6
            ).alias("events_per_day"),
            F.coalesce("active_in_window", F.lit(False)).alias("retained"),
            (~F.coalesce("active_in_window", F.lit(False))).alias("churned"),
        )
    )


ORACLE_CHURN_LABELS = f"""
WITH {{EV}},
cut AS (SELECT max(ts) - INTERVAL {CHURN_DAYS} DAY AS cutoff FROM ev),
feat AS (
  SELECT user_id, count(*) AS n_events,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_purchases,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
         count(DISTINCT date_trunc('day', ts)) AS active_days
  FROM ev, cut WHERE ts < cutoff GROUP BY user_id
),
fut AS (
  SELECT DISTINCT user_id FROM ev, cut WHERE ts >= cutoff
)
SELECT f.user_id, n_events, n_purchases, active_days,
       ROUND(CAST(sum_cents AS DOUBLE) / n_events / 100, 6) AS mean_value,
       ROUND(CAST(n_events AS DOUBLE) / active_days, 6) AS events_per_day,
       fut.user_id IS NOT NULL AS retained,
       fut.user_id IS NULL AS churned
FROM feat f LEFT JOIN fut ON f.user_id = fut.user_id
"""


# --- churn-feature AUC ----------------------------------------------------

CHURN_AUC_DAYS = 2  # purchase-churn label window (ANY-event churn is
                    # empty on the dense fixture — every user has some
                    # event in any trailing window; purchases are the
                    # sparse signal with both classes populated)


def q_churn_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT AUC of a churn feature — model evaluation with no
    sampling and no trapezoids, via the AUC ≡ Mann–Whitney identity:
    AUC = U/(n₊·n₋) with midrank tie handling, all computed in the
    suite's doubled-rank integer arithmetic (`unit_mannwhitney_u`'s
    machinery pointed at a classifier readout). Label = NO PURCHASE
    in the trailing 2-day window (purchase-churn — the any-event
    label is degenerate on the dense fixture); feature = pre-cutoff
    event count, strictly before the label window (the
    `unit_churn_labels` leakage rule). An AUC ≈ 0.5 says the feature
    doesn't rank churners — the one-number triage before training
    anything. (The fixture reads ≈ 0.52: synthetic activity barely
    predicts short-window purchasing, and the readout says so — the
    honest verdict is the point; the arithmetic is what's verified.)

    Exactness: the score histogram is integer (event counts), the
    rank sum and U are exact bigints, and the single division is
    shared-shape rounded 6. Scale: one per-user aggregate each side
    of the cutoff, one (score) histogram with map-side combine, one
    cumulative window over DISTINCT score values — bounded by the max
    per-user event count, a feature dimension, never the user
    count."""
    ev = load_table(spark, "events", sf_dir)
    cutoff = ev.agg(
        (F.max("ts") - F.expr(f"INTERVAL {CHURN_AUC_DAYS} DAYS")).alias(
            "cutoff"
        )
    )
    with_cut = ev.crossJoin(F.broadcast(cutoff))
    feat = (
        with_cut.filter(F.col("ts") < F.col("cutoff"))
        .groupBy("user_id")
        .agg(F.count("*").cast("bigint").alias("n_events"))
    )
    future = (
        with_cut.filter(
            (F.col("ts") >= F.col("cutoff"))
            & (F.col("event_type") == "purchase")
        )
        .select("user_id")
        .distinct()
        .withColumn("purchased", F.lit(True))
    )
    tbl = feat.join(future, "user_id", "left").select(
        "n_events",
        (~F.coalesce("purchased", F.lit(False))).alias("churned"),
    )
    hist = tbl.groupBy("n_events").agg(
        F.sum(F.col("churned").cast("int")).cast("bigint").alias("nc"),
        F.sum((~F.col("churned")).cast("int")).cast("bigint").alias("nr"),
        F.count("*").cast("bigint").alias("nv"),
    )
    w_cb = Window.orderBy("n_events").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ranked = hist.withColumn(
        "cb", F.coalesce(F.sum("nv").over(w_cb), F.lit(0))
    )
    agg = ranked.agg(
        F.sum("nc").alias("n_churned"),
        F.sum("nr").alias("n_retained"),
        F.sum(
            F.col("nr") * (2 * F.col("cb") + F.col("nv") + 1)
        ).alias("r2"),
    )
    u2 = F.col("r2") - F.col("n_retained") * (F.col("n_retained") + 1)
    auc = u2.cast("double") / (
        F.lit(2.0) * F.col("n_retained") * F.col("n_churned")
    )
    return agg.select(
        F.col("n_churned").cast("bigint").alias("n_churned"),
        F.col("n_retained").cast("bigint").alias("n_retained"),
        u2.cast("bigint").alias("u_doubled"),
        F.round(auc, 6).alias("auc"),
    )


ORACLE_CHURN_AUC = f"""
WITH {{EV}},
cut AS (SELECT max(ts) - INTERVAL {CHURN_AUC_DAYS} DAY AS cutoff FROM ev),
feat AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
  FROM ev, cut WHERE ts < cutoff GROUP BY user_id
),
fut AS (
  SELECT DISTINCT user_id FROM ev, cut
  WHERE ts >= cutoff AND event_type = 'purchase'
),
tbl AS (
  SELECT n_events, fut.user_id IS NULL AS churned
  FROM feat LEFT JOIN fut ON feat.user_id = fut.user_id
),
hist AS (
  SELECT n_events AS s,
         CAST(sum(CASE WHEN churned THEN 1 ELSE 0 END) AS BIGINT) AS nc,
         CAST(sum(CASE WHEN churned THEN 0 ELSE 1 END) AS BIGINT) AS nr,
         CAST(count(*) AS BIGINT) AS nv
  FROM tbl GROUP BY n_events
),
ranked AS (
  SELECT *, CAST(COALESCE(SUM(nv) OVER (ORDER BY s
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         AS BIGINT) AS cb
  FROM hist
),
agg AS (
  SELECT CAST(sum(nc) AS BIGINT) AS n_churned,
         CAST(sum(nr) AS BIGINT) AS n_retained,
         CAST(sum(nr * (2 * cb + nv + 1)) AS BIGINT) AS r2
  FROM ranked
)
SELECT n_churned, n_retained,
       CAST(r2 - n_retained * (n_retained + 1) AS BIGINT) AS u_doubled,
       ROUND(CAST(r2 - n_retained * (n_retained + 1) AS DOUBLE)
             / (2.0 * n_retained * n_churned), 6) AS auc
FROM agg
"""


# --- per-group quantile monitor -------------------------------------------

QUANTILES = (50, 95, 99)


def q_quantile_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-group latency-dashboard table: exact p50/p95/p99 of
    value per event type. The value at rank ⌈q·n/100⌉ depends only on
    the sorted MULTISET of values, so instead of a per-type rank
    window (one 2M-row sort task per type at 100× — the
    low-cardinality ceiling SCALE.md measures), the plan is a value
    HISTOGRAM: groupBy (type, value) with map-side combine — fully
    parallel at any group cardinality — then a cumulative count over
    the per-type DISTINCT values (a tiny window) and one min-value
    pick per quantile. Exact, and hash-identical to the rank-window
    oracle, where `approx_percentile` would be rows-only-checkable.
    Completes the monitoring family: `unit_mad_anomalies` flags rows,
    this tracks the distribution the flags are judged against."""
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir).select("event_type", "value")
    hist = ev.groupBy("event_type", "value").agg(F.count("*").alias("n"))
    wv = Window.partitionBy("event_type").orderBy("value")
    cum = hist.withColumn(
        "cum", F.sum("n").over(wv.rowsBetween(Window.unboundedPreceding, 0))
    ).withColumn("total", F.sum("n").over(Window.partitionBy("event_type")))
    picks = None
    for q in QUANTILES:
        rank = F.expr(f"CAST(ceil({q} * total / 100.0) AS BIGINT)")
        p = (
            cum.filter(F.col("cum") >= rank)
            .groupBy("event_type")
            .agg(
                F.min("value").alias("value_at"),
                F.max("total").alias("n_events"),
            )
            .select(
                "event_type",
                F.lit(q).cast("bigint").alias("quantile"),
                "value_at",
                "n_events",
            )
        )
        picks = p if picks is None else picks.unionByName(p)
    return picks


ORACLE_QUANTILE_MONITOR = f"""
WITH {{EV}},
ranked AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rk,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM ev
)
{" UNION ALL ".join(
    f"SELECT event_type, CAST({q} AS BIGINT) AS quantile, value AS value_at, "
    f"n AS n_events FROM ranked WHERE rk = CAST(ceil({q} * n / 100.0) AS BIGINT)"
    for q in QUANTILES
)}
"""


# --- first-order behavioral Markov model ----------------------------------

def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    streams: P(next_type | cur_type) with exact transition counts —
    the behavioral model `unit_events_top_paths` (raw 3-step paths)
    feeds; the matrix is the |types|² ≤ 25-row summary a product team
    actually monitors, plus each state's self-loop probability and its
    entropy-free row sanity (probs sum to 1 by construction).

    One lead window per user (the top-paths shuffle, reused shape),
    one map-side-combining pair count, one broadcast of the per-state
    totals. The single division per row is shared-shape, rounded 6."""
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir).select("user_id", "event_id", "ts", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy(F.col("event_type").alias("cur_type"), "next_type")
        .agg(F.count("*").alias("n"))
    )
    totals = pairs.groupBy("cur_type").agg(F.sum("n").alias("n_cur"))
    return pairs.join(F.broadcast(totals), "cur_type").select(
        "cur_type",
        "next_type",
        "n",
        "n_cur",
        F.round(F.col("n").cast("double") / F.col("n_cur"), 6).alias("prob"),
        (F.col("cur_type") == F.col("next_type")).alias("self_loop"),
    )


ORACLE_MARKOV_TRANSITIONS = f"""
WITH {{EV}},
pairs AS (
  SELECT event_type AS cur_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS next_type
  FROM ev
),
cnt AS (
  SELECT cur_type, next_type, count(*) AS n
  FROM pairs WHERE next_type IS NOT NULL
  GROUP BY cur_type, next_type
),
tot AS (SELECT cur_type, CAST(sum(n) AS BIGINT) AS n_cur FROM cnt GROUP BY cur_type)
SELECT cnt.cur_type AS cur_type, next_type, n, n_cur,
       ROUND(CAST(n AS DOUBLE) / n_cur, 6) AS prob,
       cnt.cur_type = next_type AS self_loop
FROM cnt JOIN tot ON cnt.cur_type = tot.cur_type
"""


# --- last-touch marketing attribution ------------------------------------

ATTR_WINDOW_DAYS = 7
ATTR_TOUCH_TYPES = ("view", "click")


def q_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase is credited to the same
    user's most recent view/click at-or-before it, but only within a
    7-day window — the standard marketing-attribution join, and the
    business twin of `asof_view_before_purchase` with the
    lookback-horizon condition real attribution adds.

    One per-user window pass (last_value IGNORE NULLS over
    conditionally-projected touch columns — all three NULL together,
    so they always come from the SAME touch row), then the window
    horizon nulls out stale touches. Gap computed in exact epoch
    microseconds (second-grain datediffs disagree across engines on
    sub-second timestamps). No self-join, no range explosion."""
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "user_id", "event_type", "ts"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_touch = F.col("event_type").isin(*ATTR_TOUCH_TYPES)

    def carry(col, name):
        return F.last(F.when(is_touch, col), ignorenulls=True).over(w).alias(name)

    enriched = ev.select(
        "*",
        carry(F.col("event_id"), "touch_id_raw"),
        carry(F.col("event_type"), "touch_type_raw"),
        carry(F.col("ts"), "touch_ts_raw"),
    ).filter(F.col("event_type") == "purchase")
    gap_us = F.expr("timestampdiff(MICROSECOND, touch_ts_raw, ts)")
    in_window = F.col("touch_ts_raw").isNotNull() & (
        gap_us <= ATTR_WINDOW_DAYS * 86400 * 1000000
    )
    return enriched.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.when(in_window, F.col("touch_id_raw")).alias("touch_id"),
        F.when(in_window, F.col("touch_type_raw")).alias("touch_type"),
        F.when(in_window, F.col("touch_ts_raw")).alias("touch_ts"),
        F.when(
            in_window,
            F.expr("timestampdiff(MICROSECOND, touch_ts_raw, ts) DIV 1000000"),
        ).alias("gap_s"),
        in_window.alias("attributed"),
    )


ORACLE_ATTRIBUTION_LAST_TOUCH = f"""
WITH {{EV}},
carried AS (
  SELECT event_id, user_id, event_type, ts,
         last_value(CASE WHEN event_type IN ('view', 'click') THEN event_id END IGNORE NULLS)
           OVER w AS touch_id_raw,
         last_value(CASE WHEN event_type IN ('view', 'click') THEN event_type END IGNORE NULLS)
           OVER w AS touch_type_raw,
         last_value(CASE WHEN event_type IN ('view', 'click') THEN ts END IGNORE NULLS)
           OVER w AS touch_ts_raw
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
p AS (
  SELECT *,
         (touch_ts_raw IS NOT NULL AND
          epoch_us(ts) - epoch_us(touch_ts_raw) <= {ATTR_WINDOW_DAYS * 86400 * 1000000})
           AS in_window,
         (epoch_us(ts) - epoch_us(touch_ts_raw)) AS gap_us
  FROM carried WHERE event_type = 'purchase'
)
SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
       CASE WHEN in_window THEN touch_id_raw END AS touch_id,
       CASE WHEN in_window THEN touch_type_raw END AS touch_type,
       CASE WHEN in_window THEN touch_ts_raw END AS touch_ts,
       CAST(CASE WHEN in_window THEN gap_us // 1000000 END AS BIGINT) AS gap_s,
       in_window AS attributed
FROM p
"""


# --- watermark tuning: out-of-orderness audit ----------------------------

LATE_BANDS_S = [0, 60, 300, 1800, 3600]  # lateness band edges (seconds)


def q_watermark_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time out-of-orderness audit — the measurement you run
    BEFORE choosing a streaming watermark delay (`withWatermark`):
    per event type, each event's lateness is how far it arrives behind
    the running event-time maximum in arrival order. The fixture's
    event_id order is perfectly time-sorted (zero disorder — a dead
    audit), so arrival is modeled as hash-shuffled WITHIN 10-minute
    ingest buckets (md5(event_id) order inside each bucket): the
    deterministic stand-in for network/partition jitter that bounds
    disorder at the bucket width, exactly the regime a watermark must
    absorb;
    reported as a fixed lateness-band histogram (on-time, ≤1m, ≤5m,
    ≤30m, ≤1h, >1h) plus the exact max and the exact-rank p95. A
    watermark of the p95 band bounds dropped-late-data to 5% — turning
    the delay knob from folklore into a measured quantity; the
    `tests/test_streaming*` watermarks are the consumers of exactly
    this number.

    Determinism: running max is a per-type window in (event_id) total
    order; lateness is integer seconds (`timestampdiff`); p95 is the
    element at ⌈0.95·n⌉ under the (lateness, event_id) order — the
    exact-order-statistic trick shared with `unit_mad_anomalies`.

    Scale (both windows partition on keys that GROW with the data —
    nothing is keyed on the ~5-value event_type alone):

    - The running max partitions by (event_type, bucket), not by
      event_type: any event in an earlier bucket has
      epoch_us(ts) < epoch0 + bucket·600e6 ≤ epoch_us(ts_current), so
      the cross-bucket carry can never exceed the current event's own
      ts (which the intra-bucket prefix already includes) — the
      per-type prefix scan decomposes exactly into per-(type, bucket)
      prefix scans, and the oracle's per-type form pins the identity.
    - The exact p95 is selected from the (event_type, late_s)
      histogram: late_s = late_us DIV 1e6 is monotone in the rank
      order (late_us, event_id), so the ⌈0.95·n⌉-th row's late_s is
      the smallest s whose cumulative count reaches the rank — the
      only ordered window runs at the tiny distinct-lateness grain,
      never over the event frame."""
    from pyspark.sql import Window

    ev = (
        load_table(spark, "events", sf_dir)
        .select("event_id", "event_type", "ts")
        .withColumn("bucket", F.expr("timestampdiff(MICROSECOND, timestamp_ntz'2000-01-01', ts) DIV 600000000"))
        .withColumn(
            "arr",
            F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 15), 16, 10)
            .cast("bigint"),
        )
    )
    wa = Window.partitionBy("event_type", "bucket").orderBy("arr", "event_id")
    late = ev.withColumn(
        "run_max", F.max("ts").over(wa.rowsBetween(Window.unboundedPreceding, 0))
    ).withColumn(
        "late_us", F.expr("timestampdiff(MICROSECOND, ts, run_max)")
    ).withColumn("late_s", F.expr("late_us DIV 1000000"))
    grain = late.groupBy("event_type", "late_s").agg(F.count("*").alias("c"))
    wn = Window.partitionBy("event_type")
    cum = grain.withColumn(
        "cum",
        F.sum("c").over(
            wn.orderBy("late_s").rowsBetween(Window.unboundedPreceding, 0)
        ),
    ).withColumn("n", F.sum("c").over(wn))
    p95 = (
        cum.filter(F.col("cum") >= F.expr("CAST(ceil(0.95 * n) AS BIGINT)"))
        .groupBy("event_type")
        .agg(F.min("late_s").alias("p95_late_s"))
    )
    b = F.col("late_s")
    hist = late.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum((b <= LATE_BANDS_S[0]).cast("bigint")).alias("on_time"),
        F.sum(((b > LATE_BANDS_S[0]) & (b <= LATE_BANDS_S[1])).cast("bigint")).alias("late_1m"),
        F.sum(((b > LATE_BANDS_S[1]) & (b <= LATE_BANDS_S[2])).cast("bigint")).alias("late_5m"),
        F.sum(((b > LATE_BANDS_S[2]) & (b <= LATE_BANDS_S[3])).cast("bigint")).alias("late_30m"),
        F.sum(((b > LATE_BANDS_S[3]) & (b <= LATE_BANDS_S[4])).cast("bigint")).alias("late_1h"),
        F.sum((b > LATE_BANDS_S[4]).cast("bigint")).alias("late_over_1h"),
        F.max("late_s").alias("max_late_s"),
    )
    return hist.join(p95, "event_type")


ORACLE_WATERMARK_AUDIT = f"""
WITH {{EV}},
late AS (
  SELECT event_id, event_type,
         (epoch_us(max(ts) OVER (PARTITION BY event_type ORDER BY bucket, arr, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
          - epoch_us(ts)) AS late_us,
         (epoch_us(max(ts) OVER (PARTITION BY event_type ORDER BY bucket, arr, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
          - epoch_us(ts)) // 1000000 AS late_s
  FROM (
    SELECT event_id, event_type, ts,
           (epoch_us(ts) - epoch_us(TIMESTAMP '2000-01-01')) // 600000000 AS bucket,
           CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT) AS arr
    FROM ev
  )
),
ranked AS (
  SELECT event_type, late_s,
         row_number() OVER (PARTITION BY event_type ORDER BY late_us, event_id) AS rk,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM late
),
p95 AS (
  SELECT event_type, late_s AS p95_late_s
  FROM ranked WHERE rk = CAST(ceil(0.95 * n) AS BIGINT)
),
hist AS (
  SELECT event_type, count(*) AS n_events,
         CAST(sum(CASE WHEN late_s <= {LATE_BANDS_S[0]} THEN 1 ELSE 0 END) AS BIGINT) AS on_time,
         CAST(sum(CASE WHEN late_s > {LATE_BANDS_S[0]} AND late_s <= {LATE_BANDS_S[1]} THEN 1 ELSE 0 END) AS BIGINT) AS late_1m,
         CAST(sum(CASE WHEN late_s > {LATE_BANDS_S[1]} AND late_s <= {LATE_BANDS_S[2]} THEN 1 ELSE 0 END) AS BIGINT) AS late_5m,
         CAST(sum(CASE WHEN late_s > {LATE_BANDS_S[2]} AND late_s <= {LATE_BANDS_S[3]} THEN 1 ELSE 0 END) AS BIGINT) AS late_30m,
         CAST(sum(CASE WHEN late_s > {LATE_BANDS_S[3]} AND late_s <= {LATE_BANDS_S[4]} THEN 1 ELSE 0 END) AS BIGINT) AS late_1h,
         CAST(sum(CASE WHEN late_s > {LATE_BANDS_S[4]} THEN 1 ELSE 0 END) AS BIGINT) AS late_over_1h,
         max(late_s) AS max_late_s
  FROM late GROUP BY event_type
)
SELECT hist.event_type AS event_type, n_events, on_time, late_1m, late_5m,
       late_30m, late_1h, late_over_1h, max_late_s, p95_late_s
FROM hist JOIN p95 ON hist.event_type = p95.event_type
"""


# round 5 rotations into the driver window: the interval/forecast/
# chain family gets its first driver rows.
SPECS += [
    # second round-6 rotation: active_time / funnel_strict /
    # cohort_retention (driver-green r5) move to the unit surface;
    # four more never-checked event ops take their slots below.
    QuerySpec("unit_watermark_audit", q_watermark_audit,
              ORACLE_WATERMARK_AUDIT.replace("{EV}", _EV_CTE),
              "lateness histogram + exact p95 for watermark tuning"),
    QuerySpec("unit_attribution_last_touch", q_attribution_last_touch,
              ORACLE_ATTRIBUTION_LAST_TOUCH.replace("{EV}", _EV_CTE),
              "7-day last-touch purchase attribution, one window pass"),
    QuerySpec("unit_feature_lags", q_feature_lags, ORACLE_FEATURE_LAGS,
              "per-user lag/delta/gap/rolling-mean feature table"),
    QuerySpec("unit_churn_labels", q_churn_labels,
              ORACLE_CHURN_LABELS.replace("{EV}", _EV_CTE),
              "leakage-safe churn training table: label + features"),
    # round 6 rotations: the never-driver-checked churn-AUC / sliding-
    # HLL-WAU / quantile-monitor / MAD quartet (verdict r5 risk list)
    # takes the slots of peak_concurrency / dau_wau / markov /
    # seasonal_naive (each driver-green r5; pytest oracles keep them
    # true).
    QuerySpec("unit_churn_auc", q_churn_auc,
              ORACLE_CHURN_AUC.replace("{EV}", _EV_CTE),
              "exact AUC of the churn activity feature (AUC = MWU identity)"),
    QuerySpec("unit_hll_sliding_wau", q_hll_sliding_wau,
              _oracle_hll_sliding_wau().replace("{EV}", _EV_CTE),
              "trailing-7-day distinct users via daily HLL register merge"),
    QuerySpec("unit_quantile_monitor", q_quantile_monitor,
              ORACLE_QUANTILE_MONITOR.replace("{EV}", _EV_CTE),
              "exact-rank p50/p95/p99 per group (the dashboard table)"),
    QuerySpec("unit_mad_anomalies", q_mad_anomalies, ORACLE_MAD_ANOMALIES,
              "median/MAD modified-z robust outlier flags per type"),
]

UNIT_SPECS = [
    # rotated out of the driver window in round 5 (driver-green in r4;
    # pytest oracles keep it true, bench keeps timing it):
    QuerySpec("unit_ewma_user_value", q_ewma_user_value, ORACLE_EWMA,
              "per-user EWMA: applyInPandas recurrence, recursive-CTE oracle",
              headline=True),
    QuerySpec("events_anomalies", q_events_anomalies, ORACLE_EVENTS_ANOMALIES,
              "z-score anomaly labeling + JSON prop extraction per event"),
    QuerySpec("events_resample_ffill", q_events_resample_ffill,
              ORACLE_EVENTS_RESAMPLE,
              "daily resample + forward fill per user"),
    QuerySpec("events_user_stats", q_events_user_stats, ORACLE_EVENTS_USER_STATS,
              "funnel + map<event_type,count> per-user stats in one join"),
    QuerySpec("events_window_agg", q_events_window_agg, ORACLE_EVENTS_WINDOW_AGG,
              "tumbling 1h window aggregation"),
    QuerySpec("unit_error_rate_hourly", q_error_rate_hourly,
              ORACLE_ERROR_RATE_HOURLY.replace("{EV}", _EV_CTE),
              "hourly error-rate monitor with alert flag"),
    QuerySpec("unit_new_vs_returning", q_new_vs_returning,
              ORACLE_NEW_VS_RETURNING.replace("{EV}", _EV_CTE),
              "per-day new vs returning active-user split"),
    QuerySpec("unit_backfill_plan", q_backfill_plan,
              ORACLE_BACKFILL_PLAN.replace("{EV}", _EV_CTE),
              "missing-hour backfill work orders per event type"),
    # rotated out in the second round-5 rotation (driver-green r1-r4);
    # its gap semantics stay driver-checked via streaming_session_totals.
    QuerySpec("events_sessionize", q_events_sessionize, ORACLE_EVENTS_SESSIONIZE,
              "gap-based sessionization (lag + cumsum)", headline=True),
    # rotated out of the driver window in round 6 (driver-green r5):
    QuerySpec("unit_peak_concurrency", q_peak_concurrency,
              _oracle_peak_concurrency().replace("{SESS}", ORACLE_EVENTS_SESSIONIZE),
              "sweep-line peak concurrent sessions per day"),
    QuerySpec("unit_dau_wau", q_dau_wau,
              ORACLE_DAU_WAU.replace("{EV}", _EV_CTE),
              "DAU / trailing-7-day WAU / stickiness per day"),
    QuerySpec("unit_markov_transitions", q_markov_transitions,
              ORACLE_MARKOV_TRANSITIONS.replace("{EV}", _EV_CTE),
              "first-order Markov transition matrix over user streams"),
    QuerySpec("unit_seasonal_naive_backtest", q_seasonal_naive_backtest,
              ORACLE_SEASONAL_NAIVE.replace("{EV}", _EV_CTE),
              "seasonal-naive forecast MAE/bias floor per event type"),
    # rotated out in the second round-6 rotation (driver-green r5):
    QuerySpec("unit_active_time", q_active_time,
              _oracle_active_time().replace("{SESS}", ORACLE_EVENTS_SESSIONIZE),
              "per-user interval-union active time in exact micros"),
    QuerySpec("unit_funnel_strict", q_funnel_strict, ORACLE_FUNNEL_STRICT,
              "strict-order funnel: stage N only after stage N-1"),
    QuerySpec("unit_cohort_retention", q_cohort_retention, ORACLE_COHORT_RETENTION,
              "weekly signup-cohort retention matrix"),
    QuerySpec("unit_events_json_props", q_events_json_props,
              ORACLE_EVENTS_JSON_PROPS, "JSON prop extraction per event"),
    QuerySpec("unit_events_top_paths", q_events_top_paths,
              ORACLE_EVENTS_TOP_PATHS,
              "top-K 3-step behavioral paths (lead windows + count)"),
]
