"""Cross-validation of two independent sessionization forms: the
engine's lag+cumsum query (suite/events.py, driver-checked vs DuckDB)
and Spark's native ``F.session_window`` operator. Agreement between a
window-function formulation and the built-in stateful-window operator
is strong evidence both encode the intended gap semantics.

Boundary note: ``session_window`` closes a session when the gap is
``>= gap``; the lag form starts a new one only when strictly ``>``.
The two differ only for gaps EXACTLY equal to 30:00.000000, which the
microsecond-random fixture does not produce (asserted below, so a
future fixture change surfaces loudly instead of flaking)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from validation_database_spark.sources import load_table
from validation_database_spark.suite.events import SESSION_GAP, q_events_sessionize


def test_lag_cumsum_sessionize_matches_session_window(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)

    # precondition for comparability: no gap is exactly the threshold
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    exact = (
        ev.withColumn("prev_ts", F.lag("ts").over(w))
        .filter(
            F.col("ts")
            == F.col("prev_ts") + F.expr(f"INTERVAL {SESSION_GAP} MINUTES")
        )
        .count()
    )
    assert exact == 0, "fixture produced an exact-boundary gap"

    native = (
        ev.groupBy(
            "user_id",
            F.session_window("ts", f"{SESSION_GAP} minutes").alias("sw"),
        )
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select("user_id", "session_start", "session_end", "n_events", "total_value")
    )
    lagged = q_events_sessionize(spark, sf_dir).select(
        "user_id", "session_start", "session_end", "n_events", "total_value"
    )
    got = sorted(map(tuple, native.collect()))
    want = sorted(map(tuple, lagged.collect()))
    assert got == want
