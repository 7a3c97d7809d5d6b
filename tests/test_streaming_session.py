"""Streaming native session windows: append mode must emit exactly
the sessions the watermark has closed — no more (leaking open state),
no fewer (dropping closed sessions) — and their aggregates must match
the batch session_window computation row-for-row."""

from __future__ import annotations

from pyspark.sql import functions as F

from validation_database_spark.sources import load_table
from validation_database_spark.streaming.validation import (
    stream_events,
    streaming_session_totals,
)


def _sorted(df):
    return sorted(map(tuple, df.collect()), key=repr)


def test_streaming_sessions_equal_batch_closed_set(spark, sf_dir):
    stream = stream_events(spark, sf_dir)
    q = (
        streaming_session_totals(stream)
        .writeStream.format("memory")
        .queryName("sess_totals")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("sess_totals")

    ev = load_table(spark, "events", sf_dir).withColumn(
        "ts", F.col("ts").cast("timestamp")  # NTZ -> LTZ, session TZ is UTC
    )
    cents = F.round(F.col("value") * 100).cast("bigint")
    batch = (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(F.count("*").alias("n_events"), F.sum(cents).alias("sum_cents"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "sum_cents",
        )
    )
    cutoff = ev.agg(
        (F.max("ts") - F.expr("INTERVAL 1 HOUR")).alias("c")
    ).collect()[0]["c"]
    closed = batch.filter(F.col("session_end") <= F.lit(cutoff))

    assert _sorted(got) == _sorted(closed)
    # the restriction is non-trivial in both directions
    assert 0 < got.count() < batch.count()
