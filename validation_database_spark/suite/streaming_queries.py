"""Streaming operators exposed as driver-checkable queries: each runs
a bounded Structured Streaming pipeline to completion (memory sink,
``processAllAvailable``) and returns the materialized result.

``streaming_window_counts`` is deterministic (complete mode ≡ the
batch aggregation) and carries a full DuckDB oracle — the streaming
engine's output is hash-compared against SQL. The stateful-operator
query is rows-only (its per-batch update history depends on batch
splitting; tests check final-state equivalence instead)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming import (
    run_to_completion,
    stream_events,
    streaming_user_totals,
    streaming_window_counts,
)
from . import QuerySpec


def q_streaming_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = stream_events(spark, sf_dir)
    out = run_to_completion(
        streaming_window_counts(stream), "suite_stream_win", output_mode="complete"
    )
    # memory-sink table is unordered; output is the full final state.
    return out


ORACLE_STREAMING_WINDOW_COUNTS = """
WITH ev AS (SELECT make_timestamp(epoch_ns(ts) // 1000) AS ts, event_type, value
            FROM events)
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM ev GROUP BY 1, 2
"""


def q_streaming_user_totals_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final state of the custom stateful operator: max-n row per
    user across the update stream. Fully value-checked: the operator
    accumulates exact integer cents (2-decimal values), so the final
    state is identical under any micro-batch splitting and a plain
    SQL aggregation reproduces it bit-for-bit — only the per-batch
    UPDATE HISTORY is batch-dependent, and this query projects the
    final state."""
    stream = stream_events(spark, sf_dir)
    out = run_to_completion(
        streaming_user_totals(stream), "suite_stream_totals", output_mode="update"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", "total_value")
    )


ORACLE_STREAMING_USER_TOTALS_FINAL = """
SELECT user_id,
       count(*) AS n_events,
       CAST(COALESCE(SUM(CAST(round(value * 100) AS BIGINT)), 0) AS DOUBLE) / 100
         AS total_value
FROM events
GROUP BY user_id
"""


SPECS = [
    QuerySpec("streaming_window_counts", q_streaming_window_counts,
              ORACLE_STREAMING_WINDOW_COUNTS,
              "Structured Streaming tumbling windows ≡ SQL oracle",),
    QuerySpec("streaming_user_totals_final", q_streaming_user_totals_final,
              ORACLE_STREAMING_USER_TOTALS_FINAL,
              "applyInPandasWithState final state ≡ SQL (exact cents)"),
]
