"""Kafka stream source, gated behind a classpath probe.

The natural at-scale transport for the events stream is Kafka; Spark's
connector (``spark-sql-kafka-0-10``) is a separate jar this image does
not ship, so — same honest-gating pattern as sources/lakehouse.py —
``kafka_available()`` probes the DataSource class and the readers
raise a clear error with the setup hint when it is absent. The
builder API is final: with the jar on the classpath these return live
streaming DataFrames with the engine's standard events schema applied.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_KAFKA_PROVIDER = "org.apache.spark.sql.kafka010.KafkaSourceProvider"
_SETUP_HINT = (
    "add org.apache.spark:spark-sql-kafka-0-10_2.13 (matching the Spark "
    "version) to spark.jars.packages"
)


class KafkaUnavailable(RuntimeError):
    pass


def kafka_available(spark: SparkSession) -> bool:
    """True if the Kafka DataSource is loadable in this session."""
    try:
        spark._jvm.java.lang.Class.forName(_KAFKA_PROVIDER)
        return True
    except Exception:
        return False


def _require(spark: SparkSession) -> None:
    if not kafka_available(spark):
        raise KafkaUnavailable(
            f"Kafka connector not on the classpath; to enable: {_SETUP_HINT}"
        )


def stream_kafka_raw(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    *,
    starting_offsets: str = "latest",
) -> DataFrame:
    """The connector's native shape: key/value binary + topic /
    partition / offset / timestamp metadata columns."""
    _require(spark)
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )


def stream_kafka_events(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    *,
    starting_offsets: str = "latest",
) -> DataFrame:
    """Events-shaped stream from JSON-encoded Kafka values: parses the
    engine's events schema (event_id, ts, user_id, event_type, value,
    props) out of the message value — the drop-in Kafka twin of
    ``stream_events`` (file source). ``ts`` arrives as epoch
    microseconds in the JSON and becomes the same TIMESTAMP event-time
    column the watermarked operators consume."""
    raw = stream_kafka_raw(
        spark, bootstrap_servers, topic, starting_offsets=starting_offsets
    )
    parsed = raw.select(
        F.from_json(
            F.col("value").cast("string"),
            "event_id long, ts long, user_id long, event_type string, "
            "value double, props string",
        ).alias("e")
    )
    return parsed.select(
        "e.event_id",
        F.timestamp_micros(F.col("e.ts")).alias("ts"),
        "e.user_id",
        "e.event_type",
        "e.value",
        "e.props",
    )
