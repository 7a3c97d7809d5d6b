"""SparkSession factory.

Centralizes the engine's session configuration so tests, the bench
harness, and the driver entry all get identical semantics:

- UTC session timezone (parity with DuckDB's naive-UTC timestamps).
- ANSI off: the reference coerces bad values to NULL/NaN
  (``pd.to_numeric(errors='coerce')``, reference
  running_validation.py:242-243); non-ANSI casts reproduce that.
  Engine code still prefers explicit ``try_cast`` so it is correct
  under either setting.
- AQE on (runtime coalescing, skew-join handling) — the 100 TB
  posture; harmless locally.
- Shuffle partitions sized to the local core count instead of the
  200 default; on a real cluster this is overridden per deployment.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "validation_database_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Per-Column-call Python call-site capture costs ~0.5 s of
        # py4j chatter on a wide plan build (profiled on doc_profile);
        # the engine trades that error-context nicety for build speed.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/spark_graft_warehouse"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
