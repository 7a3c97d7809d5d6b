"""Lakehouse table-format connectors (Delta Lake / Apache Iceberg /
Apache Hudi), gated behind import/classpath probes.

This container image ships no lakehouse jars, so these are honest
stubs: ``available()`` probes for the runtime, ``read``/``write``
raise a clear ``LakehouseUnavailable`` with setup instructions when
the format's jars are absent. The API shape is final — deployments
with the jars on the classpath get working readers/writers with no
engine changes, because the implementations delegate straight to the
standard ``spark.read.format(...)`` path.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

FORMATS = ("delta", "iceberg", "hudi")

_SETUP_HINTS = {
    "delta": "add the delta-spark package (io.delta:delta-spark_2.13) and "
             "spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension",
    "iceberg": "add org.apache.iceberg:iceberg-spark-runtime and configure "
               "a spark_catalog/catalog-impl",
    "hudi": "add org.apache.hudi:hudi-spark-bundle",
}


class LakehouseUnavailable(RuntimeError):
    pass


def available(spark: SparkSession, fmt: str) -> bool:
    """True if the format's DataSource is loadable in this session."""
    if fmt not in FORMATS:
        raise ValueError(f"unknown lakehouse format {fmt!r}; expected {FORMATS}")
    probe_classes = {
        "delta": "org.apache.spark.sql.delta.sources.DeltaDataSource",
        "iceberg": "org.apache.iceberg.spark.source.IcebergSource",
        "hudi": "org.apache.hudi.DefaultSource",
    }
    try:
        spark._jvm.java.lang.Class.forName(probe_classes[fmt])
        return True
    except Exception:
        return False


def _require(spark: SparkSession, fmt: str) -> None:
    if not available(spark, fmt):
        raise LakehouseUnavailable(
            f"{fmt} runtime not on the classpath in this environment; "
            f"to enable: {_SETUP_HINTS[fmt]}"
        )


@dataclass
class LakehouseTable:
    fmt: str
    path: str

    def read(self, spark: SparkSession) -> DataFrame:
        _require(spark, self.fmt)
        return spark.read.format(self.fmt).load(self.path)

    def write(self, df: DataFrame, mode: str = "append") -> None:
        _require(df.sparkSession, self.fmt)
        df.write.format(self.fmt).mode(mode).save(self.path)
