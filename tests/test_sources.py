"""Source registry: JDBC spec generation + lakehouse gating."""

from __future__ import annotations

import pytest

from validation_database_spark.sources.lakehouse import (
    FORMATS,
    LakehouseTable,
    LakehouseUnavailable,
    available,
)
from validation_database_spark.sources.registry import JdbcSource


def test_jdbc_reader_options_query_mode():
    src = JdbcSource(
        url="jdbc:postgresql://localhost/db",
        query="SELECT id, model FROM public.orders",
        user="u",
        password="p",
        fetchsize=10_000,
    )
    opts = src.reader_options()
    assert opts["query"].startswith("SELECT")
    assert opts["fetchsize"] == "10000"  # reference batch_size default
    assert "dbtable" not in opts


def test_jdbc_partitioned_read_options():
    src = JdbcSource(
        url="jdbc:oracle:thin:@localhost",
        dbtable="orders",
        partition_column="id",
        lower_bound=0,
        upper_bound=1_000_000,
        num_partitions=16,
    )
    opts = src.reader_options()
    assert opts["numPartitions"] == "16"
    assert opts["partitionColumn"] == "id"


def test_jdbc_rejects_ambiguous_spec():
    with pytest.raises(ValueError):
        JdbcSource(url="jdbc:x", query="SELECT 1", dbtable="t").reader_options()
    with pytest.raises(ValueError):
        JdbcSource(url="jdbc:x").reader_options()


def test_jdbc_rejects_partial_partition_spec():
    with pytest.raises(ValueError, match="together"):
        JdbcSource(
            url="jdbc:x", dbtable="t", partition_column="id"
        ).reader_options()


@pytest.mark.parametrize("fmt", FORMATS)
def test_lakehouse_unavailable_in_this_image(spark, fmt):
    # no lakehouse jars in the container: probes must say so and
    # read/write must fail with the setup hint, not a ClassNotFound
    assert available(spark, fmt) is False
    with pytest.raises(LakehouseUnavailable, match="classpath"):
        LakehouseTable(fmt, "/tmp/nowhere").read(spark)


def test_lakehouse_rejects_unknown_format(spark):
    with pytest.raises(ValueError):
        available(spark, "csv")
