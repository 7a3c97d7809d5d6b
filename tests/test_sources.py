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


def test_events_ts_unit_probe_covers_all_vintages(spark, sf_dir, tmp_path):
    """load_table must read all three events.ts vintages identically:
    TIMESTAMP(NANOS) (original fixtures — raw-long workaround),
    TIMESTAMP(MICROS) (current fixtures — native read), and plain
    int64 epoch nanos (older scale-data layouts). The µs fixture is
    the reference; the other two are synthesized from it."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from validation_database_spark.sources.registry import events_ts_unit, load_table

    ref = load_table(spark, "events", sf_dir).orderBy("event_id").limit(50)
    rows = ref.collect()
    epoch = __import__("datetime").datetime(1970, 1, 1)
    # naive-UTC epoch micros via timedelta (TZ-independent, unlike
    # datetime.timestamp() which assumes the SYSTEM zone)
    ts_ns = [
        (((r.ts - epoch).days * 86400 + (r.ts - epoch).seconds) * 1_000_000
         + r.ts.microsecond) * 1000
        for r in rows
    ]

    def arrow_events(ts_array):
        return pa.table(
            {
                "event_id": pa.array([r.event_id for r in rows], pa.int64()),
                "ts": ts_array,
                "user_id": pa.array([r.user_id for r in rows], pa.int64()),
                "event_type": pa.array([r.event_type for r in rows]),
                "value": pa.array([r.value for r in rows]),
                "props": pa.array([r.props for r in rows]),
            }
        )

    variants = {
        "ns": (arrow_events(pa.array(ts_ns, pa.timestamp("ns"))), {"version": "2.6"}),
        "int64": (arrow_events(pa.array(ts_ns, pa.int64())), {}),
    }
    expected = [(r.event_id, r.ts) for r in rows]
    for name, (tbl, kw) in variants.items():
        d = tmp_path / name
        d.mkdir()
        pq.write_table(tbl, str(d / "events.parquet"), **kw)
        assert events_ts_unit(str(d / "events.parquet")) == "ns", name
        got = [
            (r.event_id, r.ts)
            for r in load_table(spark, "events", str(d)).orderBy("event_id").collect()
        ]
        assert got == expected, f"{name} vintage read differs"
    assert events_ts_unit(
        __import__("os").path.join(sf_dir, "events.parquet")
    ) == "us"
