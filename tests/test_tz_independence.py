"""Session-timezone independence of the events pipeline.

events.ts is TIMESTAMP_NTZ built from raw parquet nanos with exact
integer arithmetic (sources/registry.py) — so a caller whose session
runs in any timezone gets identical results, and load_table never
mutates their session conf. These tests run the same queries in a
sibling session pinned to America/New_York (DST, negative offset) and
require bit-identical output vs the UTC session."""

from __future__ import annotations

from validation_database_spark.sources import load_table
from validation_database_spark.suite.events import q_events_sessionize


def _ny_session(spark):
    ny = spark.newSession()
    ny.conf.set("spark.sql.session.timeZone", "America/New_York")
    ny.conf.set("spark.sql.shuffle.partitions", "4")
    return ny


def test_load_table_events_identical_under_other_tz(spark, sf_dir):
    ny = _ny_session(spark)
    utc_rows = sorted(
        (r.event_id, r.ts) for r in load_table(spark, "events", sf_dir).collect()
    )
    ny_rows = sorted(
        (r.event_id, r.ts) for r in load_table(ny, "events", sf_dir).collect()
    )
    assert utc_rows == ny_rows
    # and the caller's session timezone was not overwritten (the
    # round-1 reader mutated it to UTC; the NTZ reader must not)
    assert ny.conf.get("spark.sql.session.timeZone") == "America/New_York"


def test_sessionize_identical_under_other_tz(spark, sf_dir):
    ny = _ny_session(spark)
    utc = sorted(map(tuple, q_events_sessionize(spark, sf_dir).collect()))
    got = sorted(map(tuple, q_events_sessionize(ny, sf_dir).collect()))
    assert utc == got


def test_round3_ops_identical_under_other_tz(spark, sf_dir):
    """The round-3 operators touching timestamps or floats must also
    be session-TZ-independent: the EWMA recurrence (orders by ts) and
    top-K paths (lead windows over ts)."""
    from validation_database_spark.suite.events import (
        q_events_top_paths,
        q_ewma_user_value,
    )

    ny = _ny_session(spark)
    for fn in (q_ewma_user_value, q_events_top_paths):
        utc = sorted(map(tuple, fn(spark, sf_dir).collect()))
        got = sorted(map(tuple, fn(ny, sf_dir).collect()))
        assert utc == got, fn.__name__
