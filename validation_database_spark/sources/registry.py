"""Source registry: table name → DataFrame.

The reference implements four bespoke batched connectors (PostgreSQL /
Oracle / Athena / MaxCompute fetchmany loops, reference
running_validation.py:30-212) plus a name→fetcher dispatch
(running_validation.py:568-611). Spark subsumes all of that with
DataFrameReader: JDBC readers handle the relational sources (with
server-side pushdown via ``option("query", ...)`` and partitioned
reads), and the parquet reader covers lake-resident data (what Athena
was scanning). This module is the Spark-native equivalent of that
dispatch: a registry keyed by source name.

For the test fixtures everything is parquet under
``/root/testdata/sf*/``; the JDBC path is exercised LIVE against
embedded Apache Derby (shipped in Spark's own jars) by
``tests/test_jdbc_live.py`` — real scans incl. server-side ``query``
pushdown, range-partitioned parallel reads, and Catalyst
filter pushdown — plus option-generation unit tests in
``tests/test_sources.py``.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: Canonical fixture tables (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def default_sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


#: Physical schema of events.parquet with ts as raw nanos. Supplying
#: it explicitly lets the scan read the TIMESTAMP(NANOS) column as
#: long WITHOUT flipping the session-wide
#: ``spark.sql.legacy.parquet.nanosAsLong`` flag (which would silently
#: change how unrelated reads in a caller-owned session treat nanos).
EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

#: nanos → TIMESTAMP_NTZ at microsecond precision, computed as
#: NTZ-epoch + exact day/decimal-second intervals. Deliberately NOT
#: ``timestamp_micros`` (LTZ): NTZ has no session-timezone rendering,
#: so results are identical under any caller session TZ — and it
#: matches the DuckDB oracles' naive ``make_timestamp(epoch_ns(ts) //
#: 1000)`` semantics exactly. The decimal seconds keep the arithmetic
#: exact (no double rounding at the microsecond).
EVENTS_TS_NTZ = (
    "make_timestamp_ntz(1970, 1, 1, 0, 0, 0) + make_dt_interval("
    "CAST((ts div 1000) div 86400000000 AS INT), 0, 0, "
    "CAST((ts div 1000) % 86400000000 AS DECIMAL(18,6)) / 1000000)"
)

#: Cached per-file probe results; parquet footers are immutable.
_TS_UNIT_CACHE: dict[str, str] = {}


def events_ts_unit(path: str) -> str:
    """Timestamp unit ('ns'/'us'/...) of ``events.ts`` from the
    parquet footer.

    The fixture generator has shipped events.ts both as
    TIMESTAMP(NANOS) (which Spark's vectorized reader rejects — it
    needs the raw-long workaround below) and as standard
    microsecond timestamps (which Spark reads natively); a plain
    int64 ts column (older scale-data layouts) carries raw epoch
    nanos and maps to the same workaround. Probing the footer — a
    metadata-only read, no data pages — picks the right read path
    instead of hard-coding any vintage.
    """
    if path not in _TS_UNIT_CACHE:
        import pyarrow.parquet as pq

        probe = path
        if os.path.isdir(path):
            import glob

            parts = sorted(glob.glob(os.path.join(path, "*.parquet")))
            if not parts:
                raise FileNotFoundError(f"no parquet files under {path}")
            probe = parts[0]
        field = pq.ParquetFile(probe).schema_arrow.field("ts")
        _TS_UNIT_CACHE[path] = getattr(field.type, "unit", "ns")
    return _TS_UNIT_CACHE[path]


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    """Load a fixture table as a (lazy) DataFrame.

    Parquet is self-describing and columnar: Catalyst pushes filters
    into row-group pruning and prunes columns at the scan — the
    Spark-native version of the reference's hand-written projection /
    predicate pushdown (running_validation.py:489-562).
    """
    sf_dir = sf_dir or default_sf_dir()
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        from pyspark.sql import functions as F

        if events_ts_unit(path) == "ns":
            # TIMESTAMP(NANOS), which Spark's reader rejects by
            # default. An explicit schema reads it as raw long nanos
            # without touching any session conf, and the NTZ
            # conversion truncates to microseconds exactly like the
            # DuckDB oracles' make_timestamp(epoch_ns(ts) // 1000).
            raw = spark.read.schema(EVENTS_RAW_SCHEMA).parquet(path)
            return raw.withColumn("ts", F.expr(EVENTS_TS_NTZ))
        # Microsecond storage: Spark reads it natively; the cast pins
        # TIMESTAMP_NTZ regardless of the session's NTZ-inference
        # conf (a no-op when inference already yields NTZ; under LTZ
        # the session TZ is pinned UTC so the wall-clock is
        # identical). DuckDB's epoch_ns(ts) // 1000 is exact here.
        raw = spark.read.parquet(path)
        return raw.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str | None = None, tables=TABLES) -> None:
    """Register each fixture table as a temp view for the SQL API."""
    for name in tables:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)


@dataclass
class JdbcSource:
    """Declarative JDBC source spec — replaces the reference's four
    hand-rolled connectors (running_validation.py:30-212).

    ``query`` ships the generated SQL server-side (projection +
    predicate evaluated by the remote DB, exactly as the reference's
    ``construct_query`` output was); ``partition_column`` et al. turn
    the single fetchmany loop into N parallel range-partitioned reads —
    the scale path the reference lacked.
    """

    url: str
    query: str | None = None
    dbtable: str | None = None
    user: str | None = None
    password: str | None = None
    fetchsize: int = 10_000  # reference batch_size default (config.yaml)
    partition_column: str | None = None
    lower_bound: int | None = None
    upper_bound: int | None = None
    num_partitions: int | None = None
    driver: str | None = None
    extra: dict[str, str] = field(default_factory=dict)

    def reader_options(self) -> dict[str, str]:
        if (self.query is None) == (self.dbtable is None):
            raise ValueError("exactly one of query/dbtable must be set")
        opts: dict[str, str] = {"url": self.url, "fetchsize": str(self.fetchsize)}
        if self.query is not None:
            opts["query"] = self.query
        if self.dbtable is not None:
            opts["dbtable"] = self.dbtable
        if self.user is not None:
            opts["user"] = self.user
        if self.password is not None:
            opts["password"] = self.password
        if self.driver is not None:
            opts["driver"] = self.driver
        partition_opts = (
            self.partition_column,
            self.lower_bound,
            self.upper_bound,
            self.num_partitions,
        )
        if any(o is not None for o in partition_opts):
            if any(o is None for o in partition_opts):
                raise ValueError(
                    "partition_column, lower_bound, upper_bound, num_partitions "
                    "must be set together"
                )
            opts.update(
                partitionColumn=str(self.partition_column),
                lowerBound=str(self.lower_bound),
                upperBound=str(self.upper_bound),
                numPartitions=str(self.num_partitions),
            )
        opts.update(self.extra)
        return opts

    def load(self, spark: SparkSession) -> DataFrame:
        return spark.read.format("jdbc").options(**self.reader_options()).load()
