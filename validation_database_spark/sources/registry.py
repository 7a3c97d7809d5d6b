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
``/root/testdata/sf*/``; JDBC specs are supported but exercised only
when a live database URL is configured (none exists in this container,
so they are covered by unit tests of the generated reader options).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

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
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's reader
        # rejects. Read nanos as long and truncate to microseconds
        # (the DuckDB oracles truncate identically via
        # make_timestamp(epoch_ns(ts) // 1000)). timestamp_micros
        # yields TIMESTAMP_LTZ, whose wall-clock rendering depends on
        # the session timezone — pin UTC (the engine-wide assumption,
        # see session.py) so a caller-provided session with another TZ
        # still gets DuckDB-comparable instants.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        from pyspark.sql import functions as F

        raw = spark.read.parquet(path)
        return raw.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
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
