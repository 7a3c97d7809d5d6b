"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship end-to-end reconciliation (derive a
deterministic two-source validation pair from orders.parquet →
bidirectional anti-joins → inner join → null-safe compare → counts);
``queries()`` / ``oracle_sql()`` expose every implemented operator
from SURVEY.md §2 plus the north-star extensions, with DuckDB oracles
wherever the semantics are ANSI-SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from validation_database_spark.suite.parity import q_validation_counts

    return q_validation_counts(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from validation_database_spark import suite

    return suite.queries()


def oracle_sql() -> dict[str, str]:
    from validation_database_spark import suite

    return suite.oracle_sql()
