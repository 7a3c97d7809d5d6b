"""Query suite: every implemented operator as a named (spark_fn,
oracle_sql) pair — the driver's correctness surface.

Each :class:`QuerySpec` carries a builder ``(spark, sf_dir) ->
DataFrame`` and, when the semantics are ANSI-SQL-expressible, an
equivalent DuckDB SQL string over the same parquet tables. Column
names are aliased identically on both sides (the driver's compare
sorts columns by name before hashing).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, None → rows-only check
    doc: str = ""
    headline: bool = False  # include in bench.py's timed suite


def _collect_specs() -> dict[str, QuerySpec]:
    from . import advanced, analytics, dedup, events, functions, multimodal, parity, pipeline, quality, similarity, streaming_queries, text

    specs: dict[str, QuerySpec] = {}
    for mod in (parity, analytics, text, dedup, similarity, events, multimodal, advanced, functions, streaming_queries, pipeline, quality):
        for spec in mod.SPECS:
            if spec.name in specs:
                raise ValueError(f"duplicate query name {spec.name!r}")
            specs[spec.name] = spec
    return specs


def all_specs() -> dict[str, QuerySpec]:
    return _collect_specs()


def unit_specs() -> dict[str, QuerySpec]:
    """Standalone unit-operator specs — queries whose semantics were
    consolidated into combined driver entries (the driver checks only
    the first 50 registry rows) but which remain the documented
    per-operator surface. Not part of ``queries()``/``oracle_sql()``;
    tests/test_oracle_parity.py keeps them oracle-true."""
    from . import advanced, analytics, dedup, events, functions, multimodal, parity, pipeline, quality, similarity, streaming_queries, text

    specs: dict[str, QuerySpec] = {}
    for mod in (parity, analytics, text, dedup, similarity, events, multimodal, advanced, functions, streaming_queries, pipeline, quality):
        for spec in getattr(mod, "UNIT_SPECS", []):
            if spec.name in specs:
                raise ValueError(f"duplicate unit query name {spec.name!r}")
            specs[spec.name] = spec
    return specs


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.spark_fn for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in all_specs().items()
        if spec.oracle is not None
    }
