"""Physical-plan introspection.

The engine's scale posture is only real if the plans show it:
filters reaching the parquet scan (``PushedFilters``), column pruning
(``ReadSchema``), small dims broadcast (``BroadcastHashJoin``),
partial aggregation before the exchange. These helpers extract those
facts from ``explain("formatted")`` output so tests can pin them —
a regression in plan quality fails CI, not just the benchmark.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    jdf = df._jdf
    jvm = df.sparkSession._jvm
    return jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's scans."""
    plan = physical_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[(.*?)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[set[str]]:
    """Per-scan sets of column names actually read from parquet."""
    plan = physical_plan(df)
    schemas: list[set[str]] = []
    for m in re.finditer(r"ReadSchema: struct<(.*?)>", plan):
        cols = {
            part.split(":")[0].strip()
            for part in m.group(1).split(",")
            if ":" in part
        }
        schemas.append(cols)
    return schemas


def count_occurrences(df: DataFrame, token: str) -> int:
    return physical_plan(df).count(token)
