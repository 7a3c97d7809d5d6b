"""Training-data export sinks.

The delivery end of a curation pipeline: size-bounded JSONL shards
(the de-facto interchange format for LLM training corpora) written
directly by executors — no driver materialization, any corpus size.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame


def export_jsonl_shards(
    df: DataFrame,
    out_dir: str,
    *,
    max_records_per_shard: int = 10_000,
    shards_hint: int | None = None,
) -> list[str]:
    """Write ``df`` as gzip JSONL shards with AT MOST
    ``max_records_per_shard`` records per file.

    Two independent controls compose the guarantee:

    - ``maxRecordsPerFile`` makes the PER-FILE cap a hard writer
      property: a task holding more than the cap rolls to a new file,
      so the bound holds under ANY partitioning — which is why the
      hintless path needs no sizing pass at all;
    - ``repartition(shards_hint)``, only when a hint is given, sets a
      floor on file count and spreads records evenly (round-robin —
      exports want balanced shards, not clustered keys).

    Hintless mode is exactly ONE Spark job (the write): shard shape
    follows the upstream partitioning, every file still ≤ the cap
    (pinned by tests/test_formats.py's job-count assertion; earlier
    versions ran a ``df.count()`` sizing job here, recomputing the
    whole upstream DAG once per export).

    Returns the shard paths. Columns are written as-is — serialize
    binary/array columns upstream if the consumer needs a specific
    encoding.
    """
    if max_records_per_shard <= 0:
        # Spark reads maxRecordsPerFile <= 0 as "no limit", which would
        # silently void the documented AT-MOST contract — reject loudly.
        raise ValueError("max_records_per_shard must be > 0")
    if shards_hint is not None:
        df = df.repartition(shards_hint)
    (
        df.write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_shard)
        .option("compression", "gzip")
        .json(out_dir)
    )
    return sorted(glob.glob(os.path.join(out_dir, "part-*.json.gz")))


def write_partitioned_parquet(
    df,
    out_dir: str,
    partition_cols: list[str],
    *,
    max_records_per_file: int | None = None,
) -> None:
    """Hive-partitioned parquet layout (``out_dir/col=value/...``) —
    the lakehouse table layout that turns partition-column predicates
    into DIRECTORY pruning: a reader filtering on a partition column
    never opens the other partitions' files at all (visible in the
    plan as ``PartitionFilters``, a stronger guarantee than row-group
    ``PushedFilters``; pinned by tests/test_partition_pruning.py).

    Executor-written like the JSONL exporter: no driver collect, no
    coalesce(1); ``maxRecordsPerFile`` bounds file sizes inside each
    partition directory."""
    writer = df.write.mode("overwrite").partitionBy(*partition_cols)
    if max_records_per_file is not None:
        if max_records_per_file <= 0:
            raise ValueError("max_records_per_file must be > 0")
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(out_dir)
