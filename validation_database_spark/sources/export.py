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

    - ``repartition(shards_hint)`` sets a floor on file count and
      spreads records evenly (round-robin — exports want balanced
      shards, not clustered keys);
    - ``maxRecordsPerFile`` makes the PER-FILE cap a hard writer
      property: a task holding more than the cap rolls to a new file,
      so the bound holds even under skewed partitions or a bad hint.

    Returns the shard paths. Columns are written as-is — serialize
    binary/array columns upstream if the consumer needs a specific
    encoding.
    """
    n_shards = shards_hint
    if n_shards is None:
        # one Spark job to size the export; at known scale pass the hint
        n_shards = max(1, -(-df.count() // max_records_per_shard))
    (
        df.repartition(n_shards)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_shard)
        .option("compression", "gzip")
        .json(out_dir)
    )
    return sorted(glob.glob(os.path.join(out_dir, "part-*.json.gz")))
