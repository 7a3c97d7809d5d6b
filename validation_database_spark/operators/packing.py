"""Greedy sequence packing — the batch-assembly step of an LLM
training pipeline: concatenate documents in a stable order into
fixed-token-budget packs (context windows), opening a new pack when
the next document would overflow.

Reset-on-overflow greedy packing is NOT a prefix sum (the running
fill resets at data-dependent points), so no window function
expresses it; it is inherently sequential WITHIN a pack stream. The
scalable shape shards the corpus by a stable hash into many
independent streams — each shard packs sequentially, shards pack in
parallel, and a document's (shard, pack) assignment never depends on
cluster layout, only on the data. ``applyInPandas`` runs the per-
shard loop as one Arrow batch stream per group.

At 100 TB: shard count is the parallelism knob (thousands of shards
→ thousands of independent tasks); per-shard state is a single
integer, memory is one Arrow batch. The per-row Python loop is the
honest cost of a sequential recurrence — ~10⁶ rows/s/core, and rows
here are documents, not tokens.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StructField, StructType


def pack_greedy(
    df: DataFrame,
    *,
    group_col: str,
    order_cols: Iterable[str],
    size_col: str,
    budget: int,
    pack_col: str = "pack_id",
) -> DataFrame:
    """Assign each row a ``pack_col`` id within its ``group_col``
    stream: rows are taken in ``order_cols`` order, accumulating
    ``size_col``; a row that would push the running fill past
    ``budget`` starts the next pack. A single row larger than the
    budget gets a pack of its own (packs are never split).

    Returns the input columns plus ``pack_col`` (bigint, 0-based per
    group). Deterministic: depends only on the data and the ordering,
    not on partitioning.
    """
    order_cols = list(order_cols)
    out_schema = StructType(df.schema.fields + [StructField(pack_col, LongType(), False)])
    out_cols = [f.name for f in out_schema.fields]

    def pack(pdf):
        pdf = pdf.sort_values(order_cols, kind="mergesort").reset_index(drop=True)
        pack_ids = []
        pid, fill = 0, 0
        for i, sz in enumerate(pdf[size_col].astype("int64")):
            if i > 0 and fill + sz > budget:
                pid, fill = pid + 1, sz
            else:
                fill += sz
            pack_ids.append(pid)
        pdf[pack_col] = pack_ids
        return pdf[out_cols]

    return df.groupBy(group_col).applyInPandas(pack, schema=out_schema)
