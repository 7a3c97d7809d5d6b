"""Small shared plan utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Round-robin repartition to the session's default parallelism.

    The test fixtures are single-file, single-row-group parquet, so a
    scan yields ONE input partition and any expensive per-row work
    (shingling, md5, dot products) would run on one core. A cheap
    round-robin shuffle of the (small) source rows fans the compute
    across all cores. On a real cluster the input is already split
    across many files/row groups, so this is a tiny constant-cost
    shuffle — and for genuinely large single files it is still the
    correct move before CPU-heavy narrow transforms.
    """
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n)
