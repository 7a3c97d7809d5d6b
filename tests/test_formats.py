"""Source/sink format coverage: engine results roundtrip through
csv / json / orc / partitioned parquet without loss."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from validation_database_spark.fixtures import validation_pair
from validation_database_spark.operators.reconcile import reconcile


@pytest.fixture(scope="module")
def differing(spark, sf_dir):
    a, b = validation_pair(spark, sf_dir, "string")
    res = reconcile(a, b, check_column="check_col", mode="string")
    return res.differing


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_csv_roundtrip(spark, differing, tmp_path):
    path = str(tmp_path / "diff_csv")
    differing.write.mode("overwrite").option("header", True).csv(path)
    back = spark.read.schema(differing.schema).option("header", True).csv(path)
    assert _rows(back) == _rows(differing)


def test_json_roundtrip(spark, differing, tmp_path):
    path = str(tmp_path / "diff_json")
    differing.write.mode("overwrite").json(path)
    back = spark.read.schema(differing.schema).json(path)
    assert _rows(back) == _rows(differing)


def test_orc_roundtrip(spark, differing, tmp_path):
    path = str(tmp_path / "diff_orc")
    differing.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    assert _rows(back.select(*differing.columns)) == _rows(differing)


def test_partitioned_parquet_with_pruning(spark, sf_dir, tmp_path):
    """partitionBy layout + partition pruning: reading one partition
    must scan only that directory (pruning visible in the plan's
    partition count at scale; here we assert correctness + layout)."""
    a, _ = validation_pair(spark, sf_dir, "string")
    path = str(tmp_path / "by_check")
    a.withColumn("bucket", (F.crc32("id") % 4).cast("int")).write.mode(
        "overwrite"
    ).partitionBy("bucket").parquet(path)
    back = spark.read.parquet(path)
    one = back.filter(F.col("bucket") == 2)
    import glob
    import os

    assert glob.glob(os.path.join(path, "bucket=2", "*.parquet"))
    expected = a.withColumn("bucket", (F.crc32("id") % 4).cast("int")).filter(
        F.col("bucket") == 2
    )
    assert one.count() == expected.count() > 0


def test_export_jsonl_shards_bounds_and_roundtrip(spark, sf_dir, tmp_path):
    """Every shard must hold <= max_records rows (hard writer cap, not
    just the repartition hint) and the shard set must round-trip to
    the exact input rows."""
    from validation_database_spark.sources import load_table
    from validation_database_spark.sources.export import export_jsonl_shards

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text", "lang")
    out = str(tmp_path / "shards")
    cap = 120
    paths = export_jsonl_shards(docs, out, max_records_per_shard=cap)
    assert len(paths) >= 2, "fixture should produce multiple shards"

    import gzip
    import json as _json

    per_shard = []
    rows = {}
    for p in paths:
        with gzip.open(p, "rt") as f:
            lines = [_json.loads(line) for line in f]
        per_shard.append(len(lines))
        for r in lines:
            rows[r["doc_id"]] = (r["text"], r["lang"])
    assert max(per_shard) <= cap, per_shard
    expected = {r.doc_id: (r.text, r.lang) for r in docs.collect()}
    assert rows == expected


def test_export_hintless_runs_one_job(spark, sf_dir, tmp_path):
    """The hintless path must be exactly one Spark job (the write):
    no sizing count — which would recompute the whole upstream DAG
    once per export. maxRecordsPerFile alone enforces the per-file
    cap, so the extra job bought nothing."""
    from validation_database_spark.sources import load_table
    from validation_database_spark.sources.export import export_jsonl_shards

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "lang")
    sc = spark.sparkContext
    sc.setJobGroup("export_job_count", "hintless export")
    try:
        paths = export_jsonl_shards(
            docs, str(tmp_path / "one_job"), max_records_per_shard=100
        )
    finally:
        sc.setJobGroup(None, None)
    jobs = sc.statusTracker().getJobIdsForGroup("export_job_count")
    assert len(jobs) == 1, f"hintless export ran {len(jobs)} jobs: {jobs}"
    assert paths, "export must produce shards"


def test_export_rejects_nonpositive_record_caps(spark, sf_dir, tmp_path):
    """Regression (round-4 advisory): an explicit 0 cap must be
    rejected loudly on BOTH export sinks — Spark reads
    maxRecordsPerFile <= 0 as 'no limit', which would silently void
    the documented at-most bound."""
    import pytest

    from validation_database_spark.sources import load_table
    from validation_database_spark.sources.export import (
        export_jsonl_shards,
        write_partitioned_parquet,
    )

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "lang")
    with pytest.raises(ValueError, match="max_records_per_shard must be > 0"):
        export_jsonl_shards(docs, str(tmp_path / "x"), max_records_per_shard=0)
    with pytest.raises(ValueError, match="max_records_per_file must be > 0"):
        write_partitioned_parquet(
            docs, str(tmp_path / "y"), ["lang"], max_records_per_file=0
        )
