"""Partitioned-layout write path + the pruning proof: a filter on the
partition column must become a PartitionFilter (directory pruning),
and only the matching partition's files may appear in the scan."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from validation_database_spark.plans import physical_plan
from validation_database_spark.sources import load_table
from validation_database_spark.sources.export import write_partitioned_parquet


def test_partition_filter_prunes_directories(spark, sf_dir, tmp_path):
    docs = load_table(spark, "documents", sf_dir)
    out = str(tmp_path / "docs_by_lang")
    write_partitioned_parquet(docs, out, ["lang"])

    # layout: one directory per language
    dirs = sorted(d for d in os.listdir(out) if d.startswith("lang="))
    assert len(dirs) >= 2, dirs

    back = spark.read.parquet(out).filter(F.col("lang") == "en")
    plan = physical_plan(back)
    assert "PartitionFilters" in plan and "lang" in plan.split("PartitionFilters", 1)[1][:200], plan
    # the partition predicate must NOT degrade to a post-scan filter
    # on rows: en-only count equals the partition directory's rows
    n_en = back.count()
    n_dir = spark.read.parquet(os.path.join(out, "lang=en")).count()
    assert n_en == n_dir > 0


def test_partitioned_roundtrip_preserves_rows(spark, sf_dir, tmp_path):
    docs = load_table(spark, "documents", sf_dir)
    out = str(tmp_path / "docs_rt")
    write_partitioned_parquet(docs, out, ["lang"], max_records_per_file=100)
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    got = {r["lang"] for r in back.select("lang").distinct().collect()}
    want = {r["lang"] for r in docs.select("lang").distinct().collect()}
    assert got == want
