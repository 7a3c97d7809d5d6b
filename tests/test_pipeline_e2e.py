"""End-to-end training-data export: quality-filter → chunk → split →
write split-partitioned parquet shards → read back and account for
every chunk. The integration seam test across the corpus operators."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from validation_database_spark.suite.pipeline import TRAIN_HEX, VAL_HEX
from validation_database_spark.suite.text import q_text_chunks, q_text_quality


def test_chunk_split_export_roundtrip(spark, sf_dir, tmp_path):
    quality = q_text_quality(spark, sf_dir).filter(F.col("quality_keep"))
    chunks = q_text_chunks(spark, sf_dir)
    kept_chunks = chunks.join(quality.select("doc_id"), "doc_id")

    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
    split = F.when(h < TRAIN_HEX, "train").when(h < VAL_HEX, "val").otherwise("test")
    dataset = kept_chunks.withColumn("split", split)

    out = str(tmp_path / "training_shards")
    dataset.write.mode("overwrite").partitionBy("split").parquet(out)

    # physical layout: one directory per split
    layout = {os.path.basename(p) for p in glob.glob(os.path.join(out, "split=*"))}
    assert layout == {"split=train", "split=val", "split=test"}

    back = spark.read.parquet(out)
    # every kept chunk exported exactly once
    assert back.count() == dataset.count() > 0
    # split assignment is a pure function of doc_id: any doc's chunks
    # all land in one split
    multi = (
        back.groupBy("doc_id")
        .agg(F.countDistinct("split").alias("n_splits"))
        .filter(F.col("n_splits") > 1)
        .count()
    )
    assert multi == 0
    # reading one split scans only its directory (partition pruning)
    train_only = spark.read.parquet(out).filter(F.col("split") == "train")
    expected_train = dataset.filter(F.col("split") == "train").count()
    assert train_only.count() == expected_train > 0


def test_weighted_reservoir_biases_toward_heavy_docs(spark, sf_dir):
    """The A-ES reservoir draws with probability ∝ n_chars, so the
    sampled docs' mean length must exceed the corpus mean (the uniform
    stratified sample is the unbiased control)."""
    from validation_database_spark.sources import load_table
    from validation_database_spark.suite.pipeline import (
        RESERVOIR_K,
        q_sample_reservoir_weighted,
    )

    sample = q_sample_reservoir_weighted(spark, sf_dir)
    per_lang = sample.groupBy("lang").agg(
        F.count("*").alias("n"), F.avg("n_chars").alias("avg_sampled")
    )
    corpus = (
        load_table(spark, "documents", sf_dir)
        .groupBy("lang")
        .agg(F.avg("n_chars").alias("avg_corpus"), F.count("*").alias("n_docs"))
    )
    rows = per_lang.join(corpus, "lang").collect()
    assert rows
    for r in rows:
        assert r["n"] == min(RESERVOIR_K, r["n_docs"])
        # length-weighted draw: sampled mean above corpus mean per stratum
        assert r["avg_sampled"] > r["avg_corpus"], r["lang"]
