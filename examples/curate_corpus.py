#!/usr/bin/env python
"""End-to-end training-corpus curation: the LLM-data pipeline this
engine's operators compose into, as ONE lazy Spark DAG per stage.

    python examples/curate_corpus.py [sf_dir] [out_dir]

Stages (each a suite operator, individually oracle-verified):

1. FILTER   — C4-style quality funnel predicates (length, language,
              token count, unique-token ratio) + linear
              quality-classifier score.
2. CLEAN    — corpus-wide line dedup, dropping boilerplate lines and
              rewriting the surviving text.
3. DEDUP    — MinHash-LSH near-duplicate clusters over the cleaned
              corpus; one representative kept per cluster.
4. SEMDEDUP — hierarchical SemDeDup over the document embeddings (the
              two-level router, measured linear-class over two
              decades in SCALE.md's round-8 slope study — the
              exact-Lloyd form stays the certification baseline);
              knobs: SPARK_GRAFT_SEMDEDUP_COARSE, see README.
5. EXAMPLES — T5 span-corruption (input, target) pairs from the
              survivors.
6. EXPORT   — gzip JSONL shards via the executor-written export path.

Every stage stays declarative (filters, hash joins, windows) — the
same plan shapes the suite pins in tests/test_plans.py — so the
pipeline inherits pushdown, map-side combining, and broadcast wins
end to end.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from validation_database_spark.session import get_spark
from validation_database_spark.sources import load_table
from validation_database_spark.sources.export import export_jsonl_shards
from validation_database_spark.suite.dedup import q_dedup_minhash_lsh
from validation_database_spark.suite.similarity import semantic_dedup_hier_frame
from validation_database_spark.suite.quality import (
    FUNNEL_LANGS,
    FUNNEL_MIN_CHARS,
)
from validation_database_spark.suite.text import (
    q_line_dedup_rewrite,
    q_quality_classifier,
    q_span_corruption,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="curated_")
    spark = get_spark(app_name="curate_corpus")

    docs = load_table(spark, "documents", sf_dir)
    n0 = docs.count()

    # 1. FILTER — funnel predicates + classifier keep flag
    keep = q_quality_classifier(spark, sf_dir).filter("keep").select("doc_id")
    filtered = (
        docs.filter(F.col("n_chars") >= FUNNEL_MIN_CHARS)
        .filter(F.col("lang").isin(*FUNNEL_LANGS))
        .join(keep, "doc_id", "left_semi")
    )
    n1 = filtered.count()

    # 2. CLEAN — line-dedup rewrite stats (clean_chars > 0 survivors)
    cleaned = q_line_dedup_rewrite(spark, sf_dir).filter("clean_chars > 0")
    n2 = filtered.join(cleaned.select("doc_id"), "doc_id", "left_semi").count()

    # 3. DEDUP — drop every near-duplicate that is not its pair's min id
    pairs = q_dedup_minhash_lsh(spark, sf_dir)
    losers = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    survivors = (
        filtered.join(cleaned.select("doc_id"), "doc_id", "left_semi")
        .join(losers, "doc_id", "left_anti")
    )
    n3 = survivors.count()

    # 4. SEMDEDUP — semantic near-dup prune via the hierarchical
    # scale path (embeddings carry one vector per doc: vec_id==doc_id)
    emb = load_table(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    sem_kept = (
        semantic_dedup_hier_frame(emb)
        .filter("keep")
        .select(F.col("vec_id").alias("doc_id"))
    )
    survivors = survivors.join(sem_kept, "doc_id", "left_semi")
    n3b = survivors.count()

    # 5. EXAMPLES — span-corruption pairs for the survivors
    examples = q_span_corruption(spark, sf_dir).join(
        survivors.select("doc_id"), "doc_id", "left_semi"
    )
    n4 = examples.count()

    # 6. EXPORT — gzip JSONL shards
    stats = export_jsonl_shards(
        examples, os.path.join(out_dir, "examples"), shards_hint=2
    )

    print(f"docs:               {n0}")
    print(f"after filter:       {n1}")
    print(f"after clean:        {n2}")
    print(f"after near-dedup:   {n3}")
    print(f"after sem-dedup:    {n3b}")
    print(f"training examples:  {n4}")
    print(f"exported:           {stats} -> {out_dir}/examples")
    spark.stop()


if __name__ == "__main__":
    main()
