#!/usr/bin/env python
"""Quickstart: the engine's three public surfaces in one script.

    python examples/quickstart.py [sf_dir]

1. Reconciliation (the reference workload): two sources → missing ids
   + differing values + CSV reports.
2. Corpus ops: near-dup detection with MinHash-LSH → duplicate
   clusters.
3. Similarity search: IVF cosine top-k.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from validation_database_spark.config import run_validation
from validation_database_spark.session import get_spark
from validation_database_spark.suite.dedup import q_dedup_clusters, q_dedup_minhash_lsh
from validation_database_spark.suite.similarity import q_ann_ivf_cosine


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="quickstart")

    # 1. reconcile two (here: identical) order tables, reference-style config
    out = tempfile.mkdtemp(prefix="vdb_report_")
    cfg = {
        "databases": ["dbA", "dbB"],
        "data_type": "string",
        "check_column": "o_orderpriority",
        "unique_key": ["o_orderkey"],
        "threshold": 1,
        "dbA_table_name": "orders",
        "dbB_table_name": "orders",
        "dbA_source": {"format": "parquet", "path": sf_dir},
        "dbB_source": {"format": "parquet", "path": sf_dir},
        "output": os.path.join(out, "report.csv"),
    }
    run = run_validation(spark, cfg)
    print(
        f"[reconcile] missing_in_A={run.result.missing_in_first.count()} "
        f"missing_in_B={run.result.missing_in_second.count()} "
        f"differing={run.result.differing.count()} reports={run.output}"
    )

    # 2. near-dup pairs + clusters over the documents corpus
    pairs = q_dedup_minhash_lsh(spark, sf_dir)
    print(f"[dedup] MinHash-LSH near-dup pairs: {pairs.count()}")
    clusters = q_dedup_clusters(spark, sf_dir)
    print("[dedup] largest duplicate clusters:")
    clusters.orderBy("cluster_size", ascending=False).show(5, truncate=False)

    # 3. similarity search
    ann = q_ann_ivf_cosine(spark, sf_dir)
    print("[ann] IVF cosine top-k (first query):")
    ann.orderBy("query_id", "rk").show(10, truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
