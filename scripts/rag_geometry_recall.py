#!/usr/bin/env python
"""Measure the quantized RAG serving form's recall at a NON-default
IVF geometry (VERDICT r9 ask #4).

The pinned recall gates (tests/test_ann_recall.py) run at the oracle
geometry (RAG_NLIST=64) because the DuckDB oracle bakes the geometry
into its SQL. The round-9 production-geometry point
(SPARK_GRAFT_RAG_NLIST=256 ≈ √n at the 500k-doc replica, 20.3 s warm
vs 87.1 at the default) shipped with the honest caveat that its
QUALITY cost was unmeasured. This script measures it: brute truth
(geometry-independent float scoring) vs the quantized served top-k at
whatever geometry the environment pins.

    SPARK_GRAFT_RAG_NLIST=224 python scripts/rag_geometry_recall.py /tmp/spark_graft_sf1 [truth_dir]

``truth_dir`` (optional) caches the brute truth as parquet: the brute
scorer is geometry-INDEPENDENT (it never touches the IVF index), so
when comparing several geometries over the same corpus the expensive
truth pass runs once and every later invocation reads it back.

Prints one JSON line: {sf_dir, nlist, nprobe, assign, queries,
recall_at_k, strong_recall, strong_n, served_sec, brute_sec}.
Recall@k = |brute top-k ∩ served top-k| / |brute top-k|;
strong recall restricts the truth side to cos ≥ 0.9 neighbors — the
"must not miss" near-duplicates, the suite's pinned contract.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from validation_database_spark.session import get_spark
    from validation_database_spark.suite.similarity import (
        RAG_ASSIGN,
        RAG_CENT_CAP,
        RAG_N_PROBE,
        RAG_TOP_K,
        q_rag_retrieval,
        q_rag_retrieval_ivf_quant,
    )

    spark = get_spark(app_name="rag_geometry_recall")

    t0 = time.perf_counter()
    served = q_rag_retrieval_ivf_quant(spark, sf_dir)
    served.write.format("noop").mode("overwrite").save()
    served_sec = round(time.perf_counter() - t0, 2)

    truth_dir = sys.argv[2] if len(sys.argv) > 2 else None
    t0 = time.perf_counter()
    if truth_dir and os.path.exists(os.path.join(truth_dir, "_SUCCESS")):
        brute = spark.read.parquet(truth_dir)
        brute_sec = "cached"
    else:
        brute = q_rag_retrieval(spark, sf_dir)
        if truth_dir:
            brute.write.mode("overwrite").parquet(truth_dir)
            brute = spark.read.parquet(truth_dir)
        else:
            brute.write.format("noop").mode("overwrite").save()
        brute_sec = round(time.perf_counter() - t0, 2)

    keys = ["query_doc_id", "doc_id", "chunk_idx"]
    served_k = served.select(*keys)
    hits = brute.select(*keys).join(served_k, keys).count()
    total = brute.count()
    strong = brute.filter(F.col("cos_sim") >= 0.9)
    strong_total = strong.count()
    strong_hits = strong.select(*keys).join(served_k, keys).count()
    n_queries = brute.select("query_doc_id").distinct().count()
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "nlist": RAG_CENT_CAP,
                "nprobe": RAG_N_PROBE,
                "assign": RAG_ASSIGN,
                "top_k": RAG_TOP_K,
                "queries": n_queries,
                "recall_at_k": round(hits / max(total, 1), 4),
                "strong_recall": round(strong_hits / max(strong_total, 1), 4),
                "strong_n": strong_total,
                "served_sec": served_sec,
                "brute_sec": brute_sec,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
