#!/usr/bin/env python
"""End-to-end RAG retrieval serving: the chunk → index → query path
this engine's similarity operators compose into.

    python examples/rag_serving.py [sf_dir]

Stages (each a suite operator, individually oracle-verified):

1. CHUNK    — sliding-window passages over the document corpus
              (``text_chunks``' 64/16 shape), hashed-BoW embedded and
              UNIT-NORMALIZED at build time (so serving scores one
              dot product per pair, not three reductions).
2. INDEX    — IVF cell assignment: every chunk assigned to its
              nearest deterministic centroid ONCE (the build-side
              cost SCALE.md's serving decomposition amortizes). The
              headline form quantizes to the e6 int64 domain here,
              so every downstream dot is exact integer arithmetic.
3. SERVE    — queries probe their ``RAG_N_PROBE`` nearest cells and
              score only chunks in those cells — the scan fraction is
              nprobe/nlist, the difference between a cost model you
              can budget and an infeasible brute crossJoin at corpus
              scale. The quantized form scores each cell as one
              salted cogrouped int64 matmul with per-slice local
              top-k (8.4x the float fold's wall at the sf10 replica,
              SCALE.md round 9).
4. AUDIT    — the brute-force scorer (the exactness baseline the
              driver hash-checks as ``unit_rag_retrieval``) replays a
              sample of queries; recall@k of the served path against
              it is printed (the floor is pinned in
              tests/test_ann_recall.py).

The quantized serving form is the driver-checked ``rag_retrieval``
headline entry (since round 10); the float fold stays registered as
``rag_retrieval_float_baseline``. This example only arranges the same
operators into the build-once/serve-many shape a production
deployment uses.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from validation_database_spark.session import get_spark
    from validation_database_spark.suite.similarity import (
        RAG_TOP_K,
        q_rag_retrieval,
        q_rag_retrieval_ivf,
        q_rag_retrieval_ivf_quant,
    )

    spark = get_spark(app_name="rag_serving")

    t0 = time.perf_counter()
    served = q_rag_retrieval_ivf_quant(spark, sf_dir)
    served.write.format("noop").mode("overwrite").save()
    t_served = time.perf_counter() - t0

    t0 = time.perf_counter()
    float_served = q_rag_retrieval_ivf(spark, sf_dir)
    float_served.write.format("noop").mode("overwrite").save()
    t_float = time.perf_counter() - t0

    t0 = time.perf_counter()
    brute = q_rag_retrieval(spark, sf_dir)
    brute.write.format("noop").mode("overwrite").save()
    t_brute = time.perf_counter() - t0

    keys = ["query_doc_id", "doc_id", "chunk_idx"]
    hits = brute.select(*keys).join(served.select(*keys), keys).count()
    total = brute.count()
    strong = brute.filter(F.col("cos_sim") >= 0.9)
    strong_total = strong.count()
    strong_hits = strong.select(*keys).join(served.select(*keys), keys).count()
    n_queries = brute.select("query_doc_id").distinct().count()
    print(
        f"queries={n_queries} top_k={RAG_TOP_K} "
        f"served_quant={t_served:.2f}s served_float={t_float:.2f}s "
        f"brute={t_brute:.2f}s "
        f"recall@{RAG_TOP_K}={hits / max(total, 1):.3f} "
        f"strong_recall={strong_hits / max(strong_total, 1):.3f} "
        f"(strong n={strong_total})"
    )
    print(
        "note: at fixture scale the ONE-TIME index build (and the "
        "quantized form's fixed Python-stage launches) dominates the "
        "served walls; SCALE.md's serving decomposition measures the "
        "crossover — the quant/float gap is parity at sf1 and 8.4x by "
        "sf10. Background recall tracks nprobe/nlist on near-uniform "
        "vectors; the pinned contract is strong-neighbor recall "
        "(tests/test_ann_recall.py)."
    )
    spark.stop()


if __name__ == "__main__":
    main()
