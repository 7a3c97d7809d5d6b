#!/usr/bin/env python
"""Round-13 A/B: the row-local RAG float form (current) vs the r11
aggregation form (from git history, loaded as a scratch module) —
VERDICT r12 ask #2. Interleaved cold/warm noop-sink trials in ONE
session so box drift hits both arms equally; calibration printed per
trial. Also asserts both forms return identical rows first.

Usage: SPARK_GRAFT_SF_DIR=... python scripts/r13_ragfloat_ab.py [trials]
"""
from __future__ import annotations

import importlib.util
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from validation_database_spark.session import get_spark
    from validation_database_spark.suite.similarity import q_rag_retrieval_ivf

    spec = importlib.util.spec_from_file_location(
        "similarity_r11", "/tmp/similarity_r11.py"
    )
    old_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(old_mod)

    spark = get_spark(app_name="r13_ragfloat_ab")
    # value identity first
    new_rows = sorted(map(tuple, q_rag_retrieval_ivf(spark, SF_DIR).collect()))
    old_rows = sorted(map(tuple, old_mod.q_rag_retrieval_ivf(spark, SF_DIR).collect()))
    assert new_rows == old_rows, "forms disagree!"
    print(f"value identity OK ({len(new_rows)} rows)", flush=True)

    import bench

    forms = {"r11agg": old_mod.q_rag_retrieval_ivf, "rowlocal": q_rag_retrieval_ivf}
    for t in range(trials):
        for name, fn in forms.items():
            cal = bench.calibration_point(spark)
            times = []
            for tag in ("cold", "warm"):
                spark.sparkContext.setJobDescription(f"{name}:{tag}:{t}")
                t0 = time.perf_counter()
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                times.append(round(time.perf_counter() - t0, 2))
            print(
                f"trial {t} {name:9s} cold {times[0]:5.2f} warm {times[1]:5.2f}"
                f"  cal {cal:.3f}",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
