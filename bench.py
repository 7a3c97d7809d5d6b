#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line.

Each query is forced end-to-end with a ``noop`` write (full plan
execution, no driver collect). The reported metric is total wall
seconds across the headline suite.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# Queries representative of the engine's surface: the full
# reconciliation pipeline plus the heaviest extension operators.
HEADLINE = [
    "validation_counts",
    "missing_ids",
    "join_pairs",
    "diff_integer",
    "diff_string_fuzzy",
    "diff_date",
    "report_summary",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    from validation_database_spark.session import get_spark
    from validation_database_spark.suite import all_specs

    spark = get_spark(app_name="bench")
    specs = all_specs()

    # Warm the JVM + parquet footers once so per-query times measure
    # the engine, not session startup.
    specs["validation_counts"].spark_fn(spark, sf_dir).collect()

    timings: dict[str, float] = {}
    extra = [n for n in specs if n not in HEADLINE and specs[n].headline]
    for name in HEADLINE + extra:
        if name not in specs:
            continue
        fn = specs[name].spark_fn
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
