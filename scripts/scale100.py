#!/usr/bin/env python
"""100x scale run (VERDICT r3 ask #5): time the flagship reconcile and
the primary dedup/ANN scale paths against a ~sf10 derivative of the
sf0.1 fixtures (60M lineitem / 15M orders / 500k documents / 100k
embeddings / 10M events — built by ``scripts/make_scale_data.py
/tmp/spark_graft_sf10 100``), so the complexity-class claims in
SCALE.md are measured past 10x instead of extrapolated.

Each query is timed cold (first plan+run) and warm (steady state),
exactly like bench.py: a ``noop`` write executes the full plan with no
driver collect. Prints one JSON line.

Usage: python scripts/scale100.py [sf_dir] [--only a,b,c]
"""

from __future__ import annotations

import json
import os
import sys
import time

# The stress harness sizes its heap for the stress SF: 8g (the
# engine-wide default) is borderline for the ~sf10 replica's biggest
# pair joins on local[32] — unit_semantic_dedup OOMed under the
# cold+warm+count triple pass at 8g (round 7, reproduced on unchanged
# code) while passing in a single-run session. 16g is the measured
# comfortable floor on this 128 GiB box; SPARK_DRIVER_MEMORY still
# overrides.
os.environ.setdefault("SPARK_DRIVER_MEMORY", "16g")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from validation_database_spark.session import get_spark  # noqa: E402
from validation_database_spark.sources import load_table  # noqa: E402
from validation_database_spark.sources.registry import TABLES  # noqa: E402
from validation_database_spark.suite import all_specs, unit_specs  # noqa: E402
from validation_database_spark.suite.similarity import (  # noqa: E402
    q_ann_ivf_cosine,
)

# The scale-path queries the r3 verdict names, plus the LSH serving
# path. ann_ivf is the IVF side alone (ann_topk unions in the
# brute-force baseline, which is deliberately O(n*q) and would just
# measure the baseline, not the scale path).
DEFAULT = [
    "validation_counts",
    "dedup_ngram_df_capped",
    "dedup_minhash_lsh",
    "ann_ivf",
    "unit_ann_lsh",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf10"
    only = DEFAULT
    if "--only" in sys.argv:
        only = sys.argv[sys.argv.index("--only") + 1].split(",")

    spark = get_spark(app_name="scale100")
    specs = all_specs()
    specs.update(unit_specs())
    fns = {n: s.spark_fn for n, s in specs.items()}
    fns["ann_ivf"] = q_ann_ivf_cosine

    # touch every table's footer so cold timings measure the engine
    for t in TABLES:
        if os.path.exists(os.path.join(sf_dir, f"{t}.parquet")):
            load_table(spark, t, sf_dir).limit(1).collect()

    # Box-speed controls (same instruments as bench.py) so sf10 rows
    # are cross-session comparable — the r6 dedup_incremental read was
    # un-adjudicatable without them.
    from bench import calibration_point, calibration_point_1t

    calibration_point(spark)
    calibration = calibration_point(spark)
    calibration_point_1t(spark)
    calibration_1t = calibration_point_1t(spark)

    cold: dict[str, float] = {}
    warm: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name in only:
        fn = fns[name]
        try:
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            cold[name] = round(time.perf_counter() - t0, 2)
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            warm[name] = round(time.perf_counter() - t0, 2)
            rows[name] = fn(spark, sf_dir).count()
            print(
                f"{name}: cold {cold[name]} s, warm {warm[name]} s, "
                f"{rows[name]} rows",
                file=sys.stderr,
            )
        except Exception as exc:  # keep timing the rest of the list
            print(f"{name}: FAILED {type(exc).__name__}", file=sys.stderr)
            rows[name] = -1
        finally:
            # release in finally (ADVICE r7): a FAILED spec must also
            # drop its pins, or its cached frames erode the 16g
            # headroom the OOM mitigation above provides.
            from validation_database_spark.util import release_pins

            release_pins()

    print(json.dumps({
        "sf_dir": sf_dir, "cold": cold, "warm": warm, "rows": rows,
        "calibration_sec": calibration, "calibration_1t_sec": calibration_1t,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
