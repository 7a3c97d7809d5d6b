#!/usr/bin/env python
"""Per-stage wall/shuffle attribution for one or more bench specs.

Runs each named spec with a noop sink in a session with event logging
enabled, then parses the event log into a per-stage table: stage id,
duration, task count, shuffle read/write bytes, and the first line of
the stage's callsite. This is the guide-§1 empirical loop without the
UI (spark.ui is disabled in the engine session factory).

Usage: SPARK_GRAFT_SF_DIR=... python scripts/profile_stages.py name [name ...]
Each spec is run twice (cold + warm); stages are grouped per run.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
EVDIR = "/tmp/spark_graft_events"


def main() -> None:
    names = sys.argv[1:]
    os.makedirs(EVDIR, exist_ok=True)
    import shutil

    for f in glob.glob(os.path.join(EVDIR, "*")):
        shutil.rmtree(f) if os.path.isdir(f) else os.remove(f)

    from validation_database_spark.session import get_spark
    from validation_database_spark.suite import all_specs, unit_specs
    from validation_database_spark.util import release_pins

    spark = get_spark(
        app_name="profile_stages",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVDIR,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    specs = all_specs()
    specs.update(unit_specs())
    specs["validation_counts"].spark_fn(spark, SF_DIR).collect()

    marks: list[tuple[str, float, float]] = []
    for name in names:
        for run in ("cold", "warm"):
            spark.sparkContext.setJobDescription(f"{name}:{run}")
            t0 = time.time()
            specs[name].spark_fn(spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            marks.append((f"{name}:{run}", t0 * 1000, time.time() * 1000))
            print(f"{name}:{run}: {(marks[-1][2]-marks[-1][1])/1000:.2f}s")
        release_pins()
    spark.stop()

    # parse the event log
    stages = {}  # id -> dict
    for path in glob.glob(os.path.join(EVDIR, "*")):
        if os.path.isdir(path):
            continue
        for line in open(path):
            try:
                ev = json.loads(line)
            except Exception:
                continue
            e = ev.get("Event")
            if e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                sub = si.get("Submission Time")
                comp = si.get("Completion Time")
                scopes = []
                for rdd in si.get("RDD Info", []):
                    sc = rdd.get("Scope")
                    if sc:
                        try:
                            nm = json.loads(sc).get("name")
                        except Exception:
                            nm = None
                        if nm and nm not in scopes:
                            scopes.append(nm)
                st = stages.setdefault(
                    sid, {"sr": 0, "sw": 0, "spill": 0, "cpu": 0}
                )
                st.update(
                    {
                        "sub": sub,
                        "comp": comp,
                        "tasks": si.get("Number of Tasks"),
                        "name": " ".join(reversed(scopes))[:110],
                    }
                )
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                m = ev.get("Task Metrics") or {}
                st = stages.setdefault(sid, {"sr": 0, "sw": 0, "spill": 0, "cpu": 0})
                st["sr"] += (m.get("Shuffle Read Metrics") or {}).get(
                    "Remote Bytes Read", 0
                ) + (m.get("Shuffle Read Metrics") or {}).get("Local Bytes Read", 0)
                st["sw"] += (m.get("Shuffle Write Metrics") or {}).get(
                    "Shuffle Bytes Written", 0
                )
                st["spill"] += m.get("Disk Bytes Spilled", 0)
                st["cpu"] += m.get("Executor CPU Time", 0) / 1e6  # ns->ms

    for label, t0, t1 in marks:
        print(f"\n=== {label} ({(t1-t0)/1000:.2f}s wall) ===")
        run_stages = [
            (sid, st)
            for sid, st in sorted(stages.items())
            if st.get("sub") and t0 <= st["sub"] <= t1
        ]
        for sid, st in run_stages:
            dur = (st["comp"] - st["sub"]) / 1000 if st.get("comp") else -1
            print(
                f"  s{sid:<4} {dur:6.2f}s tasks={st.get('tasks', '?'):<4} "
                f"cpu={st['cpu']/1000:6.1f}s sr={st['sr']>>10}K sw={st['sw']>>10}K "
                f"{st.get('name', '')}"
            )
        total = sum(
            (st["comp"] - st["sub"]) / 1000 for _, st in run_stages if st.get("comp")
        )
        print(f"  stage-time sum: {total:.2f}s over {len(run_stages)} stages")


if __name__ == "__main__":
    main()
