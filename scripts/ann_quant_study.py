#!/usr/bin/env python
"""Measure whether the round-9 cogroup + local-top-k lesson pays for
ann_topk's IVF probe scoring and for IVF-PQ (VERDICT r9 ask #2).

The RAG study proved the e6-int64 cogrouped matmul wins exactly when
PAIR SCORING dominates the wall (8.4× at the 500k-doc replica, where
the scored frame is 1.2B pairs). ann_topk's serving arm has a very
different cost profile: the query set is vec_id % 100 (so candidates
per query track nprobe/nlist × n ≈ 3%), and the corpus is the
embeddings table (100k vectors at the 100× replica), so the scored
frame is ~10⁶–10⁷ pairs, not 10⁹. This script measures, at a replica
dir built by scripts/make_scale_data.py:

1. the float IVF arm (`q_ann_ivf_cosine`) cold/warm, with its
   assignment-only and scored-pair-count decomposition;
2. a quantized cogrouped prototype of the same arm (reusing
   `_topk_cells_explode` for assignment/probing and an int64
   cogroup matmul with per-group local top-k for scoring) cold/warm,
   plus its top-k agreement with the float arm;
3. `q_ann_ivfpq` cold/warm with its candidate-count decomposition.

Prints one JSON line per phase. The ship/no-ship decision and the
numbers land in SCALE.md round 10.

    python scripts/ann_quant_study.py /tmp/spark_graft_sf10

``--phases float,quant,agree,ivfpq`` selects phases (default all):
at the 1M-vector point the float arm is minutes per run, so the
agreement re-runs (two extra executions per side) are opt-in.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F  # noqa: E402


def timed(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 2)


def quant_ivf_topk(spark, sf_dir):
    """Prototype: the IVF arm with all three pairwise stages in the
    e6-int64 domain — assignment (k=1, so no redundant-assignment
    dedup is needed), probing (k=N_PROBE), and pair scoring as a
    cogrouped-by-cell matmul emitting each group's per-query local
    top-K. No salt: at nlist=64 over 100k vectors a cell is ~1.5k
    rows — far below the Arrow batch hazard the RAG salt exists for
    (a production twin would carry the same RAG_COGROUP_SALT knob)."""
    from validation_database_spark.suite.similarity import (
        CENTROID_CAP,
        CENTROID_MOD,
        CENTROID_OFF,
        N_PROBE,
        QUERY_MOD,
        TOP_K,
        _to_e6,
        _topk_cells_explode,
        _unit_emb,
    )
    from pyspark.sql.window import Window

    emb = _unit_emb(spark, sf_dir).select(
        "vec_id", _to_e6(F.col("u")).alias("x")
    )
    cents = emb.filter(
        (F.col("vec_id") % CENTROID_MOD == CENTROID_OFF)
        & (F.col("vec_id") < CENTROID_MOD * CENTROID_CAP)
    ).select(F.col("vec_id").alias("cent_id"), F.col("x").alias("cx"))
    cent_rows = sorted(cents.collect(), key=lambda r: r["cent_id"])

    assigned = _topk_cells_explode(
        emb, "x", cent_rows, "cent_id", "cx", 1, keep_cells=False
    )
    queries = emb.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("x").alias("qx")
    )
    probes = _topk_cells_explode(
        queries, "qx", cent_rows, "cent_id", "cx", N_PROBE, keep_cells=False
    )

    def score(vec_pdf: pd.DataFrame, probe_pdf: pd.DataFrame):
        empty = {
            "query_id": np.empty(0, dtype=np.int64),
            "vec_id": np.empty(0, dtype=np.int64),
            "s_e12": np.empty(0, dtype=np.int64),
        }
        if len(vec_pdf) == 0 or len(probe_pdf) == 0:
            return pd.DataFrame(empty)
        X = np.array(vec_pdf["x"].tolist(), dtype=np.int64)
        Q = np.array(probe_pdf["qx"].tolist(), dtype=np.int64)
        vids = vec_pdf["vec_id"].to_numpy()
        qids = probe_pdf["query_id"].to_numpy()
        S = X @ Q.T  # exact int64
        vi, qi = np.nonzero(vids[:, None] != qids[None, :])
        q_out, v_out, s_out = qids[qi], vids[vi], S[vi, qi]
        order = np.lexsort((v_out, -s_out, q_out))
        qs = q_out[order]
        pos = np.arange(len(qs))
        first = np.r_[True, qs[1:] != qs[:-1]]
        start = np.maximum.accumulate(np.where(first, pos, 0))
        top = order[(pos - start) < TOP_K]
        return pd.DataFrame(
            {"query_id": q_out[top], "vec_id": v_out[top], "s_e12": s_out[top]}
        )

    scored = (
        assigned.groupby("cent_id")
        .cogroup(probes.groupby("cent_id"))
        .applyInPandas(score, "query_id bigint, vec_id bigint, s_e12 bigint")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("s_e12").desc(), "vec_id")
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= TOP_K)
    )


def main() -> None:
    argv = list(sys.argv[1:])
    phases = {"float", "quant", "agree", "ivfpq"}
    if "--phases" in argv:
        i = argv.index("--phases")
        phases = set(argv[i + 1].split(","))
        del argv[i : i + 2]
        # agree is computed inside the quant phase (it compares the
        # two arms' outputs) — requesting it implies quant, otherwise
        # `--phases agree` would be a silent no-op (ADVICE r10).
        if "agree" in phases:
            phases.add("quant")
    # --lean: skip the rows-count pass (a third FULL execution — at
    # the 2M-vector decade that is ~an hour that adds nothing the
    # 100k agreement row doesn't already pin); --cold-only further
    # skips the warm pass (round 11: one cold execution is the
    # comparison point against r10's terminated-at-7,063-s cold).
    lean = "--lean" in argv
    cold_only = "--cold-only" in argv
    argv = [a for a in argv if a not in ("--lean", "--cold-only")]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"

    from validation_database_spark.session import get_spark
    from validation_database_spark.suite.similarity import (
        q_ann_ivf_cosine,
        q_ann_ivfpq,
    )
    from validation_database_spark.util import release_pins

    spark = get_spark(app_name="ann_quant_study")

    # ---- phase 1: the float IVF arm, decomposed ----
    if "float" in phases:
        flt = q_ann_ivf_cosine(spark, sf_dir)
        out = {"phase": "float_ivf", "cold": timed(flt)}
        if not cold_only:
            out["warm"] = timed(q_ann_ivf_cosine(spark, sf_dir))
        if not (lean or cold_only):
            out["rows"] = q_ann_ivf_cosine(spark, sf_dir).count()
        print(json.dumps(out), flush=True)
        release_pins()

    # ---- phase 2: quantized cogroup form ----
    # Measures the SHIPPED q_ann_ivf_quant when available (the sf1 /
    # sf10 decision rows in SCALE.md round 10 were measured with the
    # pre-ship prototype above — identical plan minus the salt
    # column; quant_ivf_topk is kept as that study artifact).
    if "quant" in phases:
        try:
            from validation_database_spark.suite.similarity import (
                q_ann_ivf_quant as quant_fn,
            )
        except ImportError:
            quant_fn = quant_ivf_topk
        qv = quant_fn(spark, sf_dir)
        qcold = timed(qv)
        qwarm = timed(quant_fn(spark, sf_dir))
        out = {"phase": "quant_ivf", "cold": qcold, "warm": qwarm}
        if "agree" in phases:
            # top-k agreement with the float arm (set overlap per query)
            keys = ["query_id", "vec_id"]
            f_k = q_ann_ivf_cosine(spark, sf_dir).select(*keys)
            q_k = quant_fn(spark, sf_dir).select(*keys)
            inter = f_k.join(q_k, keys).count()
            tot = f_k.count()
            out["agree"] = round(inter / max(tot, 1), 4)
            out["float_rows"] = tot
        print(json.dumps(out), flush=True)
        release_pins()

    # ---- phase 3: IVF-PQ ----
    if "ivfpq" in phases:
        pq_cold = timed(q_ann_ivfpq(spark, sf_dir))
        pq_warm = timed(q_ann_ivfpq(spark, sf_dir))
        print(json.dumps({"phase": "ivfpq", "cold": pq_cold,
                          "warm": pq_warm}), flush=True)
        release_pins()

    # box control, same workload as bench.calibration_point
    df = spark.range(0, 20_000_000, 1, 32).selectExpr(
        "sum(cast(conv(substr(md5(cast(id as string)), 1, 8), 16, 10)"
        " as bigint)) as s"
    )
    t0 = time.perf_counter()
    df.collect()
    df2 = spark.range(0, 20_000_000, 1, 32).selectExpr(
        "sum(cast(conv(substr(md5(cast(id as string)), 1, 8), 16, 10)"
        " as bigint)) as s"
    )
    t1 = time.perf_counter()
    df2.collect()
    print(json.dumps({"phase": "calibration",
                      "sec": round(time.perf_counter() - t1, 4),
                      "cold_sec": round(t1 - t0, 4)}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
