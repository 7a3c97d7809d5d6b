#!/usr/bin/env python
"""sf100 LSH full-verify, chunked so scratch never exceeds the box
(VERDICT r10 ask #7 / SCALE.md round 8 "where the BOX ends").

Round 8 located the single-box ceiling for `dedup_minhash_lsh`'s
census verify: at 5M docs the exact-Jaccard join shuffles the
exploded shingle stream for BOTH sides of ~47M candidate pairs and
overflows the sandbox's 79 GB local disk mid-verify ("No space left
on device") — a failure mode a 1000-executor cluster doesn't have
(the same scratch spreads to ~100 MB/node). The plan itself is
hash-partitioned and spill-friendly; only the AGGREGATE scratch
exceeds one box.

This instrument completes the census on one box by bounding scratch
by candidate-pair chunks, exploiting two facts:

* candidate generation (shingle -> signatures -> bands -> bucket
  join) COMPLETED at sf100 in round 8 — only the verify join blew
  the disk; so phase A runs it once and persists the ~47M
  (id_a, id_b) pairs as parquet bucketed by ``crc32(id_a) % C``
  (tiny: two bigints per row);
* the verify join touches only shingles of docs that appear in the
  pair set, and the shingle EXPLODE is a map-only projection over
  the docs scan (the expensive stage is the signature AGGREGATION,
  which phase B never re-runs) — so each chunk re-derives the
  shingle stream and semi-join-restricts it to its own docs.
  Per-chunk shuffle scratch is ~total/C.

Each chunk runs in a FRESH JVM (subprocess): Spark's local-dir
shuffle files are only reclaimed at JVM shutdown (spark.stop()
keeps the py4j JVM alive — the round-8 instrument pitfall), so
in-session chunking would accumulate exactly the scratch it is
trying to bound.

The chunk math is the production pattern for any census audit whose
aggregate scratch exceeds the fleet: verify(pairs) == UNION over k
of verify(pairs where hash(id_a)%C==k), because jaccard_verify is
row-local in pairs — sizes and shingle sets are per-doc facts,
restricted per chunk by a doc_id semi-join that keeps every
retained doc's FULL shingle set. Equivalence is pinned by
tests/test_scale_machinery.py::test_lsh_chunked_verify_equals_census
at sf0.01.

Usage:
  python scripts/lsh_chunked_verify.py <sf_dir> [--chunks C]
      [--workdir DIR] [--phase a|b|all] [--chunk K]

Driver mode (default --phase all) runs phase A in-process, then one
subprocess per chunk, and prints one JSON line with the census
totals. Deployment sizing (the sf30/sf100 lesson): export
SPARK_DRIVER_MEMORY=64g and run with shuffle partitions sized to
the SF (this script uses 256 at >=1M docs).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def _spark(shuffle_partitions: int):
    from validation_database_spark.session import get_spark

    return get_spark(
        app_name="lsh_chunked_verify", shuffle_partitions=shuffle_partitions
    )


def phase_a(spark, sf_dir: str, workdir: str, chunks: int) -> dict:
    """Candidate generation, once: persist (id_a, id_b, ck) pairs
    bucketed by crc32(id_a) % chunks. Returns candidate count.

    Signatures come from the ROW-LOCAL form
    (`with_rowlocal_signatures` — value-identical to the exploded
    groupBy form, pinned by tests/test_streaming_incremental.py),
    NOT the batch-preferred exploded aggregation: on one box the
    census is SCRATCH-bound, not CPU-bound, and the exploded form's
    (doc_id, shingle) distinct + partial-min exchanges are the
    dominant scratch term — at the tuned k=48 geometry they
    overflowed this sandbox's 77 GB free mid-phase-A at 5M docs
    (round 12), exactly where the k=16 default had peaked at ~18 GB
    (round 11). The row-local form is a narrow map: the only
    phase-A shuffles left are the band bucket join and the pair
    distinct, both sized by OUTPUT (candidates), not by corpus ×
    signature width. On a cluster, prefer the exploded form — the
    scratch spreads and its whole-stage codegen wins CPU-bound."""
    from validation_database_spark.operators import dedup as D
    from validation_database_spark.sources import load_table
    from validation_database_spark.util import release_pins, spread

    docs = load_table(spark, "documents", sf_dir)
    sigs = D.with_rowlocal_signatures(
        spread(docs.select("doc_id", "text"))
    ).select("doc_id", *[f"s{i}" for i in range(D.NUM_HASHES)])
    pairs = D.lsh_candidate_pairs(D.lsh_bands(sigs))
    out = os.path.join(workdir, "pairs.parquet")
    (
        pairs.withColumn(
            "ck", (F.crc32(F.col("id_a").cast("string")) % chunks).cast("int")
        )
        .repartition("ck")
        .write.mode("overwrite")
        .partitionBy("ck")
        .parquet(out)
    )
    n = spark.read.parquet(out).count()
    release_pins()
    return {"candidates": n, "pairs_path": out}


def verify_chunk(spark, sf_dir: str, workdir: str, chunk: int) -> dict:
    """Exact-Jaccard verify of ONE pair chunk: restrict the re-derived
    shingle stream to the chunk's docs (full shingle sets — the
    semi-join is by doc_id), then the unchanged jaccard_verify."""
    from validation_database_spark.operators import dedup as D
    from validation_database_spark.sources import load_table
    from validation_database_spark.util import pin, release_pins

    pairs = (
        spark.read.parquet(os.path.join(workdir, "pairs.parquet"))
        .filter(F.col("ck") == chunk)
        .select("id_a", "id_b")
    )
    docs = load_table(spark, "documents", sf_dir)
    ids = (
        pairs.select(F.col("id_a").alias("doc_id"))
        .union(pairs.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    sh = pin(
        D.exploded_shingles(docs).join(ids, "doc_id", "left_semi")
    )
    res = D.jaccard_verify(pairs, sh)
    row = res.agg(
        F.count("*").alias("verified"),
        F.sum("jaccard").alias("jsum"),
        F.sum((F.col("jaccard") >= 0.5).cast("long")).alias("ge_05"),
        # 0.7 ~ the default AND tuned geometries' S-curve midpoint
        # ((1/b)^(1/r) = 0.707 for both) — the design-point recall
        # comparison of the round-12 geometry study reads this.
        F.sum((F.col("jaccard") >= 0.7).cast("long")).alias("ge_07"),
    ).collect()[0]
    release_pins()
    return {
        "chunk": chunk,
        "verified": row["verified"],
        "jsum": round(float(row["jsum"] or 0.0), 6),
        "ge_05": row["ge_05"],
        "ge_07": row["ge_07"],
    }


def phase_b_rows(stdout: str) -> list[dict]:
    """Phase-b result rows from a chunk subprocess's stdout. ADVICE
    r11: each line is parsed as JSON and selected by the parsed
    ``phase`` field — a prefix string-match breaks on any json.dumps
    formatting change, and the bare ``[-1]`` index raised an opaque
    IndexError when stdout was polluted (Spark WARN leakage)."""
    rows = []
    for ln in stdout.splitlines():
        try:
            parsed = json.loads(ln)
        except (ValueError, TypeError):
            continue
        if isinstance(parsed, dict) and parsed.get("phase") == "b":
            rows.append(parsed)
    return rows


def main() -> None:
    argv = list(sys.argv[1:])

    def opt(name, default):
        if name in argv:
            i = argv.index(name)
            v = argv[i + 1]
            del argv[i : i + 2]
            return v
        return default

    chunks = int(opt("--chunks", "8"))
    workdir = opt("--workdir", "/tmp/lsh_chunked")
    phase = opt("--phase", "all")
    chunk = int(opt("--chunk", "-1"))
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"

    # shuffle partitions sized to the SF (the sf30 deployment lesson)
    import duckdb

    docs_glob = os.path.join(sf_dir, "documents.parquet")
    if os.path.isdir(docs_glob):
        docs_glob = os.path.join(docs_glob, "*.parquet")
    ndocs = duckdb.sql(
        f"select count(*) from read_parquet('{docs_glob}')"
    ).fetchone()[0]
    parts = 256 if ndocs >= 1_000_000 else None
    os.makedirs(workdir, exist_ok=True)

    if phase == "a":
        spark = _spark(parts)
        print(json.dumps({"phase": "a", **phase_a(spark, sf_dir, workdir, chunks)}), flush=True)
        spark.stop()
        return
    if phase == "b":
        # ADVICE r11: a manual phase-b run without --chunk would
        # filter(ck == -1), silently verify an EMPTY set and print
        # verified=0 — error out instead.
        if not 0 <= chunk < chunks:
            sys.exit(
                f"--phase b requires --chunk in [0, {chunks}) (got {chunk})"
            )
        spark = _spark(parts)
        print(json.dumps({"phase": "b", **verify_chunk(spark, sf_dir, workdir, chunk)}), flush=True)
        spark.stop()
        return

    # driver mode: phase A in-process, one fresh JVM per chunk
    t0 = time.perf_counter()
    spark = _spark(parts)
    a = phase_a(spark, sf_dir, workdir, chunks)
    spark.stop()
    a_sec = round(time.perf_counter() - t0, 1)
    print(json.dumps({"phase": "a", "sec": a_sec, **a}), flush=True)

    total = {"verified": 0, "jsum": 0.0, "ge_05": 0, "ge_07": 0}
    chunk_secs = []
    for k in range(chunks):
        t1 = time.perf_counter()
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), sf_dir,
             "--workdir", workdir, "--chunks", str(chunks),
             "--phase", "b", "--chunk", str(k)],
            capture_output=True, text=True,
        )
        if out.returncode != 0:
            print(json.dumps({"phase": "b", "chunk": k, "error":
                              out.stderr[-500:]}), flush=True)
            sys.exit(1)
        rows = phase_b_rows(out.stdout)
        if not rows:
            print(json.dumps({
                "phase": "b", "chunk": k,
                "error": "no phase-b JSON line in subprocess stdout",
                "stdout_tail": out.stdout[-500:],
            }), flush=True)
            sys.exit(1)
        row = rows[-1]
        chunk_secs.append(round(time.perf_counter() - t1, 1))
        print(json.dumps({**row, "sec": chunk_secs[-1]}), flush=True)
        total["verified"] += row["verified"]
        total["jsum"] = round(total["jsum"] + row["jsum"], 6)
        total["ge_05"] += row["ge_05"]
        total["ge_07"] += row.get("ge_07", 0)
    print(json.dumps({
        "phase": "census", "sf_dir": sf_dir, "chunks": chunks,
        "phase_a_sec": a_sec, "chunk_secs": chunk_secs,
        "wall_sec": round(time.perf_counter() - t0, 1), **total,
    }), flush=True)


if __name__ == "__main__":
    main()
