#!/usr/bin/env python
"""Synthesize a larger-scale derivative of the sf0.1 fixtures into
/tmp for shuffle/stress testing: each table is replicated with key
offsets (text/vectors get per-replica perturbations so near-dup
structure stays realistic), written as MULTI-FILE parquet so scans
start parallel like a real lake layout.

Replication is explode(sequence(0, n-1)) — ONE scan regardless of the
replica count — not an n-leg union (which stops planning well past
~10 legs).

Document replication has two regimes:

* replicas <= 10 (the ~sf1 run): every replica of a doc is a
  near-duplicate of every other (suffix-only perturbation). Dup-group
  size == replica count, so the dedup pair space grows superlinearly
  with the replica count — the adversarial *density* case.
* replicas > 10 (the ~sf10 / 100x run): replicas are salted into
  groups of 10 — a group tag token is interleaved every 8 tokens, so
  shingles are group-specific and only the 10 same-group replicas
  stay near-dups of each other. Dup-group size is CONSTANT while the
  corpus grows, the realistic crawl shape — this isolates corpus-size
  scaling from density scaling (and keeps shingle df at the df-cap
  boundary instead of vaporizing every shingle at df≈replicas).

Usage: python scripts/make_scale_data.py [out_dir] [replicas] [--tables a,b,c]

``--tables`` restricts generation to the named tables (plus nothing
else) — the round-8 slope study only needs documents+embeddings at
three replica counts, and skipping the 60M-row lineitem write makes
each point ~6x cheaper to build.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from validation_database_spark.session import get_spark
from validation_database_spark.sources import load_table

SRC = "/root/testdata/sf0.1"
KEY_OFFSET = 10_000_000
DOC_GROUP = 10  # near-dup group size in the salted (replicas > 10) regime


def main() -> None:
    argv = list(sys.argv[1:])
    tables: set[str] | None = None
    if "--tables" in argv:
        i = argv.index("--tables")
        tables = set(argv[i + 1].split(","))
        del argv[i : i + 2]
    out = argv[0] if argv else "/tmp/spark_graft_sf1"
    replicas = int(argv[1]) if len(argv) > 1 else 10
    spark = get_spark(app_name="make_scale_data")
    big_parts = 32 if replicas <= 10 else 64

    def wanted(name):
        return tables is None or name in tables

    def write(df, name, parts=None):
        df.repartition(parts or big_parts).write.mode("overwrite").parquet(
            os.path.join(out, f"{name}.parquet")
        )
        n = spark.read.parquet(os.path.join(out, f"{name}.parquet")).count()
        print(f"{name}: {n} rows")

    def with_replica(df, n=replicas):
        return df.withColumn("_r", F.explode(F.sequence(F.lit(0), F.lit(n - 1))))

    def replicate(df, key_cols, n=replicas):
        rep = with_replica(df, n)
        for k in key_cols:
            rep = rep.withColumn(k, F.col(k) + F.col("_r") * F.lit(KEY_OFFSET))
        return rep.drop("_r")

    # small dims copied as-is
    for name in ("region", "nation", "supplier", "part", "customer"):
        if wanted(name):
            write(load_table(spark, name, SRC), name, parts=4)

    if wanted("orders"):
        write(replicate(load_table(spark, "orders", SRC), ["o_orderkey"]), "orders")
    if wanted("lineitem"):
        write(replicate(load_table(spark, "lineitem", SRC), ["l_orderkey"]), "lineitem")

    # documents: suffix keeps same-group replicas near- (not exact-)
    # duplicates; past 10 replicas a group-tag token is interleaved so
    # distinct groups stop sharing shingles (see module docstring).
    if wanted("documents"):
        docs = with_replica(load_table(spark, "documents", SRC))
        if replicas <= 10:
            salted = F.col("text")
        else:
            grp = (F.col("_r") / DOC_GROUP).cast("int").cast("string")
            salted = F.array_join(
                F.zip_with(
                    F.split(F.col("text"), " "),
                    F.sequence(F.lit(0), F.size(F.split(F.col("text"), " ")) - 1),
                    lambda t, i: F.when(
                        i % 8 == 0, F.concat(F.lit("grp"), grp, F.lit("x "), t)
                    ).otherwise(t),
                ),
                " ",
            )
        write(
            docs.select(
                (F.col("doc_id") + F.col("_r") * F.lit(KEY_OFFSET)).alias("doc_id"),
                F.concat(salted, F.lit(" replica"), F.col("_r").cast("string")).alias(
                    "text"
                ),
                "lang",
                "source",
                "n_chars",
            ),
            "documents",
        )

    # embeddings: replicas // 2 copies, tiny deterministic first-dim shift
    if wanted("embeddings"):
        emb = with_replica(load_table(spark, "embeddings", SRC), max(replicas // 2, 1))
        shifted = F.concat(
            F.array(
                (
                    F.get("embedding", 0).cast("double")
                    + F.col("_r") * F.lit(0.001)
                ).cast("float")
            ),
            F.slice(F.col("embedding"), 2, F.size("embedding") - 1),
        )
        write(
            emb.select(
                (F.col("vec_id") + F.col("_r") * F.lit(KEY_OFFSET)).alias("vec_id"),
                shifted.alias("embedding"),
                "label",
            ),
            "embeddings",
        )

    # events: write ts as the natural NTZ timestamp (parquet µs) —
    # sources.load_table probes the footer and reads this natively.
    if wanted("events"):
        ev = with_replica(load_table(spark, "events", SRC))
        write(
            ev.select(
                (F.col("event_id") + F.col("_r") * F.lit(KEY_OFFSET)).alias("event_id"),
                "ts",
                (F.col("user_id") + (F.col("_r") % 3) * F.lit(1000)).alias("user_id"),
                "event_type",
                "value",
                "props",
            ),
            "events",
        )

    spark.stop()
    print("done:", out)


if __name__ == "__main__":
    main()
