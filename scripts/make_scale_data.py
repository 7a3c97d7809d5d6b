#!/usr/bin/env python
"""Synthesize a larger-scale (~sf1) derivative of the sf0.1 fixtures
into /tmp for shuffle/stress testing: each table is replicated with
key offsets (text/vectors get per-replica perturbations so near-dup
structure stays realistic), written as MULTI-FILE parquet so scans
start parallel like a real lake layout.

Usage: python scripts/make_scale_data.py [out_dir] [replicas]
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


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark(app_name="make_scale_data")

    def write(df, name, parts=32):
        df.repartition(parts).write.mode("overwrite").parquet(
            os.path.join(out, f"{name}.parquet")
        )
        print(f"{name}: {df.count()} rows")

    def replicate(df, key_cols, n=replicas):
        parts = []
        for i in range(n):
            part = df
            for k in key_cols:
                part = part.withColumn(k, F.col(k) + F.lit(i * KEY_OFFSET))
            parts.append(part)
        from functools import reduce

        return reduce(lambda a, b: a.unionAll(b), parts)

    # small dims copied as-is
    for name in ("region", "nation", "supplier", "part", "customer"):
        write(load_table(spark, name, SRC), name, parts=4)

    orders = load_table(spark, "orders", SRC)
    write(replicate(orders, ["o_orderkey"]), "orders")

    li = load_table(spark, "lineitem", SRC)
    write(replicate(li, ["l_orderkey"]), "lineitem")

    # documents: per-replica suffix keeps replicas near- (not exact-)
    # duplicates of each other
    docs = load_table(spark, "documents", SRC)
    doc_parts = []
    for i in range(replicas):
        doc_parts.append(
            docs.select(
                (F.col("doc_id") + i * KEY_OFFSET).alias("doc_id"),
                F.concat(F.col("text"), F.lit(f" replica{i}")).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    from functools import reduce

    write(reduce(lambda a, b: a.unionAll(b), doc_parts), "documents")

    # embeddings: 5 replicas, tiny deterministic first-dim shift
    emb = load_table(spark, "embeddings", SRC)
    emb_parts = []
    for i in range(max(replicas // 2, 1)):
        shifted = F.concat(
            F.array(
                (F.get("embedding", 0).cast("double") + F.lit(i * 0.001)).cast("float")
            ),
            F.slice(F.col("embedding"), 2, F.size("embedding") - 1),
        )
        emb_parts.append(
            emb.select(
                (F.col("vec_id") + i * KEY_OFFSET).alias("vec_id"),
                shifted.alias("embedding"),
                "label",
            )
        )
    write(reduce(lambda a, b: a.unionAll(b), emb_parts), "embeddings")

    # events: write ts as the natural NTZ timestamp (parquet µs) —
    # sources.load_table probes the footer and reads this natively
    # (the raw-nanos rewrite was only needed while the fixtures
    # themselves shipped TIMESTAMP(NANOS)).
    ev = load_table(spark, "events", SRC)
    ev_parts = []
    for i in range(replicas):
        ev_parts.append(
            ev.select(
                (F.col("event_id") + i * KEY_OFFSET).alias("event_id"),
                "ts",
                (F.col("user_id") + (i % 3) * 1000).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
        )
    write(reduce(lambda a, b: a.unionAll(b), ev_parts), "events")

    spark.stop()
    print("done:", out)


if __name__ == "__main__":
    main()
