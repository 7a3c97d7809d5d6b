#!/usr/bin/env python
"""Head-to-head: uncapped vs df-capped containment on the adversarial
boilerplate corpus (every 5th doc shares a planted sentence), at a
given SF dir — the containment twin of the capped-Jaccard isolation
already in SCALE.md.

Prints per-variant wall seconds, result rows, and the candidate-pair
count the inverted-index self-join materializes (the quantity the cap
exists to bound).

Usage: python scripts/containment_headtohead.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from validation_database_spark.session import get_spark
from validation_database_spark.suite.dedup import (
    DF_CAP,
    _docs_with_boilerplate,
    q_dedup_containment_capped,
)
from validation_database_spark.operators import dedup as D


def candidate_pairs(spark, sf_dir: str, capped: bool) -> int:
    """Size of the pair space the self-join materializes (pre-filter)."""
    docs = _docs_with_boilerplate(spark, sf_dir)
    sh = D.exploded_shingles(docs)
    if capped:
        hot = (
            sh.groupBy("sh")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > DF_CAP)
            .select("sh")
        )
        sh = sh.join(F.broadcast(hot), "sh", "left_anti")
    per_sh = sh.groupBy("sh").agg(F.count("*").alias("df"))
    # each shingle with df docs emits df*(df-1) ordered pairs
    return per_sh.agg(
        F.sum(F.col("df") * (F.col("df") - 1)).alias("pairs")
    ).collect()[0]["pairs"]


def uncapped_containment(spark, sf_dir: str):
    """The uncapped baseline run on the SAME adversarial corpus (the
    registered unit spec runs on the clean corpus; the comparison
    needs both variants to face the planted boilerplate)."""
    from validation_database_spark.suite.dedup import CONTAINMENT_THRESHOLD

    docs = _docs_with_boilerplate(spark, sf_dir)
    shingles = D.exploded_shingles(docs).persist()
    sizes = shingles.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = shingles.select(F.col("doc_id").alias("id_a"), "sh")
    b = shingles.select(F.col("doc_id").alias("id_b"), "sh")
    common = (
        a.join(b, "sh")
        .filter(F.col("id_a") != F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_common"))
    )
    na = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_sh").alias("n_a"))
    cont = F.round(F.col("n_common").cast("double") / F.col("n_a"), 6)
    return (
        common.join(na, "id_a")
        .select("id_a", "id_b", cont.alias("containment"))
        .filter(F.col("containment") >= CONTAINMENT_THRESHOLD)
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="containment_headtohead")

    for label, capped in (("capped", True), ("uncapped", False)):
        pairs = candidate_pairs(spark, sf_dir, capped)
        t0 = time.perf_counter()
        if capped:
            n = q_dedup_containment_capped(spark, sf_dir).count()
        else:
            n = uncapped_containment(spark, sf_dir).count()
        dt = time.perf_counter() - t0
        print(
            f"{label:9s} candidate_pairs={pairs:>12,} "
            f"result_rows={n:>8,} wall={dt:7.2f}s"
        )
    spark.stop()


if __name__ == "__main__":
    main()
