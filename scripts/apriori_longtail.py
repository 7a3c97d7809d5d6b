#!/usr/bin/env python
"""Demonstrate the Apriori item pre-prune on a LONG-TAIL catalog
(VERDICT r6 ask #6).

The antimonotone semi-join added in round 6 (q_assoc_rules: items
with individual support < AR_MIN_PAIR are removed from baskets
BEFORE the pair self-join) is inert on the dense TPC-H-ish fixture —
every part is frequent there, so the r6 measurement read 26.3 → 24.3
s. Real catalogs are Zipf: most items occur a handful of times, and
antimonotonicity (n_pair ≤ min(n_a, n_b)) says no infrequent item
can appear in a qualifying pair. This script builds a deterministic
long-tail basket table and measures the PAIR SPACE (self-join output
groups and raw co-occurrence rows — the shuffle volume) with and
without the prune.

Synthetic (pure md5 discipline, no RNG state): row j of
N_ORDERS×ITEMS_PER_ORDER gets order j div ITEMS_PER_ORDER and an
item from the classic head+tail catalog shape — half the purchase
volume log-uniformly over a 10k-item HEAD (p(rank r) ∝ 1/r, the
Zipf(1) head), half uniformly over a 2M-item TAIL, branch and rank
both md5-fractions of j. (A pure Zipf(1) over a small catalog is the
DENSE case — nearly every item clears a support floor of 5 at ~2M
basket rows, which is exactly why the TPC-H-ish fixture showed the
prune inert; the measured long-tail split is what makes
antimonotonicity bite.) Deterministic, engine-replayable, same
discipline as every sampler in the suite.

Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from validation_database_spark.session import get_spark
from validation_database_spark.suite.advanced import AR_MIN_PAIR

N_ORDERS = 300_000
ITEMS_PER_ORDER = 6
N_HEAD = 10_000     # Zipf(1) head catalog
N_TAIL = 2_000_000  # uniform tail catalog


def main() -> None:
    import math

    spark = get_spark(app_name="apriori_longtail")
    rows = N_ORDERS * ITEMS_PER_ORDER
    # two independent md5-fractions of the row id: hex chars 1-8
    # pick head-vs-tail, 9-16 pick the rank within the branch
    h = F.md5(F.col("id").cast("string"))
    u_branch = (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / float(16**8)
    )
    u_rank = (
        F.conv(F.substring(h, 9, 8), 16, 10).cast("double") / float(16**8)
    )
    head_item = F.floor(F.exp(u_rank * float(math.log(N_HEAD))))
    tail_item = N_HEAD + F.floor(u_rank * float(N_TAIL))
    baskets = (
        spark.range(0, rows, 1, 32)
        .select(
            (F.col("id") / ITEMS_PER_ORDER).cast("bigint").alias("l_orderkey"),
            F.when(u_branch < 0.5, head_item)
            .otherwise(tail_item)
            .cast("bigint")
            .alias("l_partkey"),
        )
        .distinct()
        .persist()
    )
    n_baskets = baskets.count()

    item = baskets.groupBy("l_partkey").agg(F.count("*").alias("n_item"))
    n_items_total = item.count()
    n_items_frequent = item.filter(F.col("n_item") >= AR_MIN_PAIR).count()

    def pair_space(src):
        """(raw self-join co-occurrence rows, distinct pair groups,
        wall seconds) — raw rows are the shuffle/aggregate input the
        prune exists to bound."""
        t0 = time.perf_counter()
        pairs = (
            src.alias("x")
            .join(src.alias("y"), "l_orderkey")
            .filter(F.col("x.l_partkey") < F.col("y.l_partkey"))
        )
        agg = pairs.agg(
            F.count("*").alias("raw"),
            F.count_distinct("x.l_partkey", "y.l_partkey").alias("groups"),
        ).collect()[0]
        return agg["raw"], agg["groups"], round(time.perf_counter() - t0, 2)

    raw_all, groups_all, sec_all = pair_space(baskets)
    frequent = item.filter(F.col("n_item") >= AR_MIN_PAIR).select("l_partkey")
    pruned = baskets.join(frequent, "l_partkey", "left_semi").persist()
    pruned.count()
    raw_pr, groups_pr, sec_pr = pair_space(pruned)

    print(
        json.dumps(
            {
                "n_basket_rows": n_baskets,
                "n_items": n_items_total,
                "n_items_frequent": n_items_frequent,
                "min_support": AR_MIN_PAIR,
                "unpruned": {"raw_pairs": raw_all, "pair_groups": groups_all, "sec": sec_all},
                "pruned": {"raw_pairs": raw_pr, "pair_groups": groups_pr, "sec": sec_pr},
                "raw_reduction": round(raw_all / max(raw_pr, 1), 2),
                "group_reduction": round(groups_all / max(groups_pr, 1), 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
