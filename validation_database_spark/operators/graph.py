"""Iterative graph operators: connected components over a pair list.

Dedup pipelines end with *clustering*: near-dup pairs → groups, one
canonical doc per group. That is connected components on the pair
graph. Spark has no recursion primitive, so this is the standard
join-based label propagation: every node starts labeled with its own
id; each round every node takes the min label in its neighborhood;
stop when a round changes nothing. Convergence needs at most
O(diameter) rounds; each round is one join + aggregate (all
distributed — the driver only checks the fixed-point counter).

The DuckDB oracle states the same thing declaratively as a recursive
CTE over the transitive closure — tractable at test scale, while the
propagation loop is the form that scales (closure materialization is
quadratic in component size; label propagation is linear per round).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..util import pin


def connected_components(
    pairs: DataFrame,
    left: str = "id_a",
    right: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """(node, component) for every node in ``pairs``; component =
    min node id of the connected component. Deterministic.

    ``pairs`` is persisted internally (consumed once per round).
    """
    edges = (
        pairs.select(F.col(left).alias("src"), F.col(right).alias("dst"))
        .unionAll(pairs.select(F.col(right).alias("src"), F.col(left).alias("dst")))
        .distinct()
    )
    # pin(): registered so hosts' release_pins() drops these even when
    # the early-exit unpersists don't run (ADVICE r7); the final-round
    # labels frame in particular must stay cached until the CALLER
    # materializes the result, so it can only be released by the host.
    edges = pin(edges)
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
    )
    labels = pin(labels)
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))
                ).alias("comp"),
            )
        )
        new_labels = pin(new_labels)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    return labels.select("node", "comp")


#: PageRank fixed-point scale: ranks are integers in parts-per-1e12.
PAGERANK_SCALE = 10**12


def pagerank(
    edges: DataFrame,
    *,
    iterations: int = 5,
    damping_num: int = 85,
    damping_den: int = 100,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list, as chained
    DataFrame transformations — each iteration is one join + one
    aggregation, nothing driver-side but the loop counter (the
    canonical "iterative algorithm on Spark" shape; at scale each
    round is a single shuffle keyed by node).

    Cross-engine determinism is engineered by doing the WHOLE
    computation in integers: ranks are parts-per-10^12 (bigint),
    per-edge contributions are floor divisions by out-degree, the
    damping factor is the rational ``damping_num/damping_den``, and
    integer sums are exact and order-independent — so an equivalent
    fixed-iteration SQL implementation (e.g. a DuckDB recursive CTE
    with the same floor divisions) reproduces every value EXACTLY,
    with no float summation-order or decimal-division-scale hazards.
    The fixed-point quantization (≤1e-12 per step) is part of the
    operator contract.

    Dangling nodes (no out-edges) follow the standard simplification:
    their mass is not redistributed (dropped), matching the plain
    recursive-SQL formulation.

    Returns (node, rank_ppt BIGINT, rank DOUBLE = rank_ppt / 1e12)
    for every node appearing as src or dst.
    """
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionAll(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    # pin(): both frames feed every iteration's plan and the returned
    # frame — released by the host via release_pins() (ADVICE r7).
    nodes = pin(nodes)
    n_nodes = nodes.count()
    out_deg = edges.groupBy(F.col(src).alias("node")).agg(
        F.count("*").alias("out_deg")
    )
    e = (
        edges.select(F.col(src).alias("node"), F.col(dst).alias("dst"))
        .join(out_deg, "node")
    )
    e = pin(e)
    base = ((damping_den - damping_num) * PAGERANK_SCALE) // (
        damping_den * n_nodes
    )
    init = PAGERANK_SCALE // n_nodes
    ranks = nodes.withColumn("rank_ppt", F.lit(init).cast("bigint"))
    for _ in range(iterations):
        contrib = (
            e.join(ranks, "node")
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_ppt div out_deg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_sum"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.expr(
                    f"({damping_num} * coalesce(in_sum, 0)) div {damping_den}"
                )
            )
            .cast("bigint")
            .alias("rank_ppt"),
        )
    return ranks.select(
        "node",
        "rank_ppt",
        (F.col("rank_ppt") / F.lit(float(PAGERANK_SCALE))).alias("rank"),
    )
