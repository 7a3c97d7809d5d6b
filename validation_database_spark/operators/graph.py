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
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .persist()
    )
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
            .persist()
        )
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
