"""Fixed-iteration PageRank (operators/graph.py::pagerank) vs a
DuckDB recursive-CTE oracle implementing the identical integer
fixed-point recurrence — exact value parity, not approximate."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from validation_database_spark.operators.graph import PAGERANK_SCALE, pagerank
from validation_database_spark.sources import load_table

ITERS = 5


def _edges(spark, sf_dir):
    """Deterministic directed graph from orders: customer → a
    100-bucket hub keyed by order (many-to-few, cycles, dangling
    nodes — the shapes PageRank cares about)."""
    orders = load_table(spark, "orders", sf_dir)
    return orders.select(
        (F.col("o_custkey") % 500).alias("src"),
        (F.col("o_orderkey") % 100 + 10_000).alias("dst"),
    ).unionAll(
        # hubs link back to a smaller customer core → cycles
        orders.filter(F.col("o_orderkey") % 3 == 0).select(
            (F.col("o_orderkey") % 100 + 10_000).alias("src"),
            (F.col("o_custkey") % 50).alias("dst"),
        )
    ).distinct()


def _oracle(sf_dir: str) -> dict[int, int]:
    """The identical integer recurrence, iterated as materialized SQL
    steps (SQL recursive terms cannot aggregate, so the loop lives in
    the test harness — each step is pure SQL)."""
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{sf_dir}/orders.parquet')"
    )
    con.execute(
        """
CREATE TABLE edges AS
  SELECT o_custkey % 500 AS src, o_orderkey % 100 + 10000 AS dst FROM orders
  UNION
  SELECT o_orderkey % 100 + 10000, o_custkey % 50 FROM orders
  WHERE o_orderkey % 3 = 0
"""
    )
    con.execute(
        "CREATE TABLE nodes AS SELECT DISTINCT src AS node FROM edges "
        "UNION SELECT DISTINCT dst FROM edges"
    )
    con.execute(
        "CREATE TABLE deg AS SELECT src AS node, count(*) AS out_deg "
        "FROM edges GROUP BY src"
    )
    n = con.execute("SELECT count(*) FROM nodes").fetchone()[0]
    base = (15 * PAGERANK_SCALE) // (100 * n)
    init = PAGERANK_SCALE // n
    con.execute(
        f"CREATE TABLE pr AS SELECT node, CAST({init} AS BIGINT) AS rank_ppt FROM nodes"
    )
    for _ in range(ITERS):
        con.execute(
            f"""
CREATE OR REPLACE TABLE pr AS
SELECT n.node,
       CAST({base} + (85 * COALESCE(s.in_sum, 0)) // 100 AS BIGINT) AS rank_ppt
FROM nodes n
LEFT JOIN (
  SELECT e.dst AS node, SUM(p.rank_ppt // d.out_deg) AS in_sum
  FROM pr p JOIN edges e ON e.src = p.node JOIN deg d ON d.node = p.node
  GROUP BY e.dst
) s ON s.node = n.node
"""
        )
    return dict(con.execute("SELECT node, rank_ppt FROM pr").fetchall())


def test_pagerank_matches_recursive_cte_exactly(spark, sf_dir):
    got = {
        r.node: r.rank_ppt
        for r in pagerank(_edges(spark, sf_dir), iterations=ITERS).collect()
    }
    want = _oracle(sf_dir)
    assert got == want


def test_pagerank_mass_and_determinism(spark, sf_dir):
    edges = _edges(spark, sf_dir)
    a = pagerank(edges, iterations=3).collect()
    b = pagerank(edges, iterations=3).collect()
    assert sorted((r.node, r.rank_ppt) for r in a) == sorted(
        (r.node, r.rank_ppt) for r in b
    )
    total = sum(r.rank for r in a)
    # dangling mass leaks by design; remaining mass stays in (0, 1]
    assert 0.0 < total <= 1.0 + 1e-9
    assert all(r.rank > 0 for r in a)
