"""Vector (embedding) column expressions.

Dense embeddings live as ``array<float>`` columns. All arithmetic is
JVM-side higher-order functions (``zip_with`` + ``aggregate``) —
codegen'd tight loops, no Python, no UDF. Elements are cast to double
before multiplying and the fold is sequential in array order, so the
result is bit-deterministic and engine-portable (the DuckDB oracle
computes the identical sequential sum).

At 100 TB scale the brute-force cosine ops below are the *verify*
path over candidate pairs produced by blocking (LSH / IVF in
suite/similarity.py) — never a full cross join.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two array<numeric> columns."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_rounded(a: Column, b: Column, scale: int = 6) -> Column:
    """Cosine rounded for stable cross-engine comparison/thresholds."""
    return F.round(cosine(a, b), scale)


def scale_vector(a: Column, factor: float) -> Column:
    return F.transform(a, lambda x: (x.cast("double") * F.lit(factor)).cast("float"))


def unit_vector(a: Column) -> Column:
    """Unit-normalized copy: each element (as double) divided by the
    sequential-fold L2 norm. Because ``cosine(a, b) ==
    dot(unit(a), unit(b))``, normalizing once per ROW turns every
    candidate-PAIR cosine into a single sequential dot instead of
    three (dot + both norms) — the way to run cosine scoring at scale.

    NOTE: the norm sub-expression sits inside the ``transform``
    lambda, so a collapsed projection would re-evaluate it per
    element; materialize it behind an exchange (see
    ``suite/similarity.py::_unit_emb``) when the input is large.
    """
    n = l2_norm(a)
    return F.transform(a, lambda x: x.cast("double") / n)


def unit_sql(a: str) -> str:
    """DuckDB rendering of the same unit normalization (identical
    IEEE ops in identical order → bit-equal elements)."""
    return f"list_transform({a}, x -> x::DOUBLE / sqrt({dot_sql(a, a)}))"


# --- Spark-SQL string renderings (round 12) ---------------------------
# The Column-API higher-order functions above cost one py4j round trip
# per lambda node; a profiled rag-quant plan BUILD was 1,312 round
# trips ≈ 1.1 s of socket wait per timed run. These strings parse
# JVM-side in ONE call and are the literal SQL rendering of the same
# expression trees (sameSemantics-checked against the Column forms in
# tests/test_plans.py), so results are bit-identical.


def dot_expr(a: str, b: str) -> str:
    """Spark-SQL rendering of :func:`dot` (sequential fold, double)."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * "
        f"cast(y as double)), 0.0D, (acc, x) -> acc + x)"
    )


def l2_norm_expr(a: str) -> str:
    """Spark-SQL rendering of :func:`l2_norm`."""
    return f"sqrt({dot_expr(a, a)})"


DOT_SQL = (
    "list_aggregate(list_transform(generate_series(1, len({a})), "
    "k -> {a}[k]::DOUBLE * {b}[k]::DOUBLE), 'sum')"
)


def dot_sql(a: str, b: str) -> str:
    """DuckDB rendering of the same sequential dot product."""
    return DOT_SQL.format(a=a, b=b)


def cosine_sql(a: str, b: str) -> str:
    return (
        f"{dot_sql(a, b)} / (sqrt({dot_sql(a, a)}) * sqrt({dot_sql(b, b)}))"
    )
