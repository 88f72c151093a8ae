"""Vector math over ``array<float|double>`` columns — all JVM-side
(``zip_with`` / ``aggregate`` higher-order functions), no Python on the
hot path. Used by similarity search and embedding dedup.

Elements are cast to double before any arithmetic so results are
reproducible against external oracles regardless of the stored width.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Left-to-right summed dot product (deterministic order)."""
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
