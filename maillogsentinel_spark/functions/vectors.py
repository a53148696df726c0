"""Vector math over ``array<float|double>`` columns, JVM-side.

Used by the similarity-search and embedding near-dup operators. All
expressions stay in codegen (``zip_with`` + ``aggregate``): no Python
crossing for the hot path. Arithmetic is done in double after an
explicit element cast so results are order-deterministic and match a
DuckDB oracle that also computes in double.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-order dot product in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """cos(a,b); NULL when either norm is 0."""
    d = dot(a, b)
    na, nb = l2_norm(a), l2_norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb))
