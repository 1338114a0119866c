"""Vector (embedding) column expressions.

Embeddings are plain ``array<float>`` columns (FIXTURES.md B:
``embeddings.embedding``).  All math here is native array expressions —
``zip_with`` + ``aggregate`` compile to codegen'd loops over the array,
no Python, no UDF serialization.  At 100 TB the dominant cost is the
join structure around these expressions, not the arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two equal-length float arrays (double result)."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    """Euclidean norm of a float array."""
    return F.sqrt(
        F.aggregate(
            _c(a), F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL-safe, 0.0 when either norm is zero."""
    d = dot(a, b)
    na, nb = l2_norm(a), l2_norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb)).otherwise(F.lit(0.0))


def normalize(a: Column | str) -> Column:
    """Unit-normalize a float array (double elements).

    Pre-normalizing the corpus once turns every cosine into a dot
    product — at scale, do this at ingest and store the normalized
    vector so each query pays N multiplies, not N multiplies + N norms.
    """
    arr = _c(a)
    n = l2_norm(arr)
    return F.when(n > 0, F.transform(arr, lambda v: v.cast("double") / n)).otherwise(
        F.transform(arr, lambda v: v.cast("double"))
    )
