"""Vector similarity expressions (pgvector ``<=>`` replacement).

The reference stores unit-normalized embeddings (rag.py:34-42), so
cosine similarity reduces to a dot product.  We compute it as a pure
SQL fold in double precision — codegen-friendly, no UDF, and
bit-identical to the DuckDB oracle (see portable.dot_double for why
DuckDB's float32 list_dot_product is avoided).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from . import portable


def dot(a: str, b: str) -> Column:
    """Double-precision dot product of two array<float/double> columns."""
    return F.expr(portable.dot_double(a, b, portable.SPARK))


def l2_norm(a: str) -> Column:
    return F.sqrt(F.expr(portable.dot_double(a, a, portable.SPARK)))


def cosine(a: str, b: str) -> Column:
    """Full cosine similarity (safe for non-normalized vectors)."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def unit_normalize(a: str) -> Column:
    """array<double> scaled to unit L2 norm (zero vectors -> nulls)."""
    nrm = l2_norm(a)
    return F.when(
        nrm > 0,
        F.transform(F.col(a), lambda x: x.cast("double") / nrm),
    )
