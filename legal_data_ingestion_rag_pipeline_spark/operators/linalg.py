"""Distributed exact-integer dense linear algebra over embedding
columns: partition-parallel Gram/moment accumulation feeding a
driver-side dim x dim solve — the classifier-training split
(operators/classifier.py train_distilled_weights) generalized from
sparse hashed features to dense vectors.

Why this shape at 100 TB: covariance/PCA over n vectors needs only
the d x d Gram matrix and the d-vector of component sums — O(d^2)
numbers regardless of n.  Each Arrow batch contributes an exact
int64 partial (components quantize to milli-units first, so the
per-batch numpy matmul is integer arithmetic with no float
summation order anywhere); one (i, j) shuffle folds the partials;
the driver materializes a KB-scale matrix and runs the eigensolve.
The corpus is read once and never moves.

Determinism: integer sums are order-independent, so any
partitioning yields the identical Gram — and the eigensolve is a
deterministic function of that exact matrix.  No analog in the
reference (its pgvector usage stops at cosine distance,
rag.py:1-80); this is the embedding-diagnostics layer
(effective dimensionality, variance concentration) a training-data
pipeline runs before committing to an index or a truncation tier.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F

#: milli-unit quantization scale for vector components (matches the
#: repo's exact-arithmetic convention: floor(x * SCALE + 0.5)).
VEC_SCALE = 1000


def gram_moments(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """Exact integer Gram + moments of a ``array<float>`` column.

    Returns a DataFrame of (i, j, v) BIGINT rows:
      - i in [0, dim):  v = sum over rows of q_i * q_j  (Gram, full
        square — both triangles, so the driver assembles without
        symmetrizing)
      - i == dim, j in [0, dim):  v = sum of q_j        (moments)
      - i == dim, j == dim:      v = row count
    where q = floor(float64(x) * VEC_SCALE + 0.5) per component.
    Rows with NULL or wrong-length vectors are skipped (counted out).

    Headroom: |q| <= VEC_SCALE for unit-range components, so each
    product is <= 1e6 and int64 holds the sum to ~9e12 rows.
    """
    import numpy as np
    import pandas as pd

    out_schema = "i long, j long, v long"

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        gram = np.zeros((dim, dim), dtype=np.int64)
        mom = np.zeros(dim, dtype=np.int64)
        n = 0
        for pdf in batches:
            vecs = [
                v
                for v in pdf[vec_col]
                if v is not None and len(v) == dim
            ]
            if not vecs:
                continue
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in vecs],
                dtype=np.float64,
            )
            q = np.floor(x * float(VEC_SCALE) + 0.5).astype(np.int64)
            gram += q.T @ q
            mom += q.sum(axis=0)
            n += q.shape[0]
        ii, jj = np.meshgrid(
            np.arange(dim, dtype=np.int64),
            np.arange(dim, dtype=np.int64),
            indexing="ij",
        )
        yield pd.DataFrame(
            {
                "i": np.concatenate(
                    [ii.ravel(), np.full(dim, dim, dtype=np.int64), [dim]]
                ),
                "j": np.concatenate(
                    [jj.ravel(), np.arange(dim, dtype=np.int64), [dim]]
                ),
                "v": np.concatenate([gram.ravel(), mom, [n]]),
            }
        )

    return (
        df.select(vec_col)
        .mapInPandas(partial, schema=out_schema)
        .groupBy("i", "j")
        .agg(F.sum("v").cast("bigint").alias("v"))
    )


def covariance_spectrum_py(
    cells: list[tuple[int, int, int]], dim: int, top_k: int
) -> list[tuple[int, int]]:
    """Driver half (and the oracle twin's shared tail): assemble the
    exact scatter matrix C = n*G - s s^T from gram_moments cells and
    return [(component 1.., var_micro)] for the top_k eigenvalues,
    var_micro = floor(lambda / (n * (n - 1)) + 0.5) — micro-units of
    component variance since q is in milli-units.  All inputs are
    exact ints, so the float64 matrix handed to the eigensolver is a
    deterministic function of the data under ANY partitioning."""
    import numpy as np

    g = np.zeros((dim, dim), dtype=np.int64)
    s = np.zeros(dim, dtype=np.int64)
    n = 0
    for i, j, v in cells:
        if i < dim:
            g[i, j] = v
        elif j < dim:
            s[j] = v
        else:
            n = v
    if n < 2:
        raise ValueError(f"need >= 2 vectors, got {n}")
    c = n * g.astype(object) - np.outer(s, s).astype(object)
    cf = np.array(c.tolist(), dtype=np.float64)
    eig = np.linalg.eigvalsh(cf)[::-1][:top_k]
    denom = float(n) * float(n - 1)
    return [
        (rank + 1, int(np.floor(lam / denom + 0.5)))
        for rank, lam in enumerate(eig)
    ]
