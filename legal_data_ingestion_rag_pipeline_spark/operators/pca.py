"""PCA over an embedding column, Spark-first — the spectral family:
exact-integer Gram accumulation, driver-side power iteration,
hash-exact projections.

The scale decomposition is the classical one for tall-skinny data
(n rows >> d dims): the d x d Gram matrix G = X^T X is a distributed
aggregation (the ONLY corpus-scale work), the eigendecomposition of
the tiny G runs driver-side, and the projection back over the corpus
is a map-side dot per component.  What is NOT classical is making it
HASH-EXACT across engines:

- embeddings quantize to integer MICRO units first
  (floor(x * 1e6 + 0.5), the embedding_quantize_int8 convention
  widened to 1e6) — from there every Gram entry is a SUM OF exact
  BIGINT PRODUCTS, order-independent under any partitioning (a
  float Gram would be partition-order-dependent);
- Gram sums ride in DECIMAL(38,0): micro-products are ~1e12 and a
  100 TB corpus sums past int64 — DECIMAL keeps them exact at any
  scale (both engines agree on integer decimals);
- power iteration (fixed iterations, deterministic e_1 start,
  Hotelling deflation for the second component) runs driver-side in
  pure Python float64 on the exact integer Gram — the twin reruns
  the SAME function on the SAME integers, so the float trajectory is
  bit-identical;
- the resulting components snap to integer micro units ONCE; the
  corpus projection is then an exact BIGINT dot (int embedding x int
  component), so the per-row output needs no float at all.

Gram pair generation here is the explode form (d(d+1)/2 rows per
input row) — transparent and oracle-friendly.  At 100 TB the drop-in
replacement is a per-partition numpy partial Gram via mapInPandas
(Python-int accumulators, NOT int64 numpy — silent overflow) merged
by the same exact integer sum; the aggregation contract is unchanged.

No reference-file citation applies: /root/reference stops at
retrieval; this extends the embedding-analytics family
(operators/ann.py, operators/quantize.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: embedding quantization scale (micro units)
QSCALE = 1_000_000
#: fixed power-iteration rounds (deterministic cost, like pagerank)
POWER_ITERS = 50


# ---------------------------------------------------------------------------
# shared pure functions (driver side AND the sparkless twin)
# ---------------------------------------------------------------------------

def power_components(
    gram: list[list[int]], n_components: int = 2, iters: int = POWER_ITERS
) -> tuple[list[list[int]], list[int]]:
    """Top eigenvectors of an exact-integer Gram by power iteration
    with Hotelling deflation, returned as MICRO-snapped integer
    component vectors plus micro-snapped eigenvalue shares.

    Pure float64 on exact-integer input with a fixed start (e_1) and
    iteration count — deterministic, so Spark path and twin agree
    bit-for-bit.  Sign convention: the component's largest-magnitude
    coordinate is made positive (ties to the lowest index), removing
    the eigenvector sign ambiguity.
    """
    import math

    d = len(gram)
    g = [[float(x) for x in row] for row in gram]

    def matvec(m, v):
        return [sum(m[i][k] * v[k] for k in range(d)) for i in range(d)]

    def norm(v):
        return math.sqrt(sum(x * x for x in v))

    comps: list[list[float]] = []
    eigs: list[float] = []
    for _ in range(n_components):
        v = [0.0] * d
        v[0] = 1.0
        for _ in range(iters):
            w = matvec(g, v)
            # deflate: subtract projections onto found components
            for c, lam in zip(comps, eigs):
                proj = sum(w[k] * c[k] for k in range(d))
                w = [w[k] - proj * c[k] for k in range(d)]
            nw = norm(w)
            if nw == 0.0:
                break
            v = [x / nw for x in w]
        lam = sum(matvec(g, v)[k] * v[k] for k in range(d))
        comps.append(v)
        eigs.append(lam)
    # sign fix + micro snap
    out: list[list[int]] = []
    for v in comps:
        j = max(range(d), key=lambda k: (abs(v[k]), -k))
        s = -1.0 if v[j] < 0 else 1.0
        out.append(
            [int(math.floor(s * x * QSCALE + 0.5)) for x in v]
        )
    tot = sum(float(gram[i][i]) for i in range(d))
    shares = [
        int(math.floor((lam / tot) * QSCALE + 0.5)) if tot > 0 else 0
        for lam in eigs
    ]
    return out, shares


def gram_from_parquet(
    path: str, vec_col: str = "embedding"
) -> list[list[int]]:
    """pyarrow twin of :func:`gram_exact`: exact integer Gram of the
    micro-quantized embeddings (Python-int accumulators)."""
    import math

    import pyarrow.parquet as pq_

    gram: list[list[int]] | None = None
    for batch in pq_.ParquetFile(path).iter_batches(columns=[vec_col]):
        for vec in batch.column(vec_col).to_pylist():
            if vec is None:
                continue
            q = [int(math.floor(float(x) * QSCALE + 0.5)) for x in vec]
            d = len(q)
            if gram is None:
                gram = [[0] * d for _ in range(d)]
            for i in range(d):
                qi = q[i]
                gi = gram[i]
                for j in range(i, d):
                    gi[j] += qi * q[j]
    assert gram is not None, "no embeddings"
    d = len(gram)
    for i in range(d):
        for j in range(i):
            gram[i][j] = gram[j][i]
    return gram


# ---------------------------------------------------------------------------
# Spark path
# ---------------------------------------------------------------------------

def gram_exact(
    e: DataFrame, vec_col: str = "embedding", dim: int | None = None
) -> list[list[int]]:
    """Exact integer Gram of the micro-quantized embedding column via
    the explode form: one (i, j, product) row per upper-triangle pair
    per input row, DECIMAL(38,0) sums (exact past int64 at corpus
    scale).  Collects the d x d table driver-side (the codebook/Gram
    convention, KBs)."""
    # One aggregation pass establishes the dimension AND asserts the
    # column is rectangular — a ragged embedding column would
    # otherwise produce NULL products (element_at past the end) that
    # silently poison the DECIMAL sums instead of failing loudly
    # (mirrors the explicit assert in the pyarrow twin).
    # min/max ignore NULLs, so count NULL rows explicitly — a NULL
    # embedding would otherwise slip past the rectangularity check and
    # poison the DECIMAL sums (the exact failure this guard exists for)
    mn, mx, n_null, n_rows = e.select(
        F.min(F.size(vec_col)),
        F.max(F.size(vec_col)),
        F.count_if(F.col(vec_col).isNull()),
        F.count(F.lit(1)),
    ).first()
    if n_rows == 0:
        raise ValueError("empty input: no embedding rows")
    if n_null:
        raise ValueError(f"{n_null} NULL rows in embedding column {vec_col!r}")
    if mn != mx:
        raise ValueError(
            f"ragged embedding column: size(min)={mn} != size(max)={mx}"
        )
    if mn == 0:
        raise ValueError("empty embedding arrays (size 0)")
    if dim is None:
        dim = int(mx)
    elif dim != int(mx):
        raise ValueError(f"dim={dim} but embeddings have size {mx}")
    q = e.select(
        F.expr(
            f"transform({vec_col}, x -> "
            f"CAST(floor(CAST(x AS DOUBLE) * {QSCALE}.0 + 0.5) AS BIGINT))"
        ).alias("_q")
    )
    pairs = q.select(
        F.explode(
            F.expr(
                f"flatten(transform(sequence(0, {dim - 1}), i -> "
                f"transform(sequence(i, {dim - 1}), j -> "
                f"struct(i AS i, j AS j, "
                f"CAST(element_at(_q, i + 1) * element_at(_q, j + 1)"
                f" AS DECIMAL(38,0)) AS p))))"
            )
        ).alias("t")
    ).select("t.i", "t.j", "t.p")
    rows = (
        pairs.groupBy("i", "j")
        .agg(F.sum("p").alias("s"))
        .collect()
    )
    gram = [[0] * dim for _ in range(dim)]
    for r in rows:
        v = int(r.s)
        gram[r.i][r.j] = v
        gram[r.j][r.i] = v
    return gram


def project(
    e: DataFrame,
    components: list[list[int]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact BIGINT projection of each (micro-quantized) embedding
    onto the micro-snapped components: map-side dot per component, no
    float anywhere.  Unit note: q and c are both micro-scaled, so the
    raw dot carries 1e12; dividing by QSCALE keeps the projection in
    plain micro units without overflow (|dot| < 1e15 for unit-norm
    embeddings)."""
    q = e.select(
        id_col,
        F.expr(
            f"transform({vec_col}, x -> "
            f"CAST(floor(CAST(x AS DOUBLE) * {QSCALE}.0 + 0.5) AS BIGINT))"
        ).alias("_q"),
    )
    cols = [F.col(id_col)]
    for n, comp in enumerate(components, start=1):
        arr = "array(" + ", ".join(
            f"CAST({c} AS BIGINT)" for c in comp
        ) + ")"
        cols.append(
            F.expr(
                f"CAST(aggregate(zip_with(_q, {arr}, (x, y) -> x * y), "
                f"CAST(0 AS BIGINT), (s, x) -> s + x) DIV {QSCALE}"
                f" AS BIGINT)"
            ).alias(f"pc{n}_micro")
        )
    return q.select(*cols)
