"""Product quantization (PQ) — the second production vector-storage
tier next to SQ8 (operators/quantize.py), mirroring faiss PQ/IVF_PQ.

The vector is split into ``m`` subspaces; each subspace is encoded as
the id of its nearest codebook centroid, so a d-dim float64 vector
stores as m small ints (e.g. 64 bytes -> 4 bytes at m=4, k=8). Search
uses ADC (asymmetric distance computation): per query, an m x k table
of query-subvector-to-centroid distances is built once, and each
candidate's approximate distance is just m table lookups — no float
vector is touched until the exact rescore stage.

Determinism / oracle story: the codebook derives from the first
``k_cb`` corpus vectors (the same deterministic convention as the
IVF gate's first-8 centroids), encode/ADC are pure double-fold
expressions in fixed array order, and ties break toward the smaller
centroid id — so a DuckDB oracle reproduces encode + search
bit-for-bit.

Scale shape: the codebook is tiny (m x k_cb x d/m doubles) and is
inlined as literals, so BOTH encode and ADC scoring are map-side
codegen'd expressions over the corpus — no shuffle, no crossJoin row
blowup. Candidate reduction is the shuffle-free two-phase top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions import portable as PT
from .ann import _two_phase_topk


def pq_codebook(
    corpus: DataFrame,
    m: int,
    k_cb: int = 8,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> list[list[list[float]]]:
    """Deterministic codebook: the first ``k_cb`` corpus vectors (by
    id), each split into ``m`` equal sub-vectors.

    Returns ``book[s][j] = centroid j of subspace s``. A trained
    k-means codebook plugs into the same shape (the k-means operator
    exists — driver_queries_scale.kmeans_two_iterations); first-k
    keeps the gate oracle-reproducible.
    """
    # orderBy + limit, NOT filter(id < k_cb): ids need not start at 0
    # or be contiguous, and the predicate form silently yielded a
    # tiny/empty book on sparse id spaces. Bounded + deterministic.
    rows = (
        corpus.select(corpus_id, corpus_vec)
        .orderBy(corpus_id)
        .limit(k_cb)
        .collect()
    )
    if len(rows) < k_cb:
        raise ValueError(f"codebook needs {k_cb} corpus rows, found {len(rows)}")
    dim = len(rows[0][1])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    return [
        [[float(x) for x in r[1][s * dsub : (s + 1) * dsub]] for r in rows]
        for s in range(m)
    ]


def _l2_sq(a_expr: str, cents: list[float], offset: int, dialect: str) -> str:
    """Squared L2 between ``a[offset+1 .. offset+len]`` and a literal
    centroid, as an identical-order double fold on both engines.

    Expressed as slice + array-literal + zip_with + fold — ONE codegen
    loop — rather than dsub inlined ``(a_i - c_i)^2`` terms: the
    inlined form at m x k_cb x dsub scale blew past janino's 64 KB
    method limit and silently dropped the whole stage to interpreted
    mode (measured here; same failure class as IVF literal inlining).
    """
    dsub = len(cents)
    lits = ", ".join(repr(c) for c in cents)
    if dialect == PT.SPARK:
        sl = f"slice({a_expr}, {offset + 1}, {dsub})"
        arr = f"CAST(array({lits}) AS ARRAY<DOUBLE>)"
        prods = (
            f"zip_with({sl}, {arr}, (x, y) -> "
            f"(CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y))"
        )
    else:
        sl = f"list_slice({a_expr}, {offset + 1}, {offset + dsub})"
        arr = f"CAST([{lits}] AS DOUBLE[])"
        diff = "(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))"
        prods = f"list_transform(list_zip({sl}, {arr}), p -> {diff} * {diff})"
    return PT.reduce_(prods, "CAST(0.0 AS DOUBLE)", "(acc, x) -> acc + x", dialect)


def pq_code_sql(
    vec_expr: str, book: list[list[list[float]]], s: int, dialect: str
) -> str:
    """Expression for subspace ``s``'s code: argmin squared-L2 over the
    codebook, ties to the smaller centroid id (min on (dist, j) —
    struct comparison is field-order lexicographic in both engines)."""
    dsub = len(book[s][0])
    if dialect == PT.SPARK:
        structs = ", ".join(
            f"struct({_l2_sq(vec_expr, cj, s * dsub, dialect)} AS d, "
            f"CAST({j} AS BIGINT) AS j)"
            for j, cj in enumerate(book[s])
        )
        return f"array_min(array({structs})).j"
    structs = ", ".join(
        f"{{'d': {_l2_sq(vec_expr, cj, s * dsub, dialect)}, "
        f"'j': CAST({j} AS BIGINT)}}"
        for j, cj in enumerate(book[s])
    )
    return f"list_sort([{structs}])[1].j"


def pq_adc_sql(
    vec_expr: str,
    codes_exprs: list[str],
    book: list[list[list[float]]],
    dialect: str,
) -> str:
    """ADC distance of a float query ``vec_expr`` to a candidate's
    codes: sum over subspaces of ||q_s - centroid[s][code_s]||^2.
    The per-subspace lookup is a CASE over the k_cb literal centroids
    (in production a broadcast m x k table)."""
    terms = []
    for s, code in enumerate(codes_exprs):
        dsub = len(book[s][0])
        branches = " ".join(
            f"WHEN ({code}) = {j} THEN {_l2_sq(vec_expr, cj, s * dsub, dialect)}"
            for j, cj in enumerate(book[s])
        )
        terms.append(f"(CASE {branches} ELSE CAST('nan' AS DOUBLE) END)")
    return "(" + " + ".join(terms) + ")"


def pq_encode(
    corpus: DataFrame,
    book: list[list[list[float]]],
    corpus_vec: str = "embedding",
    code_prefix: str = "pq_code_",
) -> DataFrame:
    """Append one code column per subspace (map-side, shuffle-free)."""
    out = corpus
    for s in range(len(book)):
        out = out.withColumn(
            f"{code_prefix}{s}",
            F.expr(pq_code_sql(corpus_vec, book, s, PT.SPARK)),
        )
    return out


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    book: list[list[list[float]]],
    k: int = 10,
    pool: int = 50,
    corpus_id: str = "vec_id",
    query_id: str = "q_id",
    corpus_vec: str = "embedding",
    query_vec: str = "q_vec",
) -> DataFrame:
    """Two-stage PQ search: ADC-distance pool (ascending — smaller L2
    is closer) then exact dot rescore of the survivors, identical
    total orders on both engines."""
    m = len(book)
    encoded = pq_encode(corpus, book, corpus_vec)
    codes = [f"pq_code_{s}" for s in range(m)]
    scored = (
        encoded.select(corpus_id, *codes)
        .crossJoin(F.broadcast(queries.select(query_id, query_vec)))
        # two-phase top-k ranks similarity DESC; negate the distance
        .withColumn(
            "similarity",
            -F.expr(pq_adc_sql(query_vec, codes, book, PT.SPARK)),
        )
    )
    survivors = _two_phase_topk(scored, pool, query_id, corpus_id).select(
        query_id, corpus_id
    )
    rescored = (
        corpus.join(F.broadcast(survivors), corpus_id)
        .join(F.broadcast(queries.select(query_id, query_vec)), query_id)
        .withColumn(
            "similarity", F.expr(PT.dot_double(corpus_vec, query_vec, PT.SPARK))
        )
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("similarity"), F.asc(corpus_id))
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "similarity", "rank")
    )


def pq_train_codebook(
    corpus: DataFrame,
    m: int,
    k_cb: int = 8,
    sample_rows: int = 1024,
    iters: int = 5,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> list[list[list[float]]]:
    """Per-subspace Lloyd's k-means codebook on a deterministic sample.

    PQ codebooks are trained on a bounded corpus SAMPLE by design
    (faiss trains on ~1e5 vectors regardless of corpus size), so the
    driver-side numpy step is O(sample x dim x k x iters) independent
    of the 100 TB corpus; the trained book broadcasts like any other.
    Deterministic: sample = first ``sample_rows`` by id, init = first
    ``k_cb`` sample rows, fixed iteration count; empty clusters keep
    their previous centroid. Drop-in for :func:`pq_codebook` wherever
    a ``book[s][j]`` is accepted (not SQL-oracle-able — iterative —
    so the hash-gated query keeps the first-k book; recall comparison
    is pytest-pinned).
    """
    import numpy as np

    rows = (
        corpus.select(corpus_id, corpus_vec)
        .orderBy(corpus_id)
        .limit(sample_rows)
        .collect()
    )
    X = np.asarray([r[1] for r in rows], dtype=np.float64)
    return _lloyd_book(X, m, k_cb, iters)


def _lloyd_book(X, m: int, k_cb: int, iters: int) -> list[list[list[float]]]:
    """Shared numpy Lloyd core for the Spark-sample and parquet-file
    trainers.  Both feed it the SAME float64 sample matrix (first
    ``sample_rows`` rows by id), so the two paths produce bit-identical
    books — the invariant the dynamic trained-PQ oracle relies on
    (pinned in tests/test_scale_ops.py)."""
    import numpy as np

    if len(X) < k_cb:
        raise ValueError(f"sample has {len(X)} rows < k_cb={k_cb}")
    dim = X.shape[1]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    book: list[list[list[float]]] = []
    for s in range(m):
        Xs = X[:, s * dsub : (s + 1) * dsub]
        C = Xs[:k_cb].copy()
        for _ in range(iters):
            d2 = ((Xs[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for j in range(k_cb):
                members = Xs[assign == j]
                if len(members):
                    C[j] = members.mean(axis=0)
        book.append([[float(x) for x in c] for c in C])
    return book


def train_book_from_parquet(
    parquet_path: str,
    m: int,
    k_cb: int = 8,
    sample_rows: int = 1024,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Sparkless twin of :func:`pq_train_codebook`: read the embeddings
    parquet directly (pyarrow), take the same deterministic sample
    (first ``sample_rows`` by id), run the same numpy core.

    Exists so a DuckDB oracle can reproduce the trained codebook
    without a SparkSession — the registry's callable-oracle hook calls
    this at oracle-build time and inlines the resulting centroids as
    literals, which makes trained (iterative, otherwise
    non-SQL-expressible) retrieval hash-gateable end to end.
    """
    import numpy as np
    import pyarrow.parquet as pa_pq

    tbl = pa_pq.read_table(parquet_path, columns=[id_col, vec_col])
    ids = tbl.column(id_col).to_numpy()
    order = np.argsort(ids, kind="stable")[:sample_rows]
    vecs = tbl.column(vec_col).to_pylist()
    X = np.asarray([vecs[i] for i in order], dtype=np.float64)
    return _lloyd_book(X, m, k_cb, iters)


def ivf_pq_topk(
    assigned_corpus: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    book: list[list[list[float]]],
    k: int = 10,
    pool: int = 50,
    probes: int = 2,
    corpus_id: str = "vec_id",
    query_id: str = "q_id",
    corpus_vec: str = "embedding",
    query_vec: str = "q_vec",
    centroid_id: str = "centroid_id",
    centroid_vec: str = "c_vec",
) -> DataFrame:
    """IVF_PQ: the faiss big-corpus index as a composition — coarse
    cells prune the scan to ~probes/cells of the corpus
    (operators/ann.ivf_topk's probe join; pair with
    write_cell_partitioned for file-level pruning), PQ ADC ranks the
    probed candidates from their codes alone, and the exact dot
    rescores the per-query ``pool`` survivors. ``assigned_corpus``
    must carry ``centroid_id`` (from ann.ivf_assign). Every stage is
    deterministic (total orders throughout), so results are stable
    across partitionings — pinned against pq_adc_topk on the probed
    subset in tests.
    """
    q_cells = (
        queries.crossJoin(F.broadcast(centroids))
        .withColumn(
            "q_c_sim", F.expr(PT.dot_double(query_vec, centroid_vec, PT.SPARK))
        )
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy(query_id).orderBy(
                    F.desc("q_c_sim"), F.asc(centroid_id)
                )
            ),
        )
        .filter(F.col("_rn") <= probes)
        .select(query_id, query_vec, centroid_id)
    )
    m = len(book)
    # prune FIRST (left-semi on the probed cell ids), encode ONLY the
    # survivors: encoding before the join would evaluate the per-row
    # argmin folds for the ~(cells - probes)/cells of the corpus the
    # probe discards — exactly the scan the IVF layer exists to avoid.
    # The semi-join keeps each row once, so codes are computed once per
    # surviving row even when several queries probe the same cell.
    probed = assigned_corpus.join(
        F.broadcast(q_cells.select(centroid_id).distinct()),
        centroid_id,
        "left_semi",
    )
    encoded = pq_encode(probed, book, corpus_vec)
    codes = [f"pq_code_{s}" for s in range(m)]
    cands = encoded.select(corpus_id, centroid_id, *codes).join(
        F.broadcast(q_cells), centroid_id
    ).withColumn(
        "similarity", -F.expr(pq_adc_sql(query_vec, codes, book, PT.SPARK))
    )
    survivors = _two_phase_topk(cands, pool, query_id, corpus_id).select(
        query_id, corpus_id
    )
    rescored = (
        assigned_corpus.join(F.broadcast(survivors), corpus_id)
        .join(F.broadcast(queries.select(query_id, query_vec)), query_id)
        .withColumn(
            "similarity", F.expr(PT.dot_double(corpus_vec, query_vec, PT.SPARK))
        )
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("similarity"), F.asc(corpus_id))
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "similarity", "rank")
    )
