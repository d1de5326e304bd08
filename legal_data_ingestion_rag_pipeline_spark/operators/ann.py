"""Similarity search over embedding columns.

Two paths, mirroring the reference's exact-vs-IVFFLAT split
(rag.py:83-85 uses pgvector IVFFLAT lists=100/probes=10):

- brute-force cosine top-k: the correctness baseline. One broadcast of
  the (small) query set, a map-side dot product over the corpus, and a
  two-phase top-k (map-side partial top-k, then a merge over the tiny
  survivor set). No corpus shuffle at all.
- IVF (inverted-file) top-k: the 100 TB path. A deterministic coarse
  quantizer assigns every corpus vector to its nearest of C centroids
  (one narrow pass, persisted); queries probe only their P nearest
  cells, so the scan touches ~P/C of the data. Recall/latency knob =
  probes, exactly like the reference's ivfflat.probes.

Dot products are the portable double-fold (functions/portable), so the
brute-force path is oracle-checkable bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, Window, functions as F

from ..functions import portable as PT


def _dot(a: str, b: str) -> F.Column:
    return F.expr(PT.dot_double(a, b, PT.SPARK))


def _two_phase_topk(
    scored: DataFrame,
    k: int,
    query_id: str,
    corpus_id: str,
) -> DataFrame:
    """Per-query top-k without shuffling the scored corpus.

    A plain ``Window.partitionBy(query_id)`` hashes every scored row
    into n_queries reducer partitions — with a 100 TB corpus and 5
    queries that is 5 tasks each receiving 1/5 of the corpus.  Instead:

    phase 1 (map-side): an Arrow-batched ``mapInPandas`` keeps only the
    top-k rows per query *within each partition* (bounded state:
    n_queries x k rows), so the shuffle that follows carries at most
    n_partitions x n_queries x k narrow rows.

    phase 2 (merge): the exact ranking window runs on that tiny
    survivor set.  Ordering (similarity DESC, corpus_id ASC) is
    identical in both phases, so the result is bit-equal to the
    single-window plan — the global top-k is always a subset of the
    union of per-partition top-ks.
    """
    narrow = scored.select(query_id, corpus_id, "similarity")
    schema = narrow.schema

    def part_topk(batches: Iterator) -> Iterator:
        import pandas as pd

        best: pd.DataFrame | None = None
        for pdf in batches:
            cur = pdf if best is None else pd.concat((best, pdf))
            cur = cur.sort_values(
                ["similarity", corpus_id],
                ascending=[False, True],
                kind="mergesort",
            )
            best = cur.groupby(query_id, sort=False).head(k)
        if best is not None and len(best):
            yield best

    reduced = narrow.mapInPandas(part_topk, schema)
    w = Window.partitionBy(query_id).orderBy(
        F.desc("similarity"), F.asc(corpus_id)
    )
    return (
        reduced.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "similarity", "rank")
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    corpus_id: str = "vec_id",
    query_id: str = "q_id",
    corpus_vec: str = "embedding",
    query_vec: str = "q_vec",
) -> DataFrame:
    """Exact cosine top-k of every query against the corpus.

    Unit-normalized inputs assumed (cosine == dot), matching the
    reference's normalize_embeddings=True contract.  Scoring is a
    map-side broadcast cross join; ranking is the two-phase top-k, so
    the corpus is never shuffled and no reducer sees more than
    n_partitions x n_queries x k candidate rows.
    """
    joined = corpus.crossJoin(F.broadcast(queries)).withColumn(
        "similarity", _dot(corpus_vec, query_vec)
    )
    return _two_phase_topk(joined, k, query_id, corpus_id)


#: Above this many literal terms (n_centroids x dim) the inlined
#: array-of-structs expression tree risks blowing past codegen /
#: plan-size limits (a realistic 4096 lists x 768 dims is ~3M
#: literals); switch to the broadcast GEMM path instead.
IVF_INLINE_MAX_TERMS = 65536


def _collect_centroids(
    centroids: DataFrame, centroid_id: str, centroid_vec: str
) -> list[tuple[int, list[float]]]:
    """Collect + validate the centroid table (bounded: the IVF list
    count, the same small-side contract as a broadcast). Ids must be
    integral — reject rather than silently truncate."""
    out: list[tuple[int, list[float]]] = []
    for r in centroids.select(centroid_id, centroid_vec).collect():
        cid = r[0]
        if cid is None or not float(cid).is_integer():
            raise ValueError(
                f"centroid id column {centroid_id!r} must hold integral "
                f"values; got {cid!r}"
            )
        out.append((int(cid), [float(x) for x in r[1]]))
    out.sort(key=lambda t: t[0])
    return out


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    centroid_id: str = "centroid_id",
    centroid_vec: str = "c_vec",
    max_inline_terms: int = IVF_INLINE_MAX_TERMS,
) -> DataFrame:
    """Assign each corpus vector to its nearest centroid (argmax dot).

    Two map-side strategies, both shuffle-free over the fact-scale
    corpus (no crossJoin row blowup, no ``Window.partitionBy``):

    * small C x dim (<= max_inline_terms): centroids inlined as an
      array-of-structs literal; assignment is a pure codegen'd
      expression using the portable double-fold dot, so the result is
      oracle-reproducible bit-for-bit.
    * large C x dim: centroids ship as a Spark broadcast and an
      Arrow-batched ``mapInPandas`` computes one numpy GEMM per batch
      (n x dim @ dim x C) — the realistic 100 TB path; a 4096x768
      float64 centroid matrix is ~25 MB broadcast vs ~3M literal
      expression nodes.

    Ties break toward the smaller centroid id in BOTH paths (struct
    max on (c_sim, -cid) / first-argmax over id-sorted centroids). The
    GEMM path sums in numpy's pairwise order, so c_sim may differ from
    the fold order in the last ulp — the gated queries use small
    centroid sets and stay on the literal path.

    In a real deployment the assigned corpus is written partitioned by
    cell (write_cell_partitioned) so probes prune at the file level.
    """
    cents = _collect_centroids(centroids, centroid_id, centroid_vec)
    n_terms = sum(len(cv) for _, cv in cents)
    if n_terms > max_inline_terms:
        return _ivf_assign_gemm(corpus, cents, corpus_vec, centroid_id)
    cent_arr = F.array(
        *[
            F.struct(
                F.lit(cid).cast("bigint").alias("cid"),
                F.array(*[F.lit(x) for x in cv]).alias("cv"),
            )
            for cid, cv in cents
        ]
    )
    dot = PT.dot_double("c.cv", corpus_vec, PT.SPARK)
    best = F.expr(
        f"array_max(transform(_cents, c -> "
        f"struct({dot} AS c_sim, -c.cid AS neg_id)))"
    )
    return (
        corpus.withColumn("_cents", cent_arr)
        .withColumn("_best", best)
        .withColumn("c_sim", F.col("_best.c_sim"))
        .withColumn(centroid_id, (-F.col("_best.neg_id")).cast("bigint"))
        .drop("_cents", "_best")
    )


def _ivf_assign_gemm(
    corpus: DataFrame,
    cents: list[tuple[int, list[float]]],
    corpus_vec: str,
    centroid_id: str,
) -> DataFrame:
    """Broadcast-GEMM assignment: one numpy matmul per Arrow batch.

    Centroids are sorted by id, so numpy's first-max argmax breaks
    similarity ties toward the smaller centroid id — same contract as
    the literal path. Pre-existing c_sim/centroid_id columns (a
    re-assignment after a centroid refresh) are dropped first — the
    literal path overwrites them via withColumn; without the drop the
    declared output schema would carry duplicate field names and the
    Arrow stage would fail at runtime.
    """
    import numpy as np
    from pyspark.sql.types import DoubleType, LongType, StructType

    stale = [c for c in ("c_sim", centroid_id) if c in corpus.columns]
    if stale:
        corpus = corpus.drop(*stale)
    ids = np.asarray([cid for cid, _ in cents], dtype=np.int64)
    mat = np.asarray([cv for _, cv in cents], dtype=np.float64)
    b = corpus.sparkSession.sparkContext.broadcast((ids, mat))
    out_schema = StructType(corpus.schema.fields[:]).add(
        "c_sim", DoubleType()
    ).add(centroid_id, LongType())

    def assign(batches: Iterator) -> Iterator:
        import numpy as np  # noqa: PLC0415 — executor-side import
        import pandas as pd  # noqa: PLC0415 — executor-side import

        c_ids, c_mat = b.value
        dim = c_mat.shape[1]
        for pdf in batches:
            if not len(pdf):
                continue
            vals = pdf[corpus_vec].tolist()
            # NULL / wrong-length vectors: the literal path yields
            # c_sim NULL with the smallest centroid id (NULL dot
            # against every centroid, struct-max ties to -min id) —
            # match it instead of letting np.asarray raise on the
            # ragged batch.
            valid = np.asarray(
                [v is not None and len(v) == dim for v in vals], dtype=bool
            )
            sim_col = pd.array([pd.NA] * len(vals), dtype="Float64")
            ids_out = np.full(len(vals), c_ids[0], dtype=np.int64)
            if valid.any():
                idx = np.flatnonzero(valid)
                vecs = np.asarray([vals[i] for i in idx], dtype=np.float64)
                sims = vecs @ c_mat.T
                best = sims.argmax(axis=1)
                sim_col[idx] = sims[np.arange(len(idx)), best]
                ids_out[idx] = c_ids[best]
            pdf = pdf.copy()
            pdf["c_sim"] = sim_col
            pdf[centroid_id] = ids_out
            yield pdf

    return corpus.mapInPandas(assign, out_schema)


def ivf_topk(
    assigned_corpus: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 10,
    probes: int = 2,
    corpus_id: str = "vec_id",
    query_id: str = "q_id",
    corpus_vec: str = "embedding",
    query_vec: str = "q_vec",
    centroid_id: str = "centroid_id",
    centroid_vec: str = "c_vec",
) -> DataFrame:
    """Approximate top-k: probe only each query's `probes` nearest cells.

    assigned_corpus must carry `centroid_id` (from ivf_assign). The
    candidate set is corpus ∩ probed cells — an equi-join on the cell
    id, so the corpus side is never broadcast or re-shuffled beyond its
    cell partitioning.
    """
    q_cells = (
        queries.crossJoin(F.broadcast(centroids))
        .withColumn("q_c_sim", _dot(query_vec, centroid_vec))
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy(query_id).orderBy(F.desc("q_c_sim"), F.asc(centroid_id))
            ),
        )
        .filter(F.col("_rn") <= probes)
        .select(query_id, query_vec, centroid_id)
    )
    cands = assigned_corpus.join(F.broadcast(q_cells), centroid_id).withColumn(
        "similarity", _dot(corpus_vec, query_vec)
    )
    return _two_phase_topk(cands, k, query_id, corpus_id)


def write_cell_partitioned(
    assigned_corpus: DataFrame,
    path: str,
    centroid_id: str = "centroid_id",
) -> None:
    """Persist an ivf_assign'ed corpus partitioned by cell.

    This is the durable form of the IVF index at 100 TB: one
    directory per cell, so a probe-time read with a cell filter
    prunes at the FILE level (Catalyst partition pruning) — the scan
    never opens the ~(C - probes)/C of the data outside the probed
    cells. Pair with read_probed_cells.
    """
    assigned_corpus.write.mode("overwrite").partitionBy(centroid_id).parquet(path)


def read_probed_cells(
    spark,
    path: str,
    cells: list[int],
    centroid_id: str = "centroid_id",
) -> DataFrame:
    """Read only the probed cells of a cell-partitioned IVF index.

    The isin filter lands in the scan's PartitionFilters (asserted in
    tests/test_scale_ops.py), so unprobed cell directories are never
    listed into tasks.
    """
    df = spark.read.parquet(path)
    return df.filter(F.col(centroid_id).isin([int(c) for c in cells]))


def mllib_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    threshold: float = 2.0,
    num_hash_tables: int = 3,
    bucket_length: float = 2.0,
    corpus_id: str = "vec_id",
    query_id: str = "q_id",
    corpus_vec: str = "embedding",
    query_vec: str = "q_vec",
) -> DataFrame:
    """MLlib BucketedRandomProjectionLSH approximate top-k — the
    library-native ANN variant (SURVEY §4: the algorithmic substitute
    for pgvector's IVFFLAT). approxSimilarityJoin buckets both sides,
    joins only same-bucket pairs, and the per-query top-k runs on the
    surviving candidates. Euclidean distance; on unit vectors it is
    monotone with cosine, so rankings agree with the dot-product path.

    Seeded -> deterministic buckets, but the hash family is MLlib's
    own (not DuckDB-reproducible) — covered by behavior tests, while
    the hash-gated IVF path remains the oracle-checked variant.
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    c = corpus.withColumn("_v", array_to_vector(corpus_vec))
    q = queries.withColumn("_v", array_to_vector(query_vec))
    lsh = BucketedRandomProjectionLSH(
        inputCol="_v",
        outputCol="_h",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=42,
    ).fit(c)
    joined = lsh.approxSimilarityJoin(c, q, threshold, distCol="dist")
    w = Window.partitionBy(f"datasetB.{query_id}").orderBy(
        F.asc("dist"), F.asc(f"datasetA.{corpus_id}")
    )
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col(f"datasetB.{query_id}").alias(query_id),
            F.col(f"datasetA.{corpus_id}").alias(corpus_id),
            "dist",
            "rank",
        )
    )


def sq8_adc_proxy_sql(corpus_vec: str, query_vec: str, dialect: str) -> str:
    """SQL fragment for the stage-1 ADC score — identical structure in
    both dialects so the double folds are bit-identical:

        vmin_c * sum(q) + scale_c * dot(q, codes_c)
    """
    from .quantize import quantize_int8_sql

    parts = quantize_int8_sql(corpus_vec, dialect)
    vmin, vmax, codes = parts["vmin"], parts["vmax"], parts["q"]
    scale = f"(({vmax}) - ({vmin})) / 255.0"
    qsum = PT.reduce_(
        PT.transform(query_vec, "x -> CAST(x AS DOUBLE)", dialect),
        "CAST(0.0 AS DOUBLE)",
        "(s, x) -> s + x",
        dialect,
    )
    dot_q_codes = PT.dot_double(query_vec, codes, dialect)
    return f"({vmin}) * ({qsum}) + ({scale}) * ({dot_q_codes})"


def sq8_rescore_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    pool: int = 50,
    corpus_id: str = "vec_id",
    query_id: str = "q_id",
    corpus_vec: str = "embedding",
    query_vec: str = "q_vec",
) -> DataFrame:
    """Two-stage quantized retrieval (the faiss SQ8 search pattern):

    stage 1 ranks by the ADC (asymmetric distance computation) score:
    the FLOAT query against the DEQUANTIZED per-vector int8 codes —

        proxy = vmin_c * sum(q) + scale_c * dot(q, codes_c)

    which equals dot(q, dequant(codes_c)) exactly. Only the quantized
    tier (vmin, scale, codes: operators/quantize.py) is read on the
    corpus side — in production those are STORED, so this scan streams
    1/4-1/8 the bytes of the float corpus, the win at 100 TB; here
    they derive on the fly to keep the gate query self-contained.
    (A symmetric code x code integer dot is NOT used: per-vector
    affine scales distort cross-vector ranking — measured recall@10
    dropped to ~0.3 on the driver embeddings.) The per-query top
    ``pool`` survivors come from the shuffle-free two-phase top-k.

    stage 2 rescores only the survivors with the exact double-fold
    dot and returns the top ``k``. Both stages use total orders
    (score DESC, id ASC) and identical fold-order double arithmetic on
    both engines, so the result is deterministic and
    DuckDB-reproducible end to end.

    The quantized tier (vmin, scale, codes) is projected ONCE per
    corpus row behind a materialization barrier before the query
    cross-join — without it, CollapseProject re-inlines the
    quantization folds into the proxy and evaluates them once per
    (row, query) pair, a n_queries-x blowup of the dominant stage-1
    cost (the same re-inlining trapdoor as MinHash; see
    session.barrier).
    """
    from ..session import barrier
    from .quantize import quantize_int8_sql

    parts = quantize_int8_sql(corpus_vec, PT.SPARK)
    scale_sql = f"(({parts['vmax']}) - ({parts['vmin']})) / 255.0"
    cq = barrier(
        corpus.select(
            corpus_id,
            F.expr(parts["vmin"]).alias("_vmin"),
            F.expr(scale_sql).alias("_scale"),
            F.expr(parts["q"]).alias("_codes"),
        )
    )
    qsum = PT.reduce_(
        PT.transform(query_vec, "x -> CAST(x AS DOUBLE)", PT.SPARK),
        "CAST(0.0 AS DOUBLE)",
        "(s, x) -> s + x",
        PT.SPARK,
    )
    scored = cq.crossJoin(
        F.broadcast(queries.select(query_id, query_vec))
    ).withColumn(
        "similarity",
        F.expr(
            f"(_vmin) * ({qsum}) + "
            f"(_scale) * ({PT.dot_double(query_vec, '_codes', PT.SPARK)})"
        ),
    )
    survivors = _two_phase_topk(scored, pool, query_id, corpus_id).select(
        query_id, corpus_id
    )
    rescored = (
        corpus.join(F.broadcast(survivors), corpus_id)
        .join(F.broadcast(queries.select(query_id, query_vec)), query_id)
        .withColumn("similarity", _dot(corpus_vec, query_vec))
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("similarity"), F.asc(corpus_id))
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "similarity", "rank")
    )


# ---------------------------------------------------------------------------
# Binary (1-bit) quantization + Hamming retrieval
# ---------------------------------------------------------------------------

#: Bits packed per BIGINT word. 62, not 64: bit 63 would make the word
#: negative (fine for Spark) but DuckDB raises Overflow on 1<<63 and
#: 1<<62 already reaches the sign boundary of its checked shift, so the
#: portable packing stays strictly inside the positive range on both
#: engines. Cost: 64-dim vectors take 2 words instead of 1 — the
#: 32x-vs-float storage story is unchanged.
BINARY_WORD_BITS = 62


def binary_code_words_sql(vec: str, dim: int, dialect: str) -> list[str]:
    """SQL fragments packing the sign bits of ``vec`` (one bit per
    dimension, set iff the component is > 0) into positive BIGINT
    words, ``BINARY_WORD_BITS`` per word. Bit positions are disjoint,
    so the bounded sum equals the bitwise OR — summing keeps the fold
    a plain arithmetic reduce on both engines.

    This is the faiss/SPANN binary-hashing tier: at 100 TB the stored
    index is dim/8 bytes per vector (32x smaller than float32), and
    stage-1 scanning is XOR+popcount over words instead of a float
    dot — the cheapest proxy score there is.
    """
    n_words = (dim + BINARY_WORD_BITS - 1) // BINARY_WORD_BITS
    out = []
    for w in range(n_words):
        lo = w * BINARY_WORD_BITS
        n_bits = min(BINARY_WORD_BITS, dim - lo)
        if dialect == PT.SPARK:
            out.append(
                f"aggregate(sequence(0, {n_bits - 1}), CAST(0 AS BIGINT), "
                f"(acc, j) -> acc + IF(element_at({vec}, {lo} + j + 1) > 0, "
                f"shiftleft(CAST(1 AS BIGINT), j), CAST(0 AS BIGINT)))"
            )
        else:
            out.append(
                f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
                f"list_transform(range({n_bits}), j -> CASE WHEN "
                f"{vec}[{lo} + j + 1] > 0 THEN (CAST(1 AS BIGINT) << j) "
                f"ELSE CAST(0 AS BIGINT) END)), (acc, x) -> acc + x)"
            )
    return out


def binary_hamming_sql(a_words: list[str], b_words: list[str], dialect: str) -> str:
    """Hamming distance between two packed codes: popcount of XOR,
    summed across words. ``bit_count``/``xor`` exist on both engines
    (Spark spells xor ``^``)."""
    terms = []
    for aw, bw in zip(a_words, b_words):
        x = f"(({aw}) ^ ({bw}))" if dialect == PT.SPARK else f"xor(({aw}), ({bw}))"
        terms.append(f"bit_count({x})")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def binary_hamming_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    pool: int = 50,
    corpus_id: str = "vec_id",
    query_id: str = "q_id",
    corpus_vec: str = "embedding",
    query_vec: str = "q_vec",
) -> DataFrame:
    """Two-stage binary-quantized retrieval (the faiss IndexBinaryFlat
    + refine pattern, and the rescoring recipe behind binary MRL /
    Cohere int8-binary embeddings):

    stage 1 ranks by SYMMETRIC Hamming distance between 1-bit sign
    codes — corpus codes are packed once per row behind a
    materialization barrier (in production they are the STORED index:
    dim/8 bytes/vector, 32x smaller than float32; here they derive on
    the fly to keep the gate query self-contained), query codes fold
    into the broadcast. Scoring is XOR+popcount over BIGINT words,
    whole-stage-codegen arithmetic with no float math at all. The
    shuffle-free two-phase top-k keeps the per-query top ``pool``.

    stage 2 exact-rescores only the survivors with the double-fold dot
    and returns the top ``k``. Total orders on both stages
    (distance ASC / similarity DESC, id ASC) + integer stage-1 scores
    make the pipeline bit-deterministic and DuckDB-reproducible.
    """
    from ..session import barrier

    c_words = binary_code_words_sql(corpus_vec, dim, PT.SPARK)
    cq = barrier(
        corpus.select(
            corpus_id,
            *[F.expr(wexpr).alias(f"_cw{i}") for i, wexpr in enumerate(c_words)],
        )
    )
    q_words = binary_code_words_sql(query_vec, dim, PT.SPARK)
    qcoded = queries.select(
        query_id,
        *[F.expr(wexpr).alias(f"_qw{i}") for i, wexpr in enumerate(q_words)],
    )
    ham = binary_hamming_sql(
        [f"_cw{i}" for i in range(len(c_words))],
        [f"_qw{i}" for i in range(len(q_words))],
        PT.SPARK,
    )
    scored = cq.crossJoin(F.broadcast(qcoded)).withColumn(
        "similarity", F.expr(f"CAST(-({ham}) AS DOUBLE)")
    )
    survivors = _two_phase_topk(scored, pool, query_id, corpus_id).select(
        query_id, corpus_id
    )
    rescored = (
        corpus.join(F.broadcast(survivors), corpus_id)
        .join(F.broadcast(queries.select(query_id, query_vec)), query_id)
        .withColumn("similarity", _dot(corpus_vec, query_vec))
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("similarity"), F.asc(corpus_id))
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "similarity", "rank")
    )


def matryoshka_rescore_topk(
    corpus: DataFrame,
    queries: DataFrame,
    prefix_dim: int,
    k: int = 10,
    pool: int = 50,
    corpus_id: str = "vec_id",
    query_id: str = "q_id",
    corpus_vec: str = "embedding",
    query_vec: str = "q_vec",
) -> DataFrame:
    """Two-stage Matryoshka retrieval (MRL, Kusupati et al. 2022 — the
    adaptive-retrieval recipe shipped by OpenAI/Nomic embedding APIs):
    stage 1 ranks by the exact double-fold dot over only the FIRST
    ``prefix_dim`` components — with MRL-trained embeddings the prefix
    carries most of the signal, and at 100 TB the stored prefix tier
    streams prefix_dim/dim of the float bytes (combine with SQ8/binary
    on the prefix for a multiplied saving) — stage 2 exact-rescores
    the per-query top ``pool`` on full vectors.

    The corpus prefix is projected once per row behind an optimizer
    barrier (the SQ8 convention — without it the slice re-evaluates
    per query), queries broadcast, and the pool comes from the
    shuffle-free two-phase top-k. Deterministic end to end: both
    stages are fixed-fold-order double arithmetic with total orders.
    """
    from ..session import barrier

    if prefix_dim < 1:
        raise ValueError("prefix_dim must be >= 1")
    cq = barrier(
        corpus.select(
            corpus_id,
            F.expr(
                PT.slice_(corpus_vec, "1", prefix_dim, PT.SPARK)
            ).alias("_pref"),
        )
    )
    qcoded = queries.select(
        query_id,
        F.expr(PT.slice_(query_vec, "1", prefix_dim, PT.SPARK)).alias("_qpref"),
    )
    scored = cq.crossJoin(F.broadcast(qcoded)).withColumn(
        "similarity", _dot("_pref", "_qpref")
    )
    survivors = _two_phase_topk(scored, pool, query_id, corpus_id).select(
        query_id, corpus_id
    )
    rescored = (
        corpus.join(F.broadcast(survivors), corpus_id)
        .join(F.broadcast(queries.select(query_id, query_vec)), query_id)
        .withColumn("similarity", _dot(corpus_vec, query_vec))
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("similarity"), F.asc(corpus_id))
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "similarity", "rank")
    )


def ivf_binary_topk(
    assigned_corpus: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    probes: int = 2,
    pool: int = 30,
    corpus_id: str = "vec_id",
    query_id: str = "q_id",
    corpus_vec: str = "embedding",
    query_vec: str = "q_vec",
    centroid_id: str = "centroid_id",
    centroid_vec: str = "c_vec",
) -> DataFrame:
    """IVF coarse cells x binary fine scan — the production faiss
    IndexIVF+binary/refine composition, and the cheapest full hybrid
    here: the query probes its ``probes`` nearest cells (touching
    ~probes/C of the corpus), candidates inside the probed cells rank
    by XOR+popcount Hamming over packed sign words (no float math on
    the fine scan — at 100 TB the cells store ONLY the binary tier,
    dim/8 bytes/vector), and the per-query top ``pool`` get the exact
    double-fold rescore. Every stage keeps a total order and integer
    stage-2 scores, so the three-stage approximate pipeline is
    hash-gateable end to end.
    """
    from ..session import barrier

    c_words = binary_code_words_sql(corpus_vec, dim, PT.SPARK)
    # Barrier the corpus-side packing (module convention, see
    # binary_hamming_topk / sq8_rescore_topk): without the Exchange,
    # CollapseProject re-inlines the 62-term packing folds into the
    # per-(row, probed-query) Hamming score — an n_queries-x blowup.
    # (A STORED tier — write_binary_tier — needs no barrier: parquet
    # materializes the words physically.)
    tier = barrier(
        assigned_corpus.select(
            corpus_id,
            centroid_id,
            *[F.expr(w).alias(f"_cw{i}") for i, w in enumerate(c_words)],
        )
    )
    return ivf_binary_topk_from_tier(
        tier,
        assigned_corpus.select(corpus_id, corpus_vec),
        centroids,
        queries,
        dim,
        k=k,
        probes=probes,
        pool=pool,
        corpus_id=corpus_id,
        query_id=query_id,
        corpus_vec=corpus_vec,
        query_vec=query_vec,
        centroid_id=centroid_id,
        centroid_vec=centroid_vec,
    )


def ivf_binary_topk_from_tier(
    tier: DataFrame,
    corpus_vecs: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    probes: int = 2,
    pool: int = 30,
    corpus_id: str = "vec_id",
    query_id: str = "q_id",
    corpus_vec: str = "embedding",
    query_vec: str = "q_vec",
    centroid_id: str = "centroid_id",
    centroid_vec: str = "c_vec",
) -> DataFrame:
    """``ivf_binary_topk`` over a PRE-PACKED sign tier — the stored-
    index read path.  ``tier`` carries (corpus_id, centroid_id,
    _cw0.._cwN) — at 100 TB this is the parquet table
    ``write_binary_tier`` wrote, cell-partitioned, dim/8 bytes per
    vector; ``corpus_vecs`` is the float table, touched ONLY by the
    final rescore join over pool*n_queries survivor rows.  Stages 1-2
    never read a float corpus column (asserted from the physical plan
    in tests/test_ann_tier.py); the probed-cell equi-join on the
    partition column prunes unprobed cell directories (broadcast-side
    dynamic partition pruning on a real cluster).
    """
    q_cells = (
        queries.crossJoin(F.broadcast(centroids))
        .withColumn("q_c_sim", _dot(query_vec, centroid_vec))
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
    q_words = binary_code_words_sql(query_vec, dim, PT.SPARK)
    qb = q_cells.select(
        query_id,
        centroid_id,
        *[F.expr(w).alias(f"_qw{i}") for i, w in enumerate(q_words)],
    )
    n_words = len(q_words)
    ham = binary_hamming_sql(
        [f"_cw{i}" for i in range(n_words)],
        [f"_qw{i}" for i in range(n_words)],
        PT.SPARK,
    )
    scored = tier.join(F.broadcast(qb), centroid_id).withColumn(
        "similarity", F.expr(f"CAST(-({ham}) AS DOUBLE)")
    )
    survivors = _two_phase_topk(scored, pool, query_id, corpus_id).select(
        query_id, corpus_id
    )
    rescored = (
        corpus_vecs.select(corpus_id, corpus_vec)
        .join(F.broadcast(survivors), corpus_id)
        .join(F.broadcast(queries.select(query_id, query_vec)), query_id)
        .withColumn("similarity", _dot(corpus_vec, query_vec))
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("similarity"), F.asc(corpus_id))
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "similarity", "rank")
    )


def write_binary_tier(
    assigned_corpus: DataFrame,
    path: str,
    dim: int,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    centroid_id: str | None = "centroid_id",
    mode: str = "overwrite",
) -> None:
    """Persist the packed 1-bit sign tier as a standing table — the
    durable form of the quantized index the in-plan queries derive on
    the fly.  Stored: (corpus_id, _cw0.._cwN) at dim/8 bytes of code
    per vector (32x smaller than float32), cell-partitioned by
    ``centroid_id`` when given so a probe-time read prunes unprobed
    cell directories at the FILE level; pass ``centroid_id=None`` for
    the flat (IndexBinaryFlat) layout used by binary_hamming_topk.
    Floats are NOT stored in the tier: the rescore stage reads them
    from the primary table, which the fine scan never opens.
    """
    c_words = binary_code_words_sql(corpus_vec, dim, PT.SPARK)
    cols = [F.col(corpus_id)]
    if centroid_id is not None:
        cols.append(F.col(centroid_id))
    tier = assigned_corpus.select(
        *cols, *[F.expr(w).alias(f"_cw{i}") for i, w in enumerate(c_words)]
    )
    # mode="append" is the incremental-ADD path: with the SAME frozen
    # centroids, per-vector assignment is deterministic, so appending a
    # new batch's tier rows yields byte-for-byte the tier a full
    # rebuild over old+new would write (gated by ann_ivf_incremental_add)
    writer = tier.write.mode(mode)
    if centroid_id is not None:
        writer = writer.partitionBy(centroid_id)
    writer.parquet(path)


def read_binary_tier(spark, path: str) -> DataFrame:
    """Read a ``write_binary_tier`` table (schema: corpus_id,
    [centroid_id], _cw0.._cwN).  The scan's ReadSchema contains only
    id + word columns — there is no float column in the tier to
    mis-read (tests/test_ann_tier.py asserts this from the plan)."""
    return spark.read.parquet(path)


def write_pq_codes(
    corpus: DataFrame,
    book: list[list[list[float]]],
    path: str,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    centroid_id: str | None = None,
) -> None:
    """Persist PQ codes as a standing table: (corpus_id, pq_code_0..
    pq_code_{m-1}), m bytes of code per vector, optionally
    cell-partitioned (the faiss IVFADC layout).  Read back with
    ``read_pq_codes`` and search with ``pq_adc_topk_from_codes`` —
    the ADC scan then touches ONLY the stored codes until rescore."""
    from .pq import pq_encode

    encoded = pq_encode(corpus, book, corpus_vec)
    m = len(book)
    cols = [F.col(corpus_id)]
    if centroid_id is not None:
        cols.append(F.col(centroid_id))
    codes = encoded.select(*cols, *[F.col(f"pq_code_{s}") for s in range(m)])
    writer = codes.write.mode("overwrite")
    if centroid_id is not None:
        writer = writer.partitionBy(centroid_id)
    writer.parquet(path)


def read_pq_codes(spark, path: str) -> DataFrame:
    """Read a ``write_pq_codes`` table."""
    return spark.read.parquet(path)


def pq_adc_topk_from_codes(
    codes_df: DataFrame,
    corpus_vecs: DataFrame,
    queries: DataFrame,
    book: list[list[list[float]]],
    k: int = 10,
    pool: int = 50,
    corpus_id: str = "vec_id",
    query_id: str = "q_id",
    corpus_vec: str = "embedding",
    query_vec: str = "q_vec",
) -> DataFrame:
    """``pq_adc_topk`` over a STORED code table: stage 1 ranks by ADC
    distance computed from ``codes_df`` alone (m bytes/vector read —
    no float corpus column until rescore), stage 2 exact-rescores the
    per-query top ``pool`` from the float table."""
    from .pq import pq_adc_sql

    m = len(book)
    codes = [f"pq_code_{s}" for s in range(m)]
    scored = (
        codes_df.select(corpus_id, *codes)
        .crossJoin(F.broadcast(queries.select(query_id, query_vec)))
        .withColumn(
            "similarity",
            -F.expr(pq_adc_sql(query_vec, codes, book, PT.SPARK)),
        )
    )
    survivors = _two_phase_topk(scored, pool, query_id, corpus_id).select(
        query_id, corpus_id
    )
    rescored = (
        corpus_vecs.select(corpus_id, corpus_vec)
        .join(F.broadcast(survivors), corpus_id)
        .join(F.broadcast(queries.select(query_id, query_vec)), query_id)
        .withColumn("similarity", _dot(corpus_vec, query_vec))
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("similarity"), F.asc(corpus_id))
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "similarity", "rank")
    )
