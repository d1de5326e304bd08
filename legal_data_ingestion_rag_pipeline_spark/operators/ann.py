"""Similarity search over embedding columns.

Two paths, mirroring the reference's exact-vs-IVFFLAT split
(rag.py:83-85 uses pgvector IVFFLAT lists=100/probes=10):

- brute-force cosine top-k: the correctness baseline. One broadcast of
  the (small) query set, a map-side dot product over the corpus, and a
  per-query top-k window. No corpus shuffle at all when k-per-query
  fits TakeOrdered semantics.
- IVF (inverted-file) top-k: the 100 TB path. A deterministic coarse
  quantizer assigns every corpus vector to its nearest of C centroids
  (one narrow pass, persisted); queries probe only their P nearest
  cells, so the scan touches ~P/C of the data. Recall/latency knob =
  probes, exactly like the reference's ivfflat.probes.

Dot products are the portable double-fold (functions/portable), so the
brute-force path is oracle-checkable bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions import portable as PT


def _dot(a: str, b: str) -> F.Column:
    return F.expr(PT.dot_double(a, b, PT.SPARK))


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
    reference's normalize_embeddings=True contract.
    """
    joined = corpus.crossJoin(F.broadcast(queries)).withColumn(
        "similarity", _dot(corpus_vec, query_vec)
    )
    w = Window.partitionBy(query_id).orderBy(
        F.desc("similarity"), F.asc(corpus_id)
    )
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "similarity", "rank")
    )


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    centroid_id: str = "centroid_id",
    centroid_vec: str = "c_vec",
) -> DataFrame:
    """Assign each corpus vector to its nearest centroid (argmax dot).

    Centroids are broadcast; assignment is one narrow pass. In a real
    deployment the assigned corpus is written partitioned by cell so
    probes prune at the file level.
    """
    scored = corpus.crossJoin(F.broadcast(centroids)).withColumn(
        "c_sim", _dot(corpus_vec, centroid_vec)
    )
    w = Window.partitionBy(corpus_id).orderBy(F.desc("c_sim"), F.asc(centroid_id))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", centroid_vec)
    )


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
    w = Window.partitionBy(query_id).orderBy(F.desc("similarity"), F.asc(corpus_id))
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "similarity", "rank")
    )


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
