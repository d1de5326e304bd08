"""RAG layer: chunk -> embed -> store; semantic search (SURVEY §2's
S8/T12/T13/J4/J5/O3/A9, reference rag.py).

The embedder is pluggable behind one interface
(DataFrame[text_col] -> DataFrame[+embedding]):

- HashEmbedder: deterministic, pure-Spark (token-hash bucket counts,
  unit-normalized) — CI/oracle-safe stand-in with the same contract;
- SentenceTransformerEmbedder: the reference's all-MiniLM-L6-v2 via a
  batched pandas_udf with an executor-side lazy model singleton —
  gated behind an import-try because the model library is not in this
  image.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions import portable as PT
from ..functions.chunking import CHUNK_OVERLAP, CHUNK_SIZE, SNIPPET_CHARS, chunk_text
from ..session import barrier

S = PT.SPARK


class HashEmbedder:
    """Deterministic bag-of-token-hash embedding, unit-normalized.

    dim slots = counts of token hashes mod dim; same arithmetic is
    expressible in the DuckDB oracle (driver_queries_similarity).
    """

    def __init__(self, dim: int = 64):
        self.dim = dim

    def embed(self, df: DataFrame, text_col: str, out_col: str = "embedding") -> DataFrame:
        hashed = barrier(
            df.withColumn("_th", F.expr(PT.hash_array(PT.tokens(text_col, S), S)))
        )
        slots = ", ".join(
            f"CAST(size(filter(_th, h -> h % {self.dim} = {d})) AS DOUBLE)"
            for d in range(self.dim)
        )
        emb = barrier(hashed.withColumn("_v", F.expr(f"array({slots})")))
        norm = F.expr(f"sqrt({PT.dot_double('_v', '_v', S)})")
        return (
            emb.withColumn("_n", norm)
            .withColumn(
                out_col,
                F.when(
                    F.col("_n") > 0, F.expr("transform(_v, x -> x / _n)")
                ).otherwise(F.expr(f"array_repeat(CAST(0.0 AS DOUBLE), {self.dim})")),
            )
            .drop("_th", "_v", "_n")
        )


class MLlibTfidfEmbedder:
    """MLlib pipeline embedder (Tokenizer -> HashingTF -> IDF ->
    Normalizer), the SURVEY §7.3 CI-friendly alternative: JVM-side,
    deterministic, no Python in the executor path. Same Embedder
    interface as HashEmbedder/SentenceTransformerEmbedder; the IDF
    model is fit on the embedded corpus (at scale: fit once on a
    sample, broadcast, reuse across batches).

    Not DuckDB-reproducible (MLlib's murmur hashing), so gate queries
    use HashEmbedder; this one is covered by rows/behavior tests.
    """

    def __init__(self, dim: int = 64):
        self.dim = dim

    def embed(self, df: DataFrame, text_col: str, out_col: str = "embedding") -> DataFrame:
        from pyspark.ml.feature import IDF, HashingTF, Normalizer, Tokenizer
        from pyspark.ml.functions import vector_to_array

        tok = Tokenizer(inputCol=text_col, outputCol="_words")
        tf = HashingTF(inputCol="_words", outputCol="_tf", numFeatures=self.dim)
        words = tok.transform(df.withColumn(text_col, F.coalesce(F.col(text_col), F.lit(""))))
        tfd = tf.transform(words)
        idf = IDF(inputCol="_tf", outputCol="_tfidf").fit(tfd)
        vec = idf.transform(tfd)
        norm = Normalizer(inputCol="_tfidf", outputCol="_nvec", p=2.0)
        out = norm.transform(vec)
        return out.withColumn(out_col, vector_to_array("_nvec")).drop(
            "_words", "_tf", "_tfidf", "_nvec"
        )


class SentenceTransformerEmbedder:
    """all-MiniLM-L6-v2 (384-d, normalized) as a batched pandas_udf —
    the production path matching rag.py:26-42. Requires the
    sentence-transformers package on executors."""

    def __init__(self, model_name: str = "sentence-transformers/all-MiniLM-L6-v2", dim: int = 384):
        try:
            import sentence_transformers  # noqa: F401
        except ImportError as e:  # pragma: no cover - not in CI image
            raise NotImplementedError(
                "sentence-transformers is not installed in this environment; "
                "use HashEmbedder for deterministic CI runs"
            ) from e
        self.model_name = model_name
        self.dim = dim

    def embed(self, df: DataFrame, text_col: str, out_col: str = "embedding") -> DataFrame:  # pragma: no cover
        from pyspark.sql.functions import pandas_udf
        from pyspark.sql.types import ArrayType, FloatType

        model_name = self.model_name

        @pandas_udf(ArrayType(FloatType()))
        def _embed(texts):
            import pandas as pd
            from sentence_transformers import SentenceTransformer

            global _st_model  # executor-side lazy singleton (rag.py:32-38)
            try:
                model = _st_model
            except NameError:
                model = _st_model = SentenceTransformer(model_name)
            vecs = model.encode(texts.tolist(), normalize_embeddings=True)
            return pd.Series([v.tolist() for v in vecs])

        return df.withColumn(out_col, _embed(F.col(text_col)))


def backfill_chunk_embeddings(
    cases: DataFrame,
    existing_embeddings: DataFrame | None,
    embedder,
    size: int = CHUNK_SIZE,
    overlap: int = CHUNK_OVERLAP,
) -> DataFrame:
    """Chunk + embed every case missing from the embeddings table
    (rag.py:90-156): left-anti candidates -> chunk(1200/200) -> the
    empty-text sentinel (0,'') so re-runs don't reselect -> embed ->
    rows keyed (case_number, chunk_id).

    One distributed job replaces the reference's LIMIT-1000 pagination
    loop; at scale the anti-join prunes with a broadcast of embedding
    keys or a shuffled anti, and chunking/embedding are map-side.
    """
    candidates = cases.select("case_number", "docket_text")
    if existing_embeddings is not None:
        candidates = candidates.join(
            existing_embeddings.select("case_number").distinct(),
            "case_number",
            "left_anti",
        )
    chunks = chunk_text(
        candidates, text_col="docket_text", key_cols=("case_number",),
        size=size, overlap=overlap,
    )
    sentinel = (
        candidates.join(chunks.select("case_number").distinct(), "case_number", "left_anti")
        .select(
            "case_number",
            F.lit(0).alias("chunk_id"),
            F.lit("").alias("chunk_text"),
        )
    )
    all_chunks = chunks.select("case_number", "chunk_id", "chunk_text").unionByName(sentinel)
    embedded = embedder.embed(all_chunks, "chunk_text").withColumn(
        "updated_at", F.current_timestamp()
    )
    if existing_embeddings is not None:
        embedded = existing_embeddings.unionByName(embedded, allowMissingColumns=True)
    return embedded


def search_dockets(
    tables: dict[str, DataFrame],
    embeddings: DataFrame,
    query: str,
    top_k: int = 5,
    embedder=None,
) -> DataFrame:
    """Semantic search (rag.py:158-227): embed query -> cosine over
    chunks -> candidate pool LIMIT max(k*10, 50) -> best-chunk-per-case
    argmax -> top-k cases joined to case/judge/court detail, snippet
    LEFT(chunk_text, 280).

    Raises ValueError on the API's request bounds (api.py:64-74
    Pydantic rules -> HTTP 400): query >= 2 chars, 1 <= top_k <= 50.
    """
    if query is None or len(query.strip()) < 2:
        raise ValueError("query must be at least 2 characters")
    if not 1 <= top_k <= 50:
        raise ValueError("limit must be between 1 and 50")
    if embedder is None:
        embedder = HashEmbedder()
    spark = embeddings.sparkSession
    qdf = embedder.embed(
        spark.createDataFrame([(query,)], "q_text string"), "q_text", "q_vec"
    )
    pool_n = max(top_k * 10, 50)
    scored = embeddings.crossJoin(F.broadcast(qdf.select("q_vec"))).withColumn(
        "similarity", F.expr(PT.dot_double("embedding", "q_vec", S))
    )
    pool = scored.orderBy(F.desc("similarity"), "case_number", "chunk_id").limit(pool_n)
    w = Window.partitionBy("case_number").orderBy(F.desc("similarity"), "chunk_id")
    best = (
        pool.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "case_number",
            "chunk_id",
            "similarity",
            F.substring("chunk_text", 1, SNIPPET_CHARS).alias("snippet"),
        )
    )
    cases = tables["cases"]
    detail = (
        best.join(
            cases.select("case_number", "title", "filed_date", "judge_id", "court_id"),
            "case_number",
            "left",
        )
        .join(F.broadcast(tables["judges"].select(F.col("id").alias("judge_id"), F.col("name").alias("judge"))), "judge_id", "left")
        .join(F.broadcast(tables["courts"].select(F.col("id").alias("court_id"), F.col("name").alias("court"))), "court_id", "left")
        .select(
            "case_number",
            "title",
            F.date_format("filed_date", "yyyy-MM-dd").alias("filed_date"),
            "judge",
            "court",
            "similarity",
            "chunk_id",
            "snippet",
        )
    )
    return detail.orderBy(F.desc("similarity"), "case_number").limit(top_k)
