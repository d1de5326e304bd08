"""Second-stage reranking for retrieval (the RAG retrieve->rerank
pattern).

Production RAG stacks retrieve a cheap candidate pool (BM25 / ANN)
and rerank only the pool with an expensive scorer (a cross-encoder).
The shape matters at scale: the expensive model touches ``pool``
rows per query, never the corpus, so reranking cost is independent
of corpus size.

Two scorers:

- jaccard_rerank — deterministic token-set Jaccard overlap between
  the query terms and each candidate; pure column expressions whose
  integer-count division is bit-identical in DuckDB, so the gated
  two-stage query is value-hash checkable end to end.
- CrossEncoderReranker — the sentence-transformers cross-encoder as
  a batched pandas_udf, import-gated exactly like
  plans/rag.SentenceTransformerEmbedder (the model is not in the CI
  image; the Spark plumbing — pool-bounded scoring, total-order
  ranking — is identical to the Jaccard path and tested through it).

Mirrors /root/reference/rag.py's retrieval surface (search returns
the raw vector pool; reranking is the standard production follow-on
the reference leaves to the caller).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def jaccard_rerank(
    candidates: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    stage1_col: str = "score",
    k: int = 5,
    q_id: str | None = None,
) -> DataFrame:
    """Rerank a candidate pool by Jaccard(token set, query terms).

    Output: (id, stage1, rerank_score, rank) with the total order
    (rerank DESC, stage1 DESC, id ASC) — stage-1 score breaks rerank
    ties so the result is deterministic.  With ``q_id`` the ranking
    windows per query; the window is safe because it runs over the
    POOL (bounded rows per query), never the corpus.
    """
    qset = sorted(set(t.lower() for t in query_terms))
    in_list = ", ".join("'" + t.replace("'", "\\'") + "'" for t in qset)
    toks = f"array_distinct(filter(split(lower({text_col}), '\\\\s+'), t -> t != ''))"
    inter = f"size(filter({toks}, t -> t IN ({in_list})))"
    union = f"size({toks}) + {len(qset)} - {inter}"
    scored = candidates.withColumn(
        "rerank_score",
        F.expr(
            f"CAST({inter} AS DOUBLE) / CAST(greatest({union}, 1) AS DOUBLE)"
        ),
    )
    order = [F.desc("rerank_score"), F.desc(stage1_col), F.asc(id_col)]
    if q_id is not None:
        w = Window.partitionBy(q_id).orderBy(*order)
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .drop(text_col)
        )
    return (
        scored.orderBy(*order)
        .limit(k)
        .withColumn(
            "rank",
            F.row_number().over(Window.orderBy(*order)),
        )
        .drop(text_col)
    )


class CrossEncoderReranker:
    """sentence-transformers CrossEncoder over (query, passage) pairs
    as a batched pandas_udf.  Import-gated: the model is not in this
    image, so construction raises NotImplementedError with the
    deterministic fallback named (the multimodal-decode convention)."""

    def __init__(self, model_name: str = "cross-encoder/ms-marco-MiniLM-L-6-v2"):
        try:
            import sentence_transformers  # noqa: F401
        except ImportError as e:  # pragma: no cover - not in CI image
            raise NotImplementedError(
                "sentence-transformers is not installed; use jaccard_rerank "
                "for deterministic CI runs"
            ) from e
        self.model_name = model_name

    def rerank(
        self,
        candidates: DataFrame,
        query: str,
        text_col: str = "text",
        id_col: str = "doc_id",
        stage1_col: str = "score",
        k: int = 5,
    ) -> DataFrame:  # pragma: no cover - not in CI image
        from pyspark.sql.functions import pandas_udf
        from pyspark.sql.types import DoubleType

        model_name = self.model_name

        @pandas_udf(DoubleType())
        def _score(texts):
            import pandas as pd
            from sentence_transformers import CrossEncoder

            global _ce_model  # executor-side lazy singleton
            try:
                model = _ce_model
            except NameError:
                model = _ce_model = CrossEncoder(model_name)
            return pd.Series(
                [float(s) for s in model.predict([(query, t) for t in texts])]
            )

        order = [
            F.desc("rerank_score"),
            F.desc(stage1_col),
            F.asc(id_col),
        ]
        return (
            candidates.withColumn("rerank_score", _score(F.col(text_col)))
            .orderBy(*order)
            .limit(k)
            .withColumn("rank", F.row_number().over(Window.orderBy(*order)))
            .drop(text_col)
        )
