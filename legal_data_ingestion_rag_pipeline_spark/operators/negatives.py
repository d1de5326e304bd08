"""Deterministic negative sampling for contrastive training pairs.

Embedding-model training data pairs each anchor with k "random"
negatives drawn from the corpus. Done with rand() the draw changes on
every retry/backfill; here the draw is ranked by a content hash of
(anchor_id, candidate_id), so the same inputs always produce the same
negatives — and the DuckDB oracle can reproduce them bit-for-bit
(portable polynomial hash, functions/portable).

Scale shape: candidates are scored map-side against the broadcast
anchor set and reduced with the shuffle-free two-phase top-k
(operators/ann) — the corpus is never shuffled, and no reducer sees
more than n_partitions x n_anchors x k narrow rows. Exclusions (the
anchor itself, known positives) are an anti-join before ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import portable as PT
from .ann import _two_phase_topk


def hash_rank_expr(anchor_id: str, candidate_id: str, dialect: str) -> str:
    """Portable per-(anchor, candidate) rank key in [0, P)."""
    pair = (
        f"concat(CAST({anchor_id} AS STRING), '|', "
        f"CAST({candidate_id} AS STRING))"
        if dialect == PT.SPARK
        else f"concat(CAST({anchor_id} AS VARCHAR), '|', "
        f"CAST({candidate_id} AS VARCHAR))"
    )
    return PT.poly_hash(pair, dialect)


def sample_negatives(
    anchors: DataFrame,
    corpus: DataFrame,
    k: int = 8,
    anchor_id: str = "q_id",
    corpus_id: str = "vec_id",
    positives: DataFrame | None = None,
) -> DataFrame:
    """k deterministic negatives per anchor: (anchor_id, corpus_id, rank).

    ``positives`` (optional) carries (anchor_id, corpus_id) pairs to
    exclude beyond the anchor itself.
    """
    cands = corpus.select(corpus_id).crossJoin(
        F.broadcast(anchors.select(anchor_id))
    ).filter(F.col(corpus_id) != F.col(anchor_id))
    if positives is not None:
        cands = cands.join(
            F.broadcast(positives.select(anchor_id, corpus_id)),
            [anchor_id, corpus_id],
            "left_anti",
        )
    scored = cands.withColumn(
        "similarity", F.expr(hash_rank_expr(anchor_id, corpus_id, PT.SPARK))
    )
    return _two_phase_topk(scored, k, anchor_id, corpus_id).select(
        anchor_id, corpus_id, "rank"
    )
