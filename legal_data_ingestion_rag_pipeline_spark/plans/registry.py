"""Query registry shared by all driver-facing query modules."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    # DuckDB SQL over pre-registered table views.  A callable takes the
    # sf_dir and returns the SQL — used when the oracle must embed
    # data-derived literals (e.g. a k-means-trained codebook) that are
    # deterministic given the tables but not expressible in SQL.
    oracle: str | Callable[[str], str] | None
    bench: bool = False  # part of bench.py's headline set
    doc: str = ""

    def oracle_sql(self, sf_dir: str) -> str | None:
        return self.oracle(sf_dir) if callable(self.oracle) else self.oracle


_REGISTRY: dict[str, QuerySpec] = {}

#: The correctness driver gates only the FIRST 50 registered queries, so
#: ordering is a verification budget.  Spend it explicitly: the
#: LLM-data-pipeline family (dedup/ANN/RAG/textstats/streaming/
#: multimodal — the north-star operators) first, then the events-table
#: family, then the flagship + highest-coverage reference-parity
#: queries.  Everything after position 50 is still registered (full
#: API surface, pytest + tools/oracle_check coverage) but receives no
#: driver CORRECTNESS row.
GATE_PRIORITY: tuple[str, ...] = (
    # LLM family: dedup (round-5 rotation: dedup_simhash rotated OUT —
    # dedup_simhash_pairs' oracle + pytest cover the same signature
    # path — to spend slots on the four round-4 operators that had no
    # driver CORRECTNESS row: ann_sq8_rescore_topk, ann_pq_adc_topk,
    # contrastive_negatives, domain_mixture_sample.  Also out this
    # round: ann_ivf_recall [family partner ann_ivf_topk stays],
    # user_event_type_sets, incremental_rollup_maintenance — all keep
    # tools/oracle_check + pytest coverage.)
    # (round-5 rotation: dedup_incremental_exact out — its anti-join
    # machinery stays gated via backfill_anti_join — for
    # boilerplate_segment_removal, the new line-level dedup family.)
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_embedding_srp_lsh",
    "boilerplate_segment_removal",
    "dedup_cluster_components",
    "last_wins_dedup",
    "streaming_dedup_docs",
    "streaming_neardup_docs",
    # LLM family: similarity search / clustering (ann_ivf_full_probe
    # rotated out; ann_ivf_topk gates the same path)
    "ann_bruteforce_topk",
    "ann_ivf_topk",
    # (round-5 rotation: embedding_label_centroids out — the centroid
    # decimal-sum math stays gated via kmeans_two_iterations — for
    # ann_pq_trained, the k-means-trained codebook path.)
    "ann_sq8_rescore_topk",
    "ann_pq_adc_topk",
    "ann_pq_trained",
    "contrastive_negatives",
    "domain_mixture_sample",
    "kmeans_two_iterations",
    "cms_heavy_hitters",
    # LLM family: text analysis + RAG + curation + streaming +
    # multimodal (textstats_fingerprint -> fingerprint_winnowing
    # subsumes the rolling hash; multimodal_frame_sample ->
    # multimodal_features gates the same plumbing)
    "textstats_lang_id",
    "textstats_quality",
    "quality_classifier_filter",
    "bpe_train_merges",
    "fingerprint_winnowing",
    "rag_semantic_search",
    "curation_pipeline",
    "streaming_tumbling_counts",
    "multimodal_features",
    "fts_bm25_search",
    "decontamination_overlap",
    "sequence_packing",
    "pii_redaction",
    # events-table family (timestamp/window/sessionization operators)
    "record_canonical_hash",
    "error_breakdown",
    "daily_series_last7",
    "window_argmax_per_user",
    "variation_tracking",
    # (round-5 rotation: running_total_per_user and session_window_agg
    # out — window_argmax_per_user and sessionization gate the same
    # window-frame / gap-session machinery; moving_avg_3rows was
    # already out on the same grounds.)
    "sessionization",
    "asof_prev_purchase",
    "funnel_signup_click_purchase",
    "range_join_clicks_before_purchase",
    "semistructured_props_stats",
    # flagship + reference-parity core (highest §2 coverage per slot)
    "list_topk_by_date",
    "quality_sanity_report",
    "normalize_entities",
    "status_validation_split",
    # (round-5 rotation: multiformat_date_parse and chunk_documents
    # out for quality_classifier_filter and bpe_train_merges — T4
    # keeps the reference's 15 ported selftest cases in
    # tests/test_dates.py + oracle_check; T12 keeps its boundary
    # goldens + seeded fuzz, and the chunker feeds the still-gated
    # rag_semantic_search.)
    "parties_grammar",
    "surrogate_dim_ids",
    "merge_upsert_state",
    "case_detail_joins",
    "backfill_anti_join",
)


def register(name: str, oracle: str | None, bench: bool = False, doc: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _REGISTRY[name] = QuerySpec(name, fn, oracle, bench, doc)
        return fn

    return deco


def registry() -> dict[str, QuerySpec]:
    """All registered queries (importing plans pulls in every module)."""
    from . import (  # noqa: F401
        driver_queries,
        driver_queries_analytics,
        driver_queries_multimodal,
        driver_queries_pretrain,
        driver_queries_scale,
        driver_queries_similarity,
        driver_queries_streaming,
        driver_queries_tpch,
    )

    ordered: dict[str, QuerySpec] = {}
    for name in GATE_PRIORITY:
        if name in _REGISTRY:
            ordered[name] = _REGISTRY[name]
    for name, spec in _REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    return ordered
