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

#: The correctness driver gates only the FIRST 50 registered queries,
#: so ordering is a verification budget.  Spend it explicitly: the
#: LLM-data-pipeline family (dedup/ANN/RAG/textstats/streaming/
#: multimodal — the north-star operators) first, then the statistics
#: and TPC-H plan-shape families, then the flagship +
#: highest-coverage reference-parity queries.  Everything after
#: position 50 is still registered (full API surface, pytest +
#: tools/oracle_check coverage) but receives no driver CORRECTNESS
#: row.
#:
#: The per-round rotation history (which slots rotated when, and the
#: gated machinery partner every OUT keeps) lives in ROTATIONS.md —
#: round-10 entry: 14 in (trained-IVF DBSCAN + recall twin, the
#: round-9 never-gated stats/dedup families, four TPC-H
#: decorrelation shapes, the stateful-streaming sessionizer), 14 out,
#: each with a named partner.
#:
#: Round-10 second rotation (the session's four most machinery-
#: distinct new families in while newest — full rationale in
#: ROTATIONS.md): IN wordpiece_encode_corpus,
#: record_linkage_fellegi_sunter, pca_gram_projection,
#: logistic_gd_two_steps; OUT unigram_lm_tokenize,
#: decontamination_bloom, quality_classifier_trained,
#: conformal_price_calibration (each keeps a gated machinery
#: partner + oracle_check + pytest).
#:
#: Round-10 third rotation (two strict-containment swaps): IN
#: mink_prob_contamination — CONTAINS the full KN model build and
#: per-bigram scoring join (kneser_ney_row_scores) plus the rank/
#: top-k tail, so OUT kneser_ney_perplexity (keeps its bench row,
#: oracle_check row, and the lm.py pytest).  IN rrf_hybrid_search —
#: runs the BM25 postings/df/avgdl scoring top-50 INSIDE the plan
#: beside two other ranking systems, so OUT rag_rerank_bm25 (its
#: pool-bounded dense rerank stays gated via rag_semantic_search +
#: retrieval_ndcg_eval; keeps oracle_check + the rank pytest).
#:
#: Round-11 rotation candidates (round-10 families still never
#: gated, all sweep-green with dedicated pytests):
#:   seasonal_residual_anomalies (deseasonalized control chart),
#:   adamic_adar_linkpred (inverse-log common-neighbor scores),
#:   expected_calibration_error (reliability diagram + ECE),
#:   tokenizer_bakeoff (BPE/unigram/WordPiece side-by-side),
#:   late_interaction_maxsim (ColBERT MaxSim — the retrieval class
#:     between BM25 and the bi-encoder),
#:   sorted_neighborhood_pairs (rank-window blocking — the third
#:     candidate-generation class),
#:   jaro_winkler_titles (milli-exact JW comparator over SN
#:     candidates),
#:   dp_noise_calibration (geometric-mechanism release audit).
GATE_PRIORITY: tuple[str, ...] = (
    # LLM family: dedup / ingest
    "split_leakage_audit",
    "dedup_prefix_jaccard",
    "boilerplate_segment_removal",
    "cross_source_neardup_matrix",
    "dedup_spans_incremental",
    "ingest_timetravel_cases",
    # LLM family: similarity search / clustering / graph / sketches
    "dbscan_ivf_clusters",
    "dbscan_ivf_edge_recall",
    "kcenter_coreset_selection",
    "retrieval_ndcg_eval",
    "ann_ivf_binary_stored",
    "fts_conjunctive_search",
    "hits_trade_authorities",
    "triangle_count_copurchase",
    "hll_incremental_store",
    # statistics family (operators/ranks + driver_queries_stats)
    "mannwhitney_urgent_price",
    "kruskal_wallis_segments",
    "zipf_slope_fit",
    "heaps_law_fit",
    "curation_pipeline_v6",
    "pca_gram_projection",
    "ewma_gap_decay_wallet",
    "clustering_nmi_purity",
    # LLM family: text analysis + RAG + curation + multimodal
    "ngram_novelty_curve",
    "textstats_repetition",
    "ivm_tlog_cdc_refresh",
    "logistic_gd_two_steps",
    "mink_prob_contamination",
    "bpe_encode_corpus",
    "wordpiece_encode_corpus",
    "rag_semantic_search",
    "rrf_hybrid_search",
    "timetravel_pruned_scan",
    "record_linkage_fellegi_sunter",
    "url_canonical_dedup",
    "multimodal_bytes_simhash",
    # TPC-H plan-shape proofs (decorrelation / outer-join
    # distribution / OR-factoring — round-9 verdict ask #3)
    "volume_shipping_nations",
    "customer_order_distribution",
    "small_quantity_avg_subquery",
    "ored_predicates_revenue",
    # events-table / streaming family
    "streaming_stateful_sessionize",
    "streaming_interval_join",
    "scd2_event_type_history",
    # flagship + reference-parity core (highest §2 coverage per slot)
    "list_topk_by_date",
    "quality_sanity_report",
    "curation_pipeline_v5",
    "parties_grammar",
    "surrogate_dim_ids",
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
        driver_queries_eval,
        driver_queries_ml,
        driver_queries_ml2,
        driver_queries_mining,
        driver_queries_multimodal,
        driver_queries_pretrain,
        driver_queries_profiling,
        driver_queries_scale,
        driver_queries_similarity,
        driver_queries_stats,
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
