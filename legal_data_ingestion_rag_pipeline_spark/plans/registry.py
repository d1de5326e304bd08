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
#: gated machinery partner every OUT keeps) lives in ROTATIONS.md.
#:
#: Round-13 rotation (r12 verdict asks #1/#2/#7): 28 IN, 28 OUT,
#: each OUT keeping a named gated machinery partner — full rationale
#: in ROTATIONS.md.  IN: all 19 never-gated round-12 families
#: (KNN-Shapley x2, harmonic/betweenness/diameter graph pack, BM25F,
#: t-closeness, Neyman allocation, geometric medians + embedding
#: outliers, blocked Levenshtein, KMV theta/store, Misra-Gries,
#: UniMax, Gopher filter, provenance roots, IVF incremental add, RBO
#: eval), the never-gated privacy pack (k-anonymity, l-diversity,
#: DP noise calibration), the never-gated TPC-H tail (Q15/Q10/Q18/
#: Q4/Q6 shapes), and the streaming KMV sketch-maintenance row.
GATE_PRIORITY: tuple[str, ...] = (
    # LLM family: dedup / linkage / ingest / quality
    "dedup_prefix_jaccard",
    "url_canonical_dedup",
    "boilerplate_segment_removal",
    "levenshtein_blocked_pairs",
    "record_linkage_fellegi_sunter",
    "gopher_quality_filter",
    "ingest_timetravel_cases",
    # LLM family: ANN / embeddings / sketches
    "ann_ivf_incremental_add",
    "ann_rbo_eval",
    "embedding_outlier_scores",
    "geometric_median_labels",
    "kmv_theta_set_difference",
    "kmv_incremental_store",
    "misra_gries_heavy_hitters",
    # LLM family: valuation / mixture / pretrain
    "knn_shapley_values",
    "knn_shapley_pooled",
    "unimax_budget_allocation",
    "dsir_importance_resampling",
    "sequence_packing_stats",
    "wordpiece_encode_corpus",
    "mink_prob_contamination",
    # graph pack (multi_source_bfs riders + Brandes)
    "harmonic_centrality_copurchase",
    "betweenness_sampled_copurchase",
    "diameter_double_sweep",
    # FTS / RAG
    "bm25f_fielded_search",
    "rag_semantic_search",
    # privacy / profiling (r12 verdict ask #2)
    "t_closeness_audit",
    "k_anonymity_audit",
    "l_diversity_audit",
    "dp_noise_calibration",
    # statistics
    "neyman_allocation_sample",
    # TPC-H plan-shape tail (r12 verdict ask #2)
    "top_revenue_suppliers",
    "returned_items_report",
    "large_volume_customers",
    "order_priority_exists",
    "forecast_revenue_filter",
    # streaming (stateful + sketch maintenance, r12 verdict ask #7)
    "streaming_kmv_distinct",
    "streaming_stateful_sessionize",
    # composite pipelines / IVM
    "pipeline_provenance_roots",
    "events_analytics_capstone",
    "pretrain_prep_pipeline",
    "curation_pipeline_v5",
    "ivm_join_view_refresh",
    # multimodal
    "multimodal_bytes_simhash",
    # flagship + reference-parity core (highest §2 coverage per slot)
    "list_topk_by_date",
    "quality_sanity_report",
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
        driver_queries_round12,
        driver_queries_round13,
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
