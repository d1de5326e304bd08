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
#: Round-11 rotation (verdict asks #1/#3/#4): 18 IN, 18 OUT, each
#: OUT keeping a named gated machinery partner — full rationale in
#: ROTATIONS.md.  IN: the never-gated GRAPH pack (bfs, personalized
#: pagerank, LPA + modularity communities, clustering coefficient,
#: degree assortativity, Adamic-Adar — operators/graph.py has been a
#: headline bench family since r7 with no external correctness row),
#: the STORAGE/TABLE-FORMAT pack (orc / compaction / z-order /
#: schema-evolution / tlog point lookup / exactly-once streaming
#: sink — what a 100 TB deployment leans on), and the
#: ATTRIBUTION/CAUSAL stats tail (Shapley + Markov-removal channel
#: attribution, isotonic calibration, stratified propensity,
#: difference-in-differences).
#:
#: Round-12 rotation candidates (new round-11 families, sweep-green
#: with dedicated pytests + bench rows): dsir_importance_resampling
#: (hashed-ngram importance weights, Xie et al. 2023),
#: sequence_packing_stats (NFD context-window packing),
#: rm3_prf_expansion (pseudo-relevance feedback), ktruss_copurchase
#: (edge-support peeling), tfidf_keyphrases, doremi_domain_weights
#: (excess-loss mixture reweighting); plus the never-gated
#: composite pipelines the r10 verdict named:
#: events_analytics_capstone, pretrain_prep_pipeline, corpus_datacard,
#: join_key_skew_profile.
GATE_PRIORITY: tuple[str, ...] = (
    # LLM family: dedup / ingest
    "split_leakage_audit",
    "dedup_prefix_jaccard",
    "boilerplate_segment_removal",
    "cross_source_neardup_matrix",
    "dedup_spans_incremental",
    "ingest_timetravel_cases",
    # LLM family: similarity search / clustering / sketches
    "dbscan_ivf_clusters",
    "kcenter_coreset_selection",
    "retrieval_ndcg_eval",
    "ann_ivf_binary_stored",
    "hll_incremental_store",
    # graph pack (round-11 verdict ask #1 — operators/graph.py)
    "bfs_copurchase_distances",
    "personalized_pagerank_trade",
    "lpa_copurchase_communities",
    "modularity_lpa_communities",
    "clustering_coefficient",
    "degree_assortativity_trade",
    "adamic_adar_linkpred",
    # storage / table-format pack (round-11 verdict ask #3 —
    # operators/tlog.py + operators/layout.py + sources/sinks.py)
    "orc_roundtrip_scan",
    "compaction_roundtrip_scan",
    "layout_zordered_scan",
    "schema_evolution_scan",
    "tlog_point_lookup",
    "streaming_tlog_sink",
    # attribution / causal stats tail (round-11 verdict ask #4)
    "shapley_channel_attribution",
    "markov_removal_attribution",
    "isotonic_calibration",
    "propensity_stratified_effect",
    "difference_in_differences",
    # statistics family (operators/ranks + driver_queries_stats)
    "kruskal_wallis_segments",
    "heaps_law_fit",
    "pca_gram_projection",
    "ewma_gap_decay_wallet",
    # LLM family: text analysis + RAG + curation + multimodal
    "textstats_repetition",
    "logistic_gd_two_steps",
    "mink_prob_contamination",
    "wordpiece_encode_corpus",
    "rag_semantic_search",
    "rrf_hybrid_search",
    "record_linkage_fellegi_sunter",
    "url_canonical_dedup",
    "multimodal_bytes_simhash",
    # events-table / streaming family
    "streaming_stateful_sessionize",
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
