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
#: Round-12 rotation (r11 verdict asks #1/#2/#3/#8): 20 IN, 20 OUT,
#: each OUT keeping a named gated machinery partner — full rationale
#: in ROTATIONS.md.  IN: the eight never-gated round-11 families
#: (DSIR importance resampling, NFD sequence packing, RM3
#: pseudo-relevance feedback, k-truss edge peeling, TF-IDF
#: keyphrases, DoReMi domain reweighting, golden-record election,
#: multi-source landmark BFS), the four composite pipelines
#: (events capstone, pretrain prep, corpus datacard, join-key skew
#: profile), and the IVM/store + FTS-variant + ANN-stored clusters
#: (incremental view refresh, tlog CDC, histogram/CMS stores, phrase
#: + Dirichlet-QL search, PQ + trained-IVF stored indexes).
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
    "hll_incremental_store",
    # round-11 families (r11 verdict asks #1/#8 — new machinery:
    # operators/dsir.py, operators/packing.py, operators/graph.py
    # k-truss + multi-source BFS, fts RM3, pretrain tfidf/doremi,
    # similarity golden-record)
    "dsir_importance_resampling",
    "sequence_packing_stats",
    "rm3_prf_expansion",
    "ktruss_copurchase",
    "tfidf_keyphrases",
    "doremi_domain_weights",
    "golden_record_election",
    "landmark_distances_copurchase",
    # composite end-to-end pipelines (r11 verdict ask #2 — the
    # integration-drift catchers)
    "events_analytics_capstone",
    "pretrain_prep_pipeline",
    "corpus_datacard",
    "join_key_skew_profile",
    # IVM / store + FTS-variant + ANN-stored clusters (r11 verdict
    # ask #3 — the incremental-maintenance and stored-index machinery
    # a deployment leans on between full recomputes)
    "ivm_join_view_refresh",
    "tlog_change_data_feed",
    "histogram_incremental_store",
    "cms_merge_estimate",
    "fts_phrase_search",
    "fts_dirichlet_ql_search",
    "ann_pq_stored",
    "ann_ivf_trained_topk",
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
        driver_queries_round12,
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
