"""Distributed graph primitives for dedup clustering.

Connected components via min-label propagation — the map-reduce CC
used to turn near-duplicate PAIRS (MinHash-LSH / SimHash / Jaccard
candidates) into keep/drop CLUSTERS keyed by the minimum member id.

Scale notes (100 TB):
- Each round is one edge-join + min-aggregate: two hash shuffles on
  vertex ids (uniform keys, no skew beyond the graph's own degree
  distribution, which the upstream pair generators already cap).
- Rounds needed = graph diameter. Dedup graphs are near-cliques
  (diameter 2-3), but a fixed round count is a silent-wrongness
  hazard on adversarial chains — so each round localCheckpoints the
  label frontier (breaking the O(rounds) lineage that would otherwise
  recompute every prior join on each action) and the loop EXITS ONLY
  on a measured fixpoint: count(label changes) == 0. ``max_rounds``
  is a safety valve that raises rather than returning a partially
  propagated labeling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


class ConvergenceError(RuntimeError):
    """Label propagation hit max_rounds before reaching a fixpoint."""


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 25,
) -> DataFrame:
    """(vertex, label) with label = min vertex id in the component.

    ``edges`` is treated as undirected; isolated vertices (absent from
    ``edges``) are absent from the result — callers union them back if
    singleton clusters matter.

    Semantics anchor: the reference keeps ONE row per duplicate group
    during ingest (reference ingest.py ON CONFLICT keep-first); this
    generalizes that to transitive near-dup groups, same min-id
    representative rule.
    """
    nbr = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .unionByName(
            edges.select(F.col(dst).alias("src"), F.col(src).alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        nbr.select(F.col("src").alias("vertex"))
        .distinct()
        .withColumn("label", F.col("vertex"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_rounds):
        nbr_min = (
            nbr.join(labels.select(F.col("vertex").alias("dst"), "label"), "dst")
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr_min, labels.vertex == nbr_min.src, "left")
            .select(
                "vertex",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
                (F.col("nbr_label") < F.col("label")).alias("_changed"),
            )
            .localCheckpoint(eager=True)  # one materialization serves both
        )
        changed = new_labels.filter(F.col("_changed")).limit(1).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            return labels
    raise ConvergenceError(
        f"connected_components: no fixpoint after {max_rounds} rounds "
        "(graph diameter exceeds the safety valve; raise max_rounds)"
    )


def cluster_summary(labels: DataFrame) -> DataFrame:
    """Per-cluster (cluster_id, n_members, min_doc, max_doc) rollup."""
    return (
        labels.groupBy("label")
        .agg(
            F.count("*").alias("n_members"),
            F.min("vertex").alias("min_doc"),
            F.max("vertex").alias("max_doc"),
        )
        .select(F.col("label").alias("cluster_id"), "n_members", "min_doc", "max_doc")
    )
