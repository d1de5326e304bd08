"""Cross-document segment deduplication (boilerplate removal).

The CCNet / RefinedWeb pretraining-data recipe: a LINE that appears
verbatim in many distinct documents is boilerplate (nav bars, cookie
banners, license headers) and is stripped from every document while
the rest of each document survives in order.  This is the line-level
complement to the document-level dedup family (operators/dedup.py).

Spark-first shape, 100 TB-safe:

- segmentation is a map-side explode (no shuffle);
- document frequency is ONE shuffle on the segment key — verbatim
  segments hash uniformly, and the two-phase distinct-count keeps the
  map-side partials small;
- the boilerplate set (df >= min_docs) is tiny relative to the corpus
  by construction, so the removal join is keyed on the same uniform
  segment hash and AQE will usually broadcast it;
- reassembly is one shuffle on doc_id with an order-restoring
  array_sort — never a global window.

Nothing here is a Python UDF; every step is built-in expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def segment_lines(
    docs: DataFrame, text_col: str = "text", doc_id: str = "doc_id"
) -> DataFrame:
    """Natural-line segmentation: one row per (doc, line), positions
    preserved.  The production path for crawled text.  NULL text is
    treated as '' — explode of a NULL array would silently DROP the
    document, and removal must never delete documents."""
    return docs.select(
        doc_id,
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
        ).alias("seg_pos", "seg"),
    )


def segment_token_windows(
    docs: DataFrame, w: int, text_col: str = "text", doc_id: str = "doc_id"
) -> DataFrame:
    """Fixed ``w``-token window segmentation: the deterministic
    re-lining used when a corpus has no newline structure (the driver's
    synthetic documents are single-line).  Same output contract as
    segment_lines, including NULL text -> '' survival."""
    toks = F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
    n_segs = F.ceil(F.size(toks) / F.lit(float(w))).cast("int")
    return (
        docs.select(
            doc_id,
            toks.alias("_toks"),
            F.explode(F.sequence(F.lit(0), n_segs - F.lit(1))).alias("seg_pos"),
        )
        .select(
            doc_id,
            "seg_pos",
            F.array_join(
                F.slice(F.col("_toks"), F.col("seg_pos") * w + 1, w), " "
            ).alias("seg"),
        )
    )


def common_segments(
    segments: DataFrame, min_docs: int, doc_id: str = "doc_id"
) -> DataFrame:
    """Segments whose cross-document frequency reaches ``min_docs``.
    One shuffle on the segment key; empty segments never count."""
    return (
        segments.filter(F.col("seg") != "")
        .groupBy("seg")
        .agg(F.countDistinct(doc_id).alias("seg_df"))
        .filter(F.col("seg_df") >= min_docs)
    )


def remove_common_segments(
    segments: DataFrame,
    boilerplate: DataFrame,
    doc_id: str = "doc_id",
    sep: str = " ",
) -> DataFrame:
    """Strip boilerplate segments from every document, preserving
    segment order, and account for what was removed.

    Returns (doc_id, clean_text, n_segments, n_removed).  A document
    whose every segment was boilerplate survives with clean_text = ''
    (it is the caller's policy whether to drop it) — removal must
    never silently delete documents.
    """
    bp = boilerplate.select(F.col("seg").alias("_bp_seg"), F.lit(True).alias("_is_bp"))
    flagged = segments.join(
        bp, segments.seg == F.col("_bp_seg"), "left"
    ).select(
        doc_id,
        "seg_pos",
        "seg",
        F.coalesce(F.col("_is_bp"), F.lit(False)).alias("_is_bp"),
    )
    kept_sorted: Column = F.filter(
        F.array_sort(F.collect_list(F.struct("seg_pos", "seg", "_is_bp"))),
        lambda s: ~s["_is_bp"],
    )
    return (
        flagged.groupBy(doc_id)
        .agg(
            F.count("*").alias("n_segments"),
            F.sum(F.when(F.col("_is_bp"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_removed"),
            F.array_join(
                F.transform(kept_sorted, lambda s: s["seg"]), sep
            ).alias("clean_text"),
        )
        .select(doc_id, "clean_text", "n_segments", "n_removed")
    )


def dedup_segments_within_doc(
    segments: DataFrame, doc_id: str = "doc_id", sep: str = " "
) -> DataFrame:
    """INTRA-document segment dedup — the complement of the cross-doc
    boilerplate pass: a segment repeated inside one document keeps its
    FIRST occurrence, later copies are stripped (the Gopher repetition
    rules as removal rather than scoring).  Empty segments are never
    treated as repeats (blank lines survive).

    One groupBy on (doc, segment) to find each segment's first
    position, then the same order-restoring array_sort reassembly as
    remove_common_segments — no window wider than a document, no UDFs.
    Returns (doc_id, clean_text, n_segments, n_removed).
    """
    firsts = (
        segments.groupBy(doc_id, "seg")
        .agg(F.min("seg_pos").alias("_first_pos"))
    )
    flagged = segments.join(firsts, [doc_id, "seg"]).select(
        doc_id,
        "seg_pos",
        "seg",
        (
            (F.col("seg_pos") != F.col("_first_pos")) & (F.col("seg") != "")
        ).alias("_is_bp"),
    )
    kept_sorted: Column = F.filter(
        F.array_sort(F.collect_list(F.struct("seg_pos", "seg", "_is_bp"))),
        lambda s: ~s["_is_bp"],
    )
    return (
        flagged.groupBy(doc_id)
        .agg(
            F.count("*").alias("n_segments"),
            F.sum(F.when(F.col("_is_bp"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_removed"),
            F.array_join(
                F.transform(kept_sorted, lambda s: s["seg"]), sep
            ).alias("clean_text"),
        )
        .select(doc_id, "clean_text", "n_segments", "n_removed")
    )


def boilerplate_strip(
    docs: DataFrame,
    min_docs: int,
    w: int | None = None,
    text_col: str = "text",
    doc_id: str = "doc_id",
) -> DataFrame:
    """End-to-end: segment (natural lines, or ``w``-token windows when
    given), find segments shared by >= min_docs documents, strip them."""
    if w is None:
        segs = segment_lines(docs, text_col, doc_id)
        sep = "\n"
    else:
        segs = segment_token_windows(docs, w, text_col, doc_id)
        sep = " "
    bp = common_segments(segs, min_docs, doc_id)
    return remove_common_segments(segs, bp, doc_id, sep)
