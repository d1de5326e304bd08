"""Fixed-size overlapping text chunker (reference rag.py:44-69 parity).

Reference semantics (re-derived from the loop, verified by goldens):
stride = size - overlap; chunk offsets are 0, stride, 2*stride, ...;
the chunk whose window reaches end-of-text is the LAST one (the loop
breaks when ``end == n``), so the raw chunk count is
``1 + max(0, ceil((len - size) / stride))``.  Each chunk is
``text[offset : offset+size]`` stripped; empty-after-strip chunks are
skipped; chunk ids are sequential AFTER skipping; empty/None text
yields no chunks (the RAG backfill adds a sentinel (0, "") row for
cases with no chunks — that lives in plans/rag.py, not here).

Pure DataFrame ops: posexplode(sequence) + substring + trim + filter +
row_number re-id.  At 100 TB this is a narrow map-side transform —
no shuffle except the (windowless) re-id, which is per-document and
therefore implemented with a window partitioned by the document key
(no global ordering, scales linearly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

CHUNK_SIZE = 1200
CHUNK_OVERLAP = 200
SNIPPET_CHARS = 280


def chunk_text(
    df: DataFrame,
    text_col: str = "text",
    key_cols: tuple[str, ...] = ("doc_id",),
    size: int = CHUNK_SIZE,
    overlap: int = CHUNK_OVERLAP,
    chunk_out: str = "chunk_text",
    id_out: str = "chunk_id",
) -> DataFrame:
    """One row per non-empty chunk, ids sequential per document."""
    size = max(1, size)
    overlap = max(0, min(overlap, size - 1))  # reference clamps, rag.py:54-55
    stride = size - overlap
    n_raw = (
        F.lit(1)
        + F.greatest(
            F.ceil((F.length(F.col(text_col)) - F.lit(size)) / F.lit(stride)),
            F.lit(0),
        )
    ).cast("int")
    exploded = (
        df.filter(F.col(text_col).isNotNull() & (F.length(text_col) > 0))
        .select(
            *key_cols,
            F.posexplode(F.sequence(F.lit(0), n_raw - 1)).alias("_pos", "_i"),
            F.col(text_col),
        )
        .withColumn(
            "_chunk",
            F.trim(F.expr(f"substring({text_col}, CAST(_i * {stride} + 1 AS INT), {size})")),
        )
        .filter(F.col("_chunk") != "")
    )
    w = Window.partitionBy(*key_cols).orderBy("_i")
    return (
        exploded.withColumn(id_out, F.row_number().over(w) - 1)
        .withColumnRenamed("_chunk", chunk_out)
        .drop("_pos", "_i", text_col)
    )


def snippet(col: str = "chunk_text", n: int = SNIPPET_CHARS) -> F.Column:
    """LEFT(chunk_text, 280) — reference rag.py:30,189."""
    return F.substring(F.col(col), 1, n)
