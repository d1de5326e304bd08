"""Chunker goldens incl. FIXTURES.md §4 (offsets 0/1000/2000 for len 2500)."""

from __future__ import annotations

from legal_data_ingestion_rag_pipeline_spark.functions.chunking import chunk_text, snippet


def _ref_chunks(s: str, size: int = 1200, overlap: int = 200):
    """Independent reimplementation of the documented semantics, used as
    the test oracle (NOT copied from the reference; derived from the
    documented loop behavior)."""
    if not s:
        return []
    size = max(1, size)
    overlap = max(0, min(overlap, size - 1))
    out, i, cid = [], 0, 0
    while i < len(s):
        end = min(len(s), i + size)
        piece = s[i:end].strip()
        if piece:
            out.append((cid, piece))
            cid += 1
        if end == len(s):
            break
        i = end - overlap
    return out


def check(spark, text: str, size=1200, overlap=200):
    df = spark.createDataFrame([(1, text)], "doc_id int, text string")
    rows = (
        chunk_text(df, size=size, overlap=overlap)
        .orderBy("chunk_id")
        .select("chunk_id", "chunk_text")
        .collect()
    )
    assert [(r.chunk_id, r.chunk_text) for r in rows] == _ref_chunks(text, size, overlap)


def test_multi_chunk_2500(spark):
    check(spark, "a" * 999 + " " + "b" * 1500)


def test_exact_boundaries(spark):
    for n in (1, 1199, 1200, 1201, 2200, 2201, 2500):
        check(spark, "x" * n)


def test_empty_and_whitespace(spark):
    df = spark.createDataFrame([(1, ""), (2, None), (3, "   ")], "doc_id int, text string")
    assert chunk_text(df).count() == 0


def test_mid_chunk_strip_renumber(spark):
    # middle window is all spaces -> skipped, ids stay sequential
    text = "A" * 100 + " " * 130 + "B" * 100
    check(spark, text, size=100, overlap=0)


def test_snippet(spark):
    df = spark.createDataFrame([("q" * 500,)], "chunk_text string")
    [row] = df.select(snippet().alias("s")).collect()
    assert row.s == "q" * 280
