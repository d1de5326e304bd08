"""Driver queries: multimodal-column operators (SURVEY north-star
extension). Media travel as opaque binary columns + typed metadata;
decode/feature extraction runs executor-side through Arrow-batched
mapInPandas. The decode step itself is a deterministic byte-histogram
stub (no codec libs in this image — see operators/multimodal.py), so
the full pipeline, including the Python batch path, is DuckDB
oracle-checkable byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions import portable as PT
from ..operators.multimodal import (
    extract_features,
    sample_frames,
    synthetic_media_from_documents,
)
from ..session import load_table
from .registry import register


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return synthetic_media_from_documents(load_table(spark, sf_dir, "documents"))


# documents.text is ASCII in the driver testdata, so DuckDB's per-char
# codepoints equal the UTF-8 bytes the Spark side histograms.
_FEATURES_ORACLE = f"""
    WITH m AS (
      SELECT doc_id AS media_id,
             CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                  ELSE 'video' END AS kind,
             text
      FROM documents
    ),
    b AS (
      SELECT media_id, kind, CAST(length(text) AS BIGINT) AS n_bytes,
             list_transform(range(0, 16), j ->
               len(list_filter(
                     list_transform(range(1, length(text) + 1),
                                    i -> ascii(text[i:i]) % 16),
                     v -> v = j))) AS counts
      FROM m
    ),
    n AS (SELECT *, sqrt(list_sum(list_transform(counts, x -> x * x))) AS nrm
          FROM b)
    SELECT media_id, kind, n_bytes,
           {PT.vec_csv6('list_transform(counts, c -> CAST(c AS DOUBLE) / nrm)', PT.DUCKDB)}
             AS features_csv
    FROM n ORDER BY media_id
"""


@register(
    "multimodal_features",
    oracle=_FEATURES_ORACLE,
    doc="binary-column decode + feature extraction via Arrow-batched "
    "mapInPandas (stubbed decoder = unit-normalized byte histogram). "
    "At scale: payload partitions sized by bytes, CPU-bound decode "
    "parallel per core, small feature rows written separately so "
    "downstream ANN/dedup never rescans payloads.",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = extract_features(_media(spark, sf_dir), dim=16)
    # gate-facing select: the operator keeps the array column; the
    # driver's canonicalizer cannot hash lists, so serialize here.
    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        F.expr(PT.vec_csv6("features", PT.SPARK)).alias("features_csv"),
    ).orderBy("media_id")


_FRAMES_ORACLE = """
    WITH v AS (
      SELECT doc_id AS media_id, n_chars * 20 AS duration_ms
      FROM documents WHERE doc_id % 3 = 2
    )
    SELECT media_id,
           CAST(unnest(range(0, greatest(duration_ms, 1), 1000)) AS BIGINT)
             AS frame_ts_ms
    FROM v ORDER BY media_id, frame_ts_ms
"""


@register(
    "multimodal_frame_sample",
    oracle=_FRAMES_ORACLE,
    doc="video frame-sampling grid: pure-Spark explode of a "
    "sequence() over meta.duration_ms — one row per sampled timestamp "
    "feeding a per-frame decode (mapInPandas like extract_features). "
    "No shuffle: filter + generate, fully pipelined with the scan.",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    frames = sample_frames(_media(spark, sf_dir), every_ms=1000)
    return frames.select(
        "media_id", F.col("frame_ts_ms").cast("bigint").alias("frame_ts_ms")
    ).orderBy("media_id", "frame_ts_ms")


_AUDIO_ORACLE = """
    WITH a AS (
      SELECT doc_id AS media_id,
             CAST(n_chars * 20 AS BIGINT) AS dur,
             CAST(length(text) AS BIGINT) AS total_bytes
      FROM documents WHERE doc_id % 3 = 1 AND n_chars > 0
    ),
    w AS (
      SELECT media_id, dur, total_bytes,
             CAST(g.idx AS INT) AS window_idx,
             CAST(g.s AS BIGINT) AS start_ms
      FROM a,
      LATERAL (
        SELECT unnest(range(0, greatest(dur - 1000, 0) + 1, 500)) AS s,
               generate_subscripts(range(0, greatest(dur - 1000, 0) + 1, 500), 1) - 1 AS idx
      ) g
    )
    SELECT media_id, window_idx, start_ms,
           least(start_ms + 1000, dur) AS end_ms,
           (total_bytes * start_ms) // dur AS start_byte,
           (total_bytes * least(start_ms + 1000, dur)) // dur
             - (total_bytes * start_ms) // dur AS n_bytes
    FROM w ORDER BY media_id, window_idx LIMIT 2000
    """


@register(
    "multimodal_audio_windows",
    oracle=_AUDIO_ORACLE,
    doc="audio window segmentation (operators/multimodal.audio_windows): "
    "1 s windows at 500 ms hop, each with its REAL payload byte slice "
    "(Column.substr on the binary column; exact integer byte-range "
    "arithmetic). Map-side explode, no shuffle, no UDF — the decode "
    "refinement hook is a mapInPandas like extract_features. The gate "
    "emits the offsets (binary itself isn't canonicalizer-hashable); "
    "the slice length is asserted equal to the arithmetic in pytest.",
)
def multimodal_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import audio_windows

    w = audio_windows(_media(spark, sf_dir), window_ms=1000, hop_ms=500)
    return (
        w.select(
            "media_id",
            F.col("window_idx").cast("int").alias("window_idx"),
            F.col("start_ms").cast("bigint").alias("start_ms"),
            F.col("end_ms").cast("bigint").alias("end_ms"),
            "start_byte",
            "n_bytes",
        )
        .orderBy("media_id", "window_idx")
        .limit(2000)
    )


@register(
    "multimodal_bytes_simhash",
    bench=True,
    oracle=f"""
    SELECT doc_id AS media_id,
           CAST(length(text) AS BIGINT) AS n_bytes,
           CASE WHEN length(text) >= 4 THEN
             {PT.simhash_from_hashes(PT.hash_array(PT.char_ngrams('text', 4, PT.DUCKDB), PT.DUCKDB), 30, PT.DUCKDB)}
           ELSE 0 END AS simhash
    FROM documents ORDER BY media_id
    """,
    doc="near-dup fingerprinting for BINARY payloads "
    "(multimodal.bytes_simhash): rolling 4-byte-gram hashes voted "
    "into a 30-bit SimHash inside an Arrow mapInPandas batch -- the "
    "dedup family extended to the multimodal column, where no "
    "tokenizer exists (the perceptual-hash slot; a real pipeline "
    "swaps byte grams for decoded features, same signature, same "
    "downstream banding/pairing). The synthetic media payloads are "
    "the documents' ASCII bytes, so the oracle computes the "
    "IDENTICAL fingerprint from char 4-grams with the portable SQL "
    "simhash -- every bit of every fingerprint is hash-gated. "
    "The payload round-robins ONCE into the CPU-bound Arrow stage "
    "(the minhash convention; a well-laid-out store already scans "
    "many-way), and 8 bytes of fingerprint per asset leave it.",
)
def multimodal_bytes_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import bytes_simhash

    m = _media(spark, sf_dir)
    return bytes_simhash(m).orderBy("media_id")


# the entropy piece, shared by both dialects as the same literal
# arithmetic: per non-zero bucket, -(c/n)*ln(c/n) micro-snapped
# BEFORE summation (the NMI convention).
_ENTROPY_ORACLE = f"""
    WITH m AS (
      SELECT doc_id AS media_id,
             CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                  ELSE 'video' END AS kind,
             text
      FROM documents WHERE length(text) > 0
    ),
    b AS (
      SELECT media_id, kind, CAST(length(text) AS BIGINT) AS n_bytes,
             j AS bucket,
             CAST(len(list_filter(
                    list_transform(range(1, length(text) + 1),
                                   i -> ascii(text[i:i]) % 16),
                    v -> v = j)) AS BIGINT) AS c
      FROM m, unnest(range(0, 16)) AS tt(j)
    ),
    cells AS (
      SELECT media_id, kind, n_bytes,
             CASE WHEN c > 0 THEN CAST(floor(
               (CAST(c AS DOUBLE) / n_bytes)
               * (-ln(CAST(c AS DOUBLE) / n_bytes)) * 1000000.0 + 0.5)
               AS BIGINT) ELSE 0 END AS ent_micro,
             CASE WHEN c > 0 THEN 1 ELSE 0 END AS nz
      FROM b
    )
    SELECT media_id, kind, n_bytes,
           CAST(sum(nz) AS BIGINT) AS n_buckets_used,
           CAST(sum(ent_micro) AS BIGINT) AS entropy_micro,
           CAST(CASE WHEN sum(ent_micro) < 1500000 THEN 1 ELSE 0 END
                AS BIGINT) AS low_entropy_flag
    FROM cells GROUP BY media_id, kind, n_bytes
    ORDER BY entropy_micro DESC, media_id LIMIT 100
"""


def _raw_histogram(content: bytes, dim: int) -> list[float]:
    """decode_fn returning RAW bucket counts (exact small ints in
    double) instead of the unit-normalized default — entropy needs
    the integer cells."""
    if not content:
        return [0.0] * dim
    import numpy as np

    x = np.frombuffer(content, dtype=np.uint8)
    return [float(c) for c in np.bincount(x % dim, minlength=dim).tolist()]


@register(
    "multimodal_byte_entropy",
    oracle=_ENTROPY_ORACLE,
    doc="payload byte-entropy audit: Shannon entropy of each media "
    "blob's 16-bucket byte histogram (the extract_features "
    "machinery), each -(c/n)ln(c/n) cell micro-snapped from exact "
    "BIGINT counts before summation (the NMI convention), with a "
    "low-entropy flag (< 1.5 nats) — the ingestion signal that "
    "catches padded/constant/corrupt blobs, while ~ln(16)-entropy "
    "payloads are well-mixed (compressed/encrypted) media.  Top-100 "
    "by entropy with total-order tie-break.  Map-side per-payload "
    "arithmetic; bytes never shuffle — only the per-blob stat rows "
    "enter the top-k.",
)
def multimodal_byte_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = extract_features(
        _media(spark, sf_dir), dim=16, decode_fn=_raw_histogram
    )
    cells = feats.filter(F.col("n_bytes") > 0).select(
        "media_id",
        "kind",
        "n_bytes",
        F.posexplode("features").alias("bucket", "cf"),
    ).select(
        "media_id",
        "kind",
        "n_bytes",
        F.col("cf").cast("bigint").alias("c"),
    )
    scored = cells.select(
        "media_id",
        "kind",
        "n_bytes",
        F.expr(
            "CASE WHEN c > 0 THEN CAST(floor("
            "(CAST(c AS DOUBLE) / n_bytes)"
            " * (-ln(CAST(c AS DOUBLE) / n_bytes)) * 1000000.0 + 0.5)"
            " AS BIGINT) ELSE 0 END"
        ).alias("ent_micro"),
        F.when(F.col("c") > 0, 1).otherwise(0).alias("nz"),
    )
    return (
        scored.groupBy("media_id", "kind", "n_bytes")
        .agg(
            F.sum("nz").cast("bigint").alias("n_buckets_used"),
            F.sum("ent_micro").cast("bigint").alias("entropy_micro"),
        )
        .select(
            "media_id",
            "kind",
            "n_bytes",
            "n_buckets_used",
            "entropy_micro",
            F.when(F.col("entropy_micro") < 1_500_000, 1)
            .otherwise(0)
            .cast("bigint")
            .alias("low_entropy_flag"),
        )
        .orderBy(F.desc("entropy_micro"), "media_id")
        .limit(100)
    )
