"""Multimodal (image/audio/video) column handling for training-data
pipelines.

Media travel as opaque `binary` columns with typed metadata structs;
decode/feature steps are Arrow-batched `mapInPandas` operators so the
Spark-side plumbing (schemas, batch iteration, partitioning) is real
and tested even though the actual codecs are STUBBED in this image
(no PIL/cv2/torchaudio here): `decode_fn=None` uses a deterministic
fake that derives "features" from the byte content, and a real decoder
drops in without touching the plumbing.
"""

from __future__ import annotations

import math
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), True),  # image | audio | video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("features", T.ArrayType(T.DoubleType()), True),
    ]
)


def _fake_decode(content: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for decode + feature extraction: bucketed
    byte histogram, unit-normalized. Replace with a real decoder
    (PIL/torchaudio) — signature bytes -> list[float] is the only
    contract. math.sqrt (IEEE correctly-rounded, unlike pow(x, 0.5))
    keeps the values bit-identical to a SQL oracle's sqrt()."""
    if not content:
        return [0.0] * dim
    import numpy as np

    x = np.frombuffer(content, dtype=np.uint8)
    # vectorized histogram; .tolist() yields exact Python ints, so the
    # norm/ratio float math below is bit-identical to the per-byte loop
    counts = np.bincount(x % dim, minlength=dim).tolist()
    norm = math.sqrt(sum(c * c for c in counts)) or 1.0
    return [c / norm for c in counts]


def synthetic_media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic MEDIA_SCHEMA fixture from the driver `documents`
    table (the testdata ships no binary column): text bytes stand in
    for media payloads, kind cycles image/audio/video by id, and
    duration_ms derives from n_chars. Lets the multimodal operators be
    oracle-checked end-to-end; a real pipeline replaces this with a
    binary-file / blob-store reader.
    """
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            (F.col("n_chars") * 20).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def extract_features(
    media: DataFrame,
    dim: int = 16,
    decode_fn: Callable[[bytes, int], list[float]] | None = None,
    batch_size_hint: int = 256,
) -> DataFrame:
    """Decode media and emit fixed-width feature vectors via
    mapInPandas (Arrow batches; executor-side decode, never driver).

    At 100 TB: partition by size so one task holds ~a few hundred MB of
    payload; decode is CPU-bound and embarrassingly parallel, so the
    operator scales with cores. Feature rows are small — write them
    separately from the payload so downstream ANN/dedup never rescans
    bytes.
    """
    fn = decode_fn or _fake_decode

    def _batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [
                        len(c) if c is not None else 0 for c in pdf["content"]
                    ],
                    "features": [
                        fn(bytes(c) if c is not None else b"", dim)
                        for c in pdf["content"]
                    ],
                }
            )
            yield out

    return media.mapInPandas(_batches, FEATURE_SCHEMA)


def resize_media(
    media: DataFrame,
    width: int = 64,
    height: int = 64,
    resize_fn: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Resize plumbing: binary in -> binary out with updated meta, via
    Arrow-batched mapInPandas. The real resizer (PIL/cv2) drops into
    `resize_fn` (bytes, w, h) -> bytes; the default is a clearly-fake
    deterministic stand-in (truncate/cycle the payload to w*h bytes)
    that keeps schemas, batching, and meta rewriting real and testable
    in this codec-free image.
    """

    def _fake_resize(content: bytes, w: int, h: int) -> bytes:
        if not content:
            return b"\x00" * (w * h)
        reps = (w * h + len(content) - 1) // len(content)
        return (content * reps)[: w * h]

    fn = resize_fn or _fake_resize

    def _batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            out = pdf.copy()
            out["content"] = [
                fn(bytes(c) if c is not None else b"", width, height)
                for c in pdf["content"]
            ]
            out["meta"] = [
                {
                    "mime": (m or {}).get("mime"),
                    "width": width,
                    "height": height,
                    "duration_ms": (m or {}).get("duration_ms"),
                }
                for m in pdf["meta"]
            ]
            yield out

    return media.mapInPandas(_batches, MEDIA_SCHEMA)


def sample_frames(
    media: DataFrame,
    every_ms: int = 1000,
) -> DataFrame:
    """Frame-sampling plumbing for video: one output row per sampled
    timestamp, driven by meta.duration_ms (decode itself stubbed —
    content is passed through for a real frame extractor).

    Pure-Spark explode of the timestamp grid; the per-frame decode
    would be a mapInPandas like extract_features.
    """
    grid = F.sequence(
        F.lit(0),
        F.greatest(F.coalesce(F.col("meta.duration_ms"), F.lit(0)) - 1, F.lit(0)),
        F.lit(every_ms),
    )
    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", F.explode(grid).alias("frame_ts_ms"))
    )


def audio_windows(
    media: DataFrame,
    window_ms: int = 1000,
    hop_ms: int = 500,
) -> DataFrame:
    """Overlapping-window segmentation for audio: one row per
    (window_ms)-long window at hop_ms stride, with the REAL byte
    slice of the payload for that window (proportional byte-range
    mapping — the PCM-exact cut is what a torchaudio decode_fn would
    refine; the Spark-side plumbing here is the deliverable).

    Pure exploded expressions + Column.substr on the binary column —
    map-side only, no shuffle, no UDF; the window grid mirrors
    sample_frames and the slice arithmetic is exact integer division
    (oracle-checkable).
    """
    dur = F.coalesce(F.col("meta.duration_ms"), F.lit(0))
    starts = F.sequence(
        F.lit(0), F.greatest(dur - window_ms, F.lit(0)), F.lit(hop_ms)
    )
    total = F.octet_length("content")
    a = (
        media.filter((F.col("kind") == "audio") & (dur > 0))
        .select(
            "media_id",
            "content",
            dur.alias("dur"),
            total.alias("total_bytes"),
            F.posexplode(starts).alias("window_idx", "start_ms"),
        )
        .withColumn("end_ms", F.least(F.col("start_ms") + window_ms, F.col("dur")))
    )
    start_byte = F.expr("(total_bytes * start_ms) DIV dur")
    end_byte = F.expr("(total_bytes * end_ms) DIV dur")
    return (
        a.withColumn("start_byte", start_byte)
        .withColumn("n_bytes", end_byte - start_byte)
        .withColumn(
            "window_content",
            F.col("content").substr(
                (F.col("start_byte") + 1).cast("int"), F.col("n_bytes").cast("int")
            ),
        )
        .select(
            "media_id",
            "window_idx",
            "start_ms",
            "end_ms",
            "start_byte",
            "n_bytes",
            "window_content",
        )
    )


def bytes_simhash(
    media: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    n: int = 4,
    bits: int = 30,
) -> DataFrame:
    """Content-level SimHash over raw BYTES: rolling n-byte-gram
    hashes (the byte twin of portable.poly_hash — fold (acc*31 +
    byte) % P from 7, so on ASCII payloads the fingerprint equals the
    char-gram SQL formulation the oracle mirrors) voted into a
    ``bits``-bit SimHash exactly like dedup.simhash_docs.

    This is the dedup family extended to the multimodal column: the
    near-dup signal for binary payloads where no tokenizer exists
    (the perceptual-hash slot — a real pipeline swaps the byte grams
    for decoded perceptual features, same signature, same
    downstream banding).  Arrow mapInPandas, map-side only; returns
    (id, n_bytes, simhash).  Empty/short payloads (< n bytes) emit
    simhash 0 — deterministic, documented, matched by the oracle.
    """
    import pandas as pd
    import pyspark.sql.types as T

    from ..functions import portable as PT

    P = PT.P
    out_schema = T.StructType(
        [
            T.StructField(id_col, media.schema[id_col].dataType, True),
            T.StructField("n_bytes", T.LongType(), True),
            T.StructField("simhash", T.LongType(), True),
        ]
    )

    def _batches(it):
        import numpy as np

        for pdf in it:
            ids, lens, sims = [], [], []
            for mid, payload in zip(pdf[id_col], pdf[content_col]):
                b = bytes(payload) if payload is not None else b""
                ids.append(mid)
                lens.append(len(b))
                sim = 0
                if len(b) >= n:
                    # vectorized rolling poly-hash: fold the n byte
                    # lanes across all grams at once, mod P each step
                    # (intermediates < P*31 + 255 — exact int64, the
                    # same residues as the per-byte loop)
                    x = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
                    g_cnt = len(b) - n + 1
                    acc = np.full(g_cnt, PT.POLY_INIT, dtype=np.int64)
                    for i in range(n):
                        acc = (acc * PT.POLY_MULT + x[i : i + g_cnt]) % P
                    # bit votes: ones-count per bit vs gram count
                    for j in range(bits):
                        ones = int(((acc >> j) & 1).sum())
                        if 2 * ones - g_cnt > 0:
                            sim |= 1 << j
                sims.append(sim)
            yield pd.DataFrame(
                {id_col: ids, "n_bytes": lens, "simhash": sims}
            )

    # spread the (often single-file) input across cores before the
    # CPU-bound Arrow stage (the minhash_signatures convention); the
    # payload shuffles ONCE here — at 100 TB a well-laid-out media
    # store already scans many-way and the repartition collapses to
    # the scan parallelism
    from ..session import barrier

    return barrier(media.select(id_col, content_col)).mapInPandas(
        _batches, out_schema
    )
