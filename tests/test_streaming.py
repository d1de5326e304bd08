"""Streaming seam tests: foreachBatch ingest + windowed daily stats."""

from __future__ import annotations

import json

from legal_data_ingestion_rag_pipeline_spark.session import load_table
from legal_data_ingestion_rag_pipeline_spark.streaming.pipeline import (
    read_docket_stream,
    start_ingest_stream,
    windowed_daily_stats,
)

from fixtures import DOCKETS


def test_foreach_batch_ingest(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    (src / "batch1.jsonl").write_text(
        "\n".join(json.dumps(d) for d in DOCKETS)
    )
    stream = read_docket_stream(spark, str(src))
    state: dict = {}
    q = start_ingest_stream(spark, stream, state, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert state["counts"][0]["read"] == 10
    assert state["counts"][0]["failed"] == 6
    assert state["tables"]["cases"].count() == 3


def test_windowed_daily_stats(spark, tmp_path):
    # drive the same aggregation in batch mode over the driver events
    # table (the streaming form adds only the watermark/window wiring)
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    out = windowed_daily_stats(ev)
    rows = out.collect()
    assert len(rows) > 0
    assert {c for c in out.columns} == {"day_start", "event_type", "n_events", "total_value"}


def test_multimodal_features(spark):
    from legal_data_ingestion_rag_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
        sample_frames,
    )

    rows = [
        (1, "image", b"\x00\x01\x02\x03" * 10, ("image/png", 4, 4, None)),
        (2, "audio", b"\xff" * 100, ("audio/wav", None, None, 2500)),
        (3, "video", None, ("video/mp4", 640, 480, 3500)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = extract_features(media, dim=8).collect()
    by_id = {f.media_id: f for f in feats}
    assert by_id[1].n_bytes == 40
    assert len(by_id[1].features) == 8
    assert abs(sum(x * x for x in by_id[1].features) - 1.0) < 1e-9
    assert by_id[3].n_bytes == 0 and by_id[3].features == [0.0] * 8
    frames = sample_frames(media, every_ms=1000).collect()
    assert [(f.media_id, f.frame_ts_ms) for f in frames] == [
        (3, 0), (3, 1000), (3, 2000), (3, 3000),
    ]
