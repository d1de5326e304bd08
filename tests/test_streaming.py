"""Streaming seam tests: foreachBatch ingest + windowed daily stats."""

from __future__ import annotations

import json

from legal_data_ingestion_rag_pipeline_spark.session import load_table
from legal_data_ingestion_rag_pipeline_spark.streaming.pipeline import (
    read_docket_stream,
    start_ingest_stream,
    stateful_sessionize,
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


def test_stateful_sessionize_matches_batch(spark, tmp_path):
    """Two time-ordered micro-batches through applyInPandasWithState;
    the final cumulative emit per user must equal the batch
    sessionization (30-min gap) over the same events."""
    import time

    from pyspark.sql import functions as F

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "user_id", "ts", "event_id"
    )
    cut = ev.agg(F.percentile_approx("ts", 0.5).alias("m")).collect()[0].m
    src = tmp_path / "stream_in"
    src.mkdir()
    # plain single files (write.parquet makes directories, which the
    # file stream source does not list)
    ev.filter(F.col("ts") <= cut).toPandas().to_parquet(
        str(src / "a.parquet"), coerce_timestamps="us", allow_truncated_timestamps=True
    )
    time.sleep(1.2)  # file-source orders batches by modification time
    ev.filter(F.col("ts") > cut).toPandas().to_parquet(
        str(src / "b.parquet"), coerce_timestamps="us", allow_truncated_timestamps=True
    )

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    out = stateful_sessionize(stream, gap_minutes=30)
    q = (
        out.writeStream.format("memory")
        .queryName("sess_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert q.exception() is None
    got = {
        r.user_id: (r.ns, r.ne)
        for r in spark.table("sess_test")
        .groupBy("user_id")
        .agg(F.max("n_sessions").alias("ns"), F.max("n_events").alias("ne"))
        .collect()
    }

    gap_us = 30 * 60 * 1_000_000
    w = __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy(
        "user_id"
    ).orderBy("ts", "event_id")
    batch = (
        ev.withColumn("prev", F.lag(F.unix_micros("ts")).over(w))
        .withColumn(
            "new_s",
            F.when(
                F.col("prev").isNull()
                | ((F.unix_micros("ts") - F.col("prev")) > gap_us),
                1,
            ).otherwise(0),
        )
        .groupBy("user_id")
        .agg(F.sum("new_s").alias("ns"), F.count("*").alias("ne"))
    )
    expected = {r.user_id: (r.ns, r.ne) for r in batch.collect()}
    assert got == expected


def test_stream_stream_join_matches_batch(spark, tmp_path):
    """Watermarked stream-stream join over a finite replay must equal
    the batch range join (inner pairs)."""
    from pyspark.sql import functions as F

    from legal_data_ingestion_rag_pipeline_spark.streaming.pipeline import (
        stream_stream_click_purchase,
    )

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    src = tmp_path / "ss_in"
    src.mkdir()
    ev.toPandas().to_parquet(
        str(src / "all.parquet"), coerce_timestamps="us", allow_truncated_timestamps=True
    )
    stream = spark.readStream.schema(ev.schema).parquet(str(src))
    out = stream_stream_click_purchase(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("ss_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert q.exception() is None
    got = {
        (r.purchase_id, r.click_id)
        for r in spark.table("ss_join").collect()
    }

    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("event_id").alias("pid"), F.col("ts").alias("pts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("event_id").alias("cid"), F.col("ts").alias("cts")
    )
    expected = {
        (r.pid, r.cid)
        for r in p.join(
            c,
            (F.col("pu") == F.col("cu"))
            & (F.col("cts") >= F.col("pts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("cts") < F.col("pts")),
        ).collect()
    }
    assert got == expected and len(expected) > 0


def test_streaming_dedup_exact_matches_batch(spark, tmp_path):
    """Two-file replay with duplicates within and across micro-batches:
    the surviving content hashes equal the batch exact-dedup groups,
    and exactly one row survives per hash."""
    import json

    from legal_data_ingestion_rag_pipeline_spark.streaming.pipeline import (
        streaming_dedup_exact,
    )

    src = tmp_path / "docs_in"
    src.mkdir()
    batch1 = [
        {"doc_id": 0, "ts": "2024-05-01T10:00:00", "text": "alpha beta"},
        {"doc_id": 1, "ts": "2024-05-01T10:00:05", "text": "gamma"},
        {"doc_id": 2, "ts": "2024-05-01T10:00:10", "text": "alpha beta"},
    ]
    batch2 = [
        {"doc_id": 3, "ts": "2024-05-01T10:10:00", "text": "gamma"},
        {"doc_id": 4, "ts": "2024-05-01T10:10:05", "text": "delta"},
    ]
    for i, rows in enumerate((batch1, batch2)):
        (src / f"b{i}.json").write_text("\n".join(json.dumps(r) for r in rows))

    stream = (
        spark.readStream.schema("doc_id bigint, ts timestamp, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        streaming_dedup_exact(stream)
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM dedup_out").collect()

    # one survivor per distinct content, which one depends on the
    # micro-batch replay order of the two files (both are valid
    # first-occurrence outcomes)
    assert sorted(r.doc_id for r in out) in ([0, 1, 4], [0, 3, 4])
    assert len({r.content_hash for r in out}) == len(out) == 3


def test_streaming_neardup_minhash(spark, tmp_path):
    """Near-identical docs (same shingle set -> same full MinHash
    signature) collapse to the first arrival across micro-batches;
    genuinely different docs and short-doc exact duplicates are
    handled too. Survivors must match the batch rule: first doc per
    (signature or short-text hash) key."""
    from legal_data_ingestion_rag_pipeline_spark.operators.dedup import with_minhash
    from legal_data_ingestion_rag_pipeline_spark.streaming.pipeline import (
        streaming_neardup_minhash,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows1 = [
        (0, "2024-05-01T10:00:00", base),
        (1, "2024-05-01T10:00:05", "completely different words here entirely"),
        (2, "2024-05-01T10:00:10", base),  # near-dup of 0 (identical shingles)
        (3, "2024-05-01T10:00:15", "hi"),  # short doc -> exact-hash path
    ]
    rows2 = [
        (4, "2024-05-01T10:10:00", base),  # still within watermark -> dropped
        (5, "2024-05-01T10:10:05", "hi"),  # exact short dup -> dropped
        (6, "2024-05-01T10:10:10", "fresh unseen content stream token run"),
        (7, "2024-05-01T10:10:15", None),  # null text -> pass through
        (8, "2024-05-01T10:10:20", None),  # null text -> NOT a dup of 7
    ]
    import pandas as pd

    d = tmp_path / "docs_in"
    d.mkdir()
    for name, rows in (("b1", rows1), ("b2", rows2)):
        pdf = pd.DataFrame(
            [
                {"doc_id": i, "ts": pd.Timestamp(ts), "text": t}
                for i, ts, t in rows
            ]
        )
        # write us-precision timestamps: pandas' default ns parquet
        # would surface as int64 under the session's nanosAsLong
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        pdf.to_parquet(d / f"{name}.parquet")
    stream = spark.readStream.schema("doc_id bigint, ts timestamp, text string").parquet(
        str(d)
    )
    out = streaming_neardup_minhash(stream, watermark="1 hour", id_col="doc_id")
    q = (
        out.writeStream.format("memory")
        .queryName("neardup_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    survivors = {r.doc_id for r in spark.table("neardup_sink").collect()}
    # one of {0,2,4} (same signature), one of {3,5} (same text), plus 1
    # and 6 — and BOTH null-text docs pass through (sha2(NULL) is NULL;
    # without the per-row surrogate key, 8 would be swallowed as a
    # "duplicate" of 7)
    assert len(survivors & {0, 2, 4}) == 1
    assert len(survivors & {3, 5}) == 1
    assert {1, 6, 7, 8} <= survivors and len(survivors) == 6

    # the signature key agrees with the batch kernel: 0 and 2 share a
    # signature, 1 differs
    batch = spark.createDataFrame(
        [(i, t) for i, _ts, t in rows1 if len(t.split()) >= 3],
        "doc_id bigint, text string",
    )
    sigs = {r.doc_id: tuple(r.minhash) for r in with_minhash(batch, "text", "doc_id").collect()}
    assert sigs[0] == sigs[2] != sigs[1]


def test_streaming_cms_matches_batch_sketch(spark, tmp_path):
    """Two micro-batches of documents merged through start_cms_stream
    equal the batch sketch over the union — streaming maintenance is
    exactly counter addition, so estimates are identical too."""
    from pyspark.sql import functions as F

    from legal_data_ingestion_rag_pipeline_spark.functions import portable as PT
    from legal_data_ingestion_rag_pipeline_spark.operators import sketches
    from legal_data_ingestion_rag_pipeline_spark.streaming.pipeline import (
        start_cms_stream,
    )

    src = tmp_path / "docs_in"
    src.mkdir()
    texts1 = ["the quick brown fox", "the lazy dog", "the the the"]
    texts2 = ["quick quick", "fox and dog and fox"]
    (src / "b1.jsonl").write_text(
        "\n".join(json.dumps({"text": t}) for t in texts1)
    )
    stream = spark.readStream.schema("text string").json(str(src))
    state: dict = {}
    q = start_cms_stream(spark, stream, state, str(tmp_path / "cms_ckpt"), d=3, width=64)
    q.awaitTermination(120)
    (src / "b2.jsonl").write_text(
        "\n".join(json.dumps({"text": t}) for t in texts2)
    )
    q = start_cms_stream(spark, stream, state, str(tmp_path / "cms_ckpt"), d=3, width=64)
    q.awaitTermination(120)

    whole = spark.createDataFrame(
        [(t,) for t in texts1 + texts2], "text string"
    ).select(F.explode(F.expr(PT.tokens("text", PT.SPARK))).alias("tok"))
    want = {
        (r.h_idx, r.bucket): r.cnt
        for r in sketches.cms_build(whole, "tok", d=3, width=64).collect()
    }
    got = {(r.h_idx, r.bucket): r.cnt for r in state["sketch"].collect()}
    assert got == want
    # and the standing sketch answers point queries correctly
    est = {
        r.tok: r.est
        for r in sketches.cms_estimate(
            state["sketch"], whole.select("tok").distinct(), "tok", d=3, width=64
        ).collect()
    }
    assert est["the"] >= 5 and est["fox"] >= 3


def test_sliding_windows_each_event_in_two(spark, tmp_path):
    """windowed_sliding_stats (2d window / 1d slide): the total of
    n_events across windows is exactly 2x the event count (every
    event belongs to two epoch-aligned windows), and each event's day
    window and the preceding day's window both contain it."""
    from datetime import datetime

    from legal_data_ingestion_rag_pipeline_spark.streaming.pipeline import (
        windowed_sliding_stats,
    )

    rows = [
        (1, datetime(2026, 1, 5, 3), "click", 1.0),
        (2, datetime(2026, 1, 5, 20), "click", 2.0),
        (3, datetime(2026, 1, 7, 1), "view", 4.0),
    ]
    src = tmp_path / "ev"
    spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, event_type string, value double"
    ).write.parquet(str(src))
    schema = spark.read.parquet(str(src)).schema
    stream = spark.readStream.schema(schema).parquet(str(src))
    q = (
        windowed_sliding_stats(stream)
        .writeStream.format("memory")
        .queryName("slide_test_sink")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table("slide_test_sink").collect()
    assert sum(r.n_events for r in out) == 2 * len(rows)
    starts = {(str(r.win_start), r.event_type): r.n_events for r in out}
    assert starts[("2026-01-05 00:00:00", "click")] == 2
    assert starts[("2026-01-04 00:00:00", "click")] == 2
    assert starts[("2026-01-07 00:00:00", "view")] == 1
    assert starts[("2026-01-06 00:00:00", "view")] == 1


def test_transform_with_state_wallet_matches_batch(spark, tmp_path):
    """transformWithStateInPandas (the Spark 4 typed-state API): two
    time-ordered micro-batches through stateful_wallet_balance; the
    final cumulative emit per user must equal the batch clamped walk
    (operators/recurrence.clamped_running_balance) over the same
    events — state continues across batches through RocksDB."""
    import time

    from pyspark.sql import functions as F

    import pytest

    try:  # transformWithState's Python worker protocol needs protobuf,
        # which this image ships broken — same import-gate convention
        # as the sentence-transformers embedder (plans/rag.py)
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        pytest.skip("google.protobuf unavailable: transformWithState "
                    "worker cannot start in this image")

    from legal_data_ingestion_rag_pipeline_spark.operators.recurrence import (
        clamped_running_balance,
    )
    from legal_data_ingestion_rag_pipeline_spark.streaming.pipeline import (
        stateful_wallet_balance,
    )

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    cut = ev.agg(F.percentile_approx("ts", 0.5).alias("m")).collect()[0].m
    src = tmp_path / "stream_in"
    src.mkdir()
    ev.filter(F.col("ts") <= cut).toPandas().to_parquet(
        str(src / "a.parquet"),
        coerce_timestamps="us",
        allow_truncated_timestamps=True,
    )
    time.sleep(1.2)
    ev.filter(F.col("ts") > cut).toPandas().to_parquet(
        str(src / "b.parquet"),
        coerce_timestamps="us",
        allow_truncated_timestamps=True,
    )

    prior_provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        out = stateful_wallet_balance(stream)
        q = (
            out.writeStream.format("memory")
            .queryName("wallet_test")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        assert q.exception() is None
        got = {
            r.user_id: (r.final_balance, r.n_clamps, r.n_steps)
            for r in spark.table("wallet_test")
            .withColumn(
                "rn",
                F.row_number().over(
                    __import__("pyspark.sql.window", fromlist=["Window"])
                    .Window.partitionBy("user_id")
                    .orderBy(F.desc("n_steps"))
                ),
            )
            .filter(F.col("rn") == 1)
            .collect()
        }
    finally:
        if prior_provider is not None:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass",
                prior_provider,
            )

    deltas = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.expr(
            "CASE event_type"
            " WHEN 'purchase' THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT)"
            " WHEN 'error' THEN -CAST(floor(value * 100.0 + 0.5) AS BIGINT)"
            " ELSE CAST(0 AS BIGINT) END"
        ).alias("delta"),
    )
    want = {
        r.user_id: (r.final_balance, r.n_clamps, r.n_steps)
        for r in clamped_running_balance(
            deltas, "user_id", ["ts", "event_id"], "delta"
        ).collect()
    }
    assert got == want


def test_session_window_exact_gap_merges(spark):
    # Spark's session_window merge rule is LENIENT: a successor at
    # EXACTLY t+gap still merges into the session — a new session
    # starts only when the gap is strictly exceeded.  This is the rule
    # streaming_session_windows' oracle mirrors (new_s on diff > gap),
    # the same convention as the batch sessionization query.
    from pyspark.sql import functions as F

    gap_us = 1_800_000_000  # 30 minutes
    t0 = 1_600_000_000_000_000
    rows = [
        (1, t0),                     # session A
        (1, t0 + gap_us - 1),        # merges: 1 us inside the window
        (1, t0 + 2 * gap_us - 1),    # still merges off the second event
        (2, t0),                     # session B
        (2, t0 + gap_us),            # exactly at the edge: MERGES
    ]
    df = spark.createDataFrame(rows, "user_id int, us long").select(
        "user_id", F.timestamp_micros("us").alias("ts")
    )
    out = (
        df.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n"))
        .select("user_id", "n")
        .orderBy("user_id", "n")
        .collect()
    )
    got = [(r.user_id, r.n) for r in out]
    assert got == [(1, 3), (2, 2)]


def test_stream_to_tlog_retry_is_noop(spark, tmp_path):
    # the exactly-once contract of the tlog streaming sink: a RETRIED
    # micro-batch (same epoch id) must not change the table — the
    # epoch token makes the second commit a manifest no-op.
    from pyspark.sql import functions as F

    from legal_data_ingestion_rag_pipeline_spark.operators import tlog
    from legal_data_ingestion_rag_pipeline_spark.streaming.pipeline import (
        stream_to_tlog,
    )

    import glob as _glob
    import shutil as _shutil

    src = tmp_path / "src"
    src.mkdir()
    table = str(tmp_path / "table")
    df = spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(30)], "id long, k int, v double"
    )
    # the file stream source does not recurse into parquet DIRECTORIES:
    # stage the write, then move the single part out as a plain file
    # (the driver-testdata layout).
    staging = tmp_path / "staging"
    df.coalesce(1).write.parquet(str(staging))
    part = _glob.glob(str(staging / "part-*.parquet"))[0]
    _shutil.move(part, str(src / "batch1.parquet"))

    schema = spark.read.parquet(str(src / "batch1.parquet")).schema
    stream = spark.readStream.schema(schema).parquet(str(src))
    q = stream_to_tlog(stream, table)
    q.awaitTermination()

    v_after = tlog.current_version(table)
    n_after = tlog.read_version(spark, table).count()
    assert n_after == 30

    # simulate the at-least-once retry: re-commit batch 0's data with
    # the SAME epoch — version and contents must not move.
    tlog.commit(spark.read.parquet(str(src / "batch1.parquet")), table,
                "append", epoch=0)
    assert tlog.current_version(table) == v_after
    assert tlog.read_version(spark, table).count() == 30

    # a genuinely NEW epoch does append.
    tlog.commit(
        spark.createDataFrame([(99, 0, 9.9)], "id long, k int, v double"),
        table, "append", epoch=v_after + 1000,
    )
    assert tlog.read_version(spark, table).count() == 31


def test_stateful_kmv_state_survives_micro_batches(spark, tmp_path):
    """Two micro-batches through the streaming KMV: the merged final
    state must equal the batch bottom-k over all rows (state survives
    and merges), and the intermediate emits must be monotone."""
    import time

    from pyspark.sql import functions as F

    from legal_data_ingestion_rag_pipeline_spark.operators.sketches import (
        kmv_hash_sql,
    )
    from legal_data_ingestion_rag_pipeline_spark.streaming.pipeline import (
        stateful_kmv_distinct,
    )

    rows_a = [("t", str(i)) for i in range(0, 300)]
    rows_b = [("t", str(i)) for i in range(150, 500)]
    import pandas as pd

    src = tmp_path / "kmv_in"
    src.mkdir()
    pd.DataFrame(rows_a, columns=["key", "uid"]).to_parquet(
        str(src / "a.parquet")
    )
    time.sleep(1.2)
    pd.DataFrame(rows_b, columns=["key", "uid"]).to_parquet(
        str(src / "b.parquet")
    )
    stream = (
        spark.readStream.schema("key string, uid string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    hashed = stream.select(
        "key", F.expr(kmv_hash_sql("uid", "spark")).alias("h")
    )
    out = stateful_kmv_distinct(hashed, k=64)
    q = (
        out.writeStream.format("memory")
        .queryName("kmv_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert q.exception() is None
    emits = spark.table("kmv_test").orderBy("seq").collect()
    assert len(emits) == 2  # one emit per micro-batch
    assert [r.seq for r in emits] == [1, 2]
    # batch reference over ALL rows
    all_df = spark.createDataFrame(
        rows_a + rows_b, "key: string, uid: string"
    ).select("key", F.expr(kmv_hash_sql("uid", "spark")).alias("h"))
    want = sorted(
        r.h for r in all_df.select("h").distinct().orderBy("h").limit(64).collect()
    )
    # final state = the max-seq emit, which equals the batch bottom-k
    final = emits[-1]
    assert final.n_held == 64
    assert final.h_k == want[-1]


def test_stateful_kmv_underfull_first_batch_recovery(spark, tmp_path):
    """Regression (round-12 advice): when the FIRST micro-batch holds
    fewer than k distinct hashes, h_k (= max of held hashes) GROWS in
    later batches, so recovering the final state as min(h_k) over
    emits silently picks the early partial maximum.  The seq-based
    max_by recovery must return the true final state == batch
    bottom-k."""
    import time

    import pandas as pd
    from pyspark.sql import functions as F

    from legal_data_ingestion_rag_pipeline_spark.operators.sketches import (
        kmv_hash_sql,
    )
    from legal_data_ingestion_rag_pipeline_spark.streaming.pipeline import (
        stateful_kmv_distinct,
    )

    k = 64
    # adversarial split: batch 1 = the 10 uids with the globally
    # SMALLEST hashes (so its partial max — emitted as h_k — is the
    # 10th overall minimum, far below the final 64th minimum), batch 2
    # = everything else.  10 < k keeps batch 1's sketch underfull.
    uids = [str(i) for i in range(0, 500)]
    order = (
        spark.createDataFrame([(u,) for u in uids], "uid: string")
        .select("uid", F.expr(kmv_hash_sql("uid", "spark")).alias("h"))
        .orderBy("h")
        .collect()
    )
    rows_a = [("t", r.uid) for r in order[:10]]
    rows_b = [("t", r.uid) for r in order[10:]]
    src = tmp_path / "kmv_uf"
    src.mkdir()
    pd.DataFrame(rows_a, columns=["key", "uid"]).to_parquet(
        str(src / "a.parquet")
    )
    time.sleep(1.2)
    pd.DataFrame(rows_b, columns=["key", "uid"]).to_parquet(
        str(src / "b.parquet")
    )
    stream = (
        spark.readStream.schema("key string, uid string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    hashed = stream.select(
        "key", F.expr(kmv_hash_sql("uid", "spark")).alias("h")
    )
    out = stateful_kmv_distinct(hashed, k=k)
    q = (
        out.writeStream.format("memory")
        .queryName("kmv_uf_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert q.exception() is None
    emits = spark.table("kmv_uf_test")
    all_df = spark.createDataFrame(
        rows_a + rows_b, "key: string, uid: string"
    ).select("key", F.expr(kmv_hash_sql("uid", "spark")).alias("h"))
    want = sorted(
        r.h
        for r in all_df.select("h").distinct().orderBy("h").limit(k).collect()
    )
    rec = (
        emits.groupBy("key")
        .agg(
            F.max_by("n_held", "seq").alias("n_held"),
            F.max_by("h_k", "seq").alias("h_k"),
        )
        .collect()[0]
    )
    assert rec.n_held == k
    assert rec.h_k == want[-1]
    # and the OLD recovery (min over emits) really is wrong here — the
    # first emit's partial max is smaller than the true k-th minimum
    bad = emits.agg(F.min("h_k")).collect()[0][0]
    assert bad != want[-1]


def test_stateful_misra_gries_order_and_state_survival(spark, tmp_path):
    """Two time-ordered micro-batches through the streaming MG: the
    final counters must equal a single-pass Python MG replay over the
    concatenated stream in event_id order — the finite-replay
    equivalence for an ORDER-DEPENDENT automaton — and each batch
    must emit exactly once with increasing seq."""
    import time

    import pandas as pd

    from legal_data_ingestion_rag_pipeline_spark.streaming.pipeline import (
        stateful_misra_gries,
    )

    k = 3
    # heavy item 'h' + rotating light items force decrements in both
    # batches; batch split at event_id 40
    items_a = [(i, "h" if i % 2 == 0 else f"l{i % 5}") for i in range(40)]
    items_b = [(i, "h" if i % 3 == 0 else f"m{i % 4}") for i in range(40, 90)]
    src = tmp_path / "mg_in"
    src.mkdir()
    pd.DataFrame(
        [("t", e, it) for e, it in items_a],
        columns=["key", "event_id", "item"],
    ).to_parquet(str(src / "a.parquet"))
    time.sleep(1.2)
    pd.DataFrame(
        [("t", e, it) for e, it in items_b],
        columns=["key", "event_id", "item"],
    ).to_parquet(str(src / "b.parquet"))
    stream = (
        spark.readStream.schema("key string, event_id bigint, item string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    out = stateful_misra_gries(stream, k=k)
    q = (
        out.writeStream.format("memory")
        .queryName("mg_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert q.exception() is None
    emits = spark.table("mg_test").orderBy("seq").collect()
    assert [r.seq for r in emits] == [1, 2]
    # single-pass reference in global event_id order
    ctr: dict[str, int] = {}
    for _e, it in sorted(items_a + items_b):
        if it in ctr:
            ctr[it] += 1
        elif len(ctr) < k:
            ctr[it] = 1
        else:
            for x in list(ctr):
                ctr[x] -= 1
                if ctr[x] == 0:
                    del ctr[x]
    final = emits[-1]
    assert dict(zip(final.items, final.counts)) == ctr
    # MG guarantee on the heavy item: counter is a lower bound within
    # n/(k+1) of the true count
    n = len(items_a) + len(items_b)
    true_h = sum(1 for _e, it in items_a + items_b if it == "h")
    assert "h" in ctr
    assert true_h - n / (k + 1) <= ctr["h"] <= true_h
