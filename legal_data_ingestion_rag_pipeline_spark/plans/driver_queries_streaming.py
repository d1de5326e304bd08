"""Driver query: a real Structured Streaming run (SURVEY §2.7).

The reference lists streaming only as future work; here the tumbling
daily stats (A8) execute as an actual readStream -> watermarked window
agg -> memory sink, trigger(availableNow), and the final table is
compared to a plain GROUP BY oracle. Complete output mode makes the
result independent of micro-batch splits, so the streaming path is
held to the same hash gate as every batch operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions import portable as PT
from ..session import normalize_event_ts
from ..streaming.pipeline import windowed_daily_stats
from .registry import register

D = PT.DUCKDB

_SINK = "streaming_tumbling_counts_sink"


@register(
    "streaming_tumbling_counts",
    oracle="""
    SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
             AS day_start,
           event_type, count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM events GROUP BY day_start, event_type
    ORDER BY day_start, event_type
    """,
    doc="Structured Streaming tumbling 1-day window + 1-day watermark "
    "over the events table (file source, availableNow trigger, memory "
    "sink, complete mode). In production the same agg runs unbounded "
    "with append mode + the watermark bounding state; complete mode "
    "here makes the finite replay deterministic for the oracle.",
)
def streaming_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = sf_dir.rstrip("/")
    # schema from a static read; the file stream source wants a
    # directory, so glob-filter inside sf_dir. nanosAsLong is
    # runtime-settable — set it so a vanilla session (the correctness
    # driver's) can read TIMESTAMP_NANOS parquet generations; ts is
    # normalized to plain TIMESTAMP either way (normalize_event_ts).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    schema = spark.read.parquet(f"{base}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(base)
    )
    stream = normalize_event_ts(stream)
    agg = windowed_daily_stats(stream, watermark="1 day")
    q = (
        agg.writeStream.format("memory")
        .queryName(_SINK)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(_SINK).orderBy("day_start", "event_type")


_DEDUP_SINK = "streaming_dedup_docs_sink"


@register(
    "streaming_dedup_docs",
    oracle="""
    SELECT count(*) AS n_in,
           count(DISTINCT text) AS n_survivors
    FROM documents
    """,
    doc="streaming exact dedup held to the hash gate: the documents "
    "table replayed as a file stream through streaming_dedup_exact "
    "(dropDuplicatesWithinWatermark on the sha256 content hash, "
    "availableNow). WHICH duplicate survives depends on partition "
    "order, so the gated output is the deterministic aggregate — "
    "input rows vs distinct-content survivors — while the replay "
    "test in tests/test_streaming.py pins first-occurrence-wins "
    "across micro-batches.",
)
def streaming_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.pipeline import streaming_dedup_exact

    base = sf_dir.rstrip("/")
    schema = spark.read.parquet(f"{base}/documents.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(base)
    )
    # synthesize an event time (documents carry none): arrival order by
    # doc id, microsecond spacing — all inside one watermark window.
    # Offset well past epoch: the initial watermark is epoch 0 and a
    # row whose event time EQUALS the watermark is dropped as late
    # (cost one row at doc_id=0 before the offset).
    stream = stream.withColumn(
        "ts",
        F.timestamp_micros(F.col("doc_id") + F.lit(1_600_000_000_000_000)),
    )
    deduped = streaming_dedup_exact(stream, text_col="text", ts_col="ts")
    n_in = spark.read.parquet(f"{base}/documents.parquet").count()
    q = (
        deduped.writeStream.format("memory")
        .queryName(_DEDUP_SINK)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(_DEDUP_SINK).agg(
        F.lit(n_in).cast("bigint").alias("n_in"),
        F.count("*").alias("n_survivors"),
    )


_NEARDUP_SINK = "streaming_neardup_docs_sink"

# the oracle recomputes the stream's dedup key per document in DuckDB:
# full MinHash signature (same portable polynomial family as the batch
# MinHash gate) for shingleable text, sha256 fallback for short text,
# per-row unique key for NULL text (passes through undeduplicated).
_NEARDUP_ORACLE = f"""
    WITH t AS (SELECT doc_id, text, {PT.tokens('text', D)} AS toks FROM documents),
    g AS (SELECT doc_id, text, {PT.hash_array('toks', D)} AS th FROM t),
    h AS (SELECT doc_id, text, {PT.word_ngram_hashes('th', 3, D)} AS gh FROM g),
    k AS (
      SELECT doc_id,
             CASE
               WHEN text IS NULL THEN '__null:' || CAST(doc_id AS VARCHAR)
               WHEN len(gh) > 0 THEN array_to_string(
                 list_transform({PT.minhash_from_hashes('gh', 32, D)},
                                x -> CAST(x AS VARCHAR)), ',')
               ELSE sha256(text)
             END AS key
      FROM h)
    SELECT count(*) AS n_in, count(DISTINCT key) AS n_survivors FROM k
"""


@register(
    "streaming_neardup_docs",
    oracle=_NEARDUP_ORACLE,
    doc="streaming MinHash near-dup suppression held to the hash gate, "
    "mirroring streaming_dedup_docs: documents replayed as a file "
    "stream through streaming_neardup_minhash (state keyed on the "
    "FULL 32-slot signature, availableNow). WHICH near-dup survives "
    "depends on partition order, so the gated output is the "
    "deterministic aggregate — input rows vs distinct-key survivors — "
    "while tests/test_streaming.py pins first-occurrence-wins and the "
    "null-text pass-through across micro-batches.",
)
def streaming_neardup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.pipeline import streaming_neardup_minhash

    base = sf_dir.rstrip("/")
    schema = spark.read.parquet(f"{base}/documents.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(base)
    )
    # same synthesized event time as streaming_dedup_docs: arrival order
    # by doc id, offset past the epoch-0 initial watermark.
    stream = stream.withColumn(
        "ts",
        F.timestamp_micros(F.col("doc_id") + F.lit(1_600_000_000_000_000)),
    )
    deduped = streaming_neardup_minhash(
        stream, text_col="text", ts_col="ts", id_col="doc_id"
    )
    n_in = spark.read.parquet(f"{base}/documents.parquet").count()
    q = (
        deduped.writeStream.format("memory")
        .queryName(_NEARDUP_SINK)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(_NEARDUP_SINK).agg(
        F.lit(n_in).cast("bigint").alias("n_in"),
        F.count("*").alias("n_survivors"),
    )


_SLIDE_SINK = "streaming_sliding_counts_sink"


@register(
    "streaming_sliding_counts",
    oracle="""
    WITH ev AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value
                FROM events),
    exp AS (
      SELECT date_trunc('day', ts) - (o * INTERVAL 1 DAY) AS win_start,
             event_type, value
      FROM ev, unnest([0, 1]) AS t(o))
    SELECT CAST(win_start AS TIMESTAMP) AS win_start, event_type,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM exp GROUP BY win_start, event_type
    ORDER BY win_start, event_type
    """,
    doc="Structured Streaming SLIDING windows (2-day window, 1-day "
    "slide) — the hopping-window shape tumbling cannot express; each "
    "event lands in exactly 2 epoch-aligned windows. Real stream "
    "(file source, availableNow, complete mode on the finite "
    "replay); the oracle derives the same windows in batch SQL by "
    "exploding each event into its two window starts. Watermark "
    "bounds state in the unbounded deployment.",
)
def streaming_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.pipeline import windowed_sliding_stats

    base = sf_dir.rstrip("/")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    schema = spark.read.parquet(f"{base}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(base)
    )
    stream = normalize_event_ts(stream)
    agg = windowed_sliding_stats(stream, window="2 days", slide="1 day")
    q = (
        agg.writeStream.format("memory")
        .queryName(_SLIDE_SINK)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(_SLIDE_SINK).orderBy("win_start", "event_type")


_ENRICH_SINK = "streaming_enriched_counts_sink"


@register(
    "streaming_enriched_counts",
    oracle="""
    SELECT c.c_mktsegment AS mktsegment, e.event_type,
           count(*) AS n_events,
           CAST(sum(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY mktsegment, e.event_type
    ORDER BY mktsegment, e.event_type
    """,
    doc="Structured Streaming STREAM-STATIC join — the enrichment "
    "pattern: the event stream joins the static customer dimension "
    "(re-read per micro-batch, broadcastable, no state needed — "
    "unlike stream-stream joins) and aggregates per (segment, type). "
    "Completes the streaming shape matrix: tumbling, sliding, "
    "stateful sessionize, stream-stream, dedup/near-dup, CMS "
    "maintenance, and now dimension enrichment — all held to the "
    "same batch-oracle hash gate on a finite replay.",
)
def streaming_enriched_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = sf_dir.rstrip("/")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    schema = spark.read.parquet(f"{base}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(base)
    )
    stream = normalize_event_ts(stream)
    from ..session import load_table as _lt

    customers = _lt(spark, sf_dir, "customer").select(
        F.col("c_custkey"), F.col("c_mktsegment").alias("mktsegment")
    )
    enriched = stream.join(
        F.broadcast(customers), stream.user_id == customers.c_custkey
    )
    agg = enriched.groupBy("mktsegment", "event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,4)"))
        .cast("double")
        .alias("total_value"),
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(_ENRICH_SINK)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(_ENRICH_SINK).orderBy("mktsegment", "event_type")


_SSJOIN_SINK = "streaming_interval_join_sink"


@register(
    "streaming_interval_join",
    oracle="""
    WITH p AS (SELECT user_id, event_id AS purchase_id,
                      CAST(ts AS TIMESTAMP) AS pts
               FROM events WHERE event_type = 'purchase'),
         c AS (SELECT user_id, event_id AS click_id,
                      CAST(ts AS TIMESTAMP) AS cts
               FROM events WHERE event_type = 'click')
    SELECT p.purchase_id, c.click_id, p.user_id
    FROM p JOIN c
      ON p.user_id = c.user_id
     AND c.cts >= p.pts - INTERVAL 1 HOUR AND c.cts < p.pts
    ORDER BY purchase_id, click_id
    """,
    doc="stream-stream interval join (streaming/pipeline.stream_"
    "stream_click_purchase): purchases and clicks are two watermarked "
    "streams joined on user with the click bounded to the hour before "
    "the purchase — the interval condition is what lets Spark EXPIRE "
    "buffered join state (a click older than watermark minus the "
    "interval can never match again), which is the difference between "
    "bounded state and an unbounded buffer at 100 TB/day. File "
    "source, availableNow trigger, append mode; on the finite replay "
    "the inner-join output equals the batch range join, which is the "
    "oracle.",
)
def streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.pipeline import stream_stream_click_purchase

    base = sf_dir.rstrip("/")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    schema = spark.read.parquet(f"{base}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(base)
    )
    stream = normalize_event_ts(stream)
    out = stream_stream_click_purchase(stream, watermark="2 hours")
    q = (
        out.writeStream.format("memory")
        .queryName(_SSJOIN_SINK)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(_SSJOIN_SINK).orderBy("purchase_id", "click_id")


_SWEEP_SINK = "streaming_peak_concurrency_sink"


@register(
    "streaming_peak_concurrency",
    oracle="""
    WITH ev AS (SELECT CAST(ts AS TIMESTAMP) AS ts FROM events),
    deltas AS (
      SELECT ts, 1 AS d FROM ev
      UNION ALL
      SELECT ts + INTERVAL 5 MINUTE, -1 AS d FROM ev
    ), per_ts AS (
      SELECT ts, SUM(d) AS delta FROM deltas GROUP BY ts
    ), rt AS (
      SELECT CAST(ts AS DATE) AS day,
             SUM(delta) OVER (ORDER BY ts) AS concur
      FROM per_ts
    ), daily AS (
      SELECT day, CAST(max(concur) AS BIGINT) AS peak_concurrent
      FROM rt GROUP BY day
    ), dd AS (
      SELECT CAST(ts AS DATE) AS day, SUM(delta) AS day_delta
      FROM per_ts GROUP BY 1
    ), off AS (
      SELECT day,
             CAST(coalesce(SUM(day_delta) OVER (
               ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS carry_in
      FROM dd
    )
    SELECT d.day, o.carry_in, d.peak_concurrent
    FROM daily d JOIN off o USING (day) ORDER BY day
    """,
    doc="the sweep-line concurrency split into its LAMBDA shape: each "
    "event opens a 5-minute activity lease ([ts, ts+5min) — the "
    "stateless interval form, no sessionizer needed), the STREAMING "
    "stage maintains the per-timestamp delta pre-aggregate (the "
    "commutative-associative half — streams incrementally under a "
    "watermark in the unbounded deployment; complete mode on the "
    "finite replay makes the result micro-batch-split independent), "
    "and the BATCH stage (sweep.finalize_daily_peaks) folds the "
    "already-shrunk change-point table into daily peaks with the "
    "two-phase prefix sum — the order-DEPENDENT half that cannot "
    "stream. Gated against the single-sort batch sweep in SQL, so "
    "the stream+finalize composition must be bit-equal to the batch "
    "path.",
)
def streaming_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import sweep

    base = sf_dir.rstrip("/")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    schema = spark.read.parquet(f"{base}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(base)
    )
    stream = normalize_event_ts(stream)
    deltas = stream.select(
        F.explode(
            F.array(
                F.struct(F.col("ts"), F.lit(1).alias("d")),
                F.struct(
                    (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("ts"),
                    F.lit(-1).alias("d"),
                ),
            )
        ).alias("x")
    ).select("x.ts", "x.d")
    per_ts = (
        deltas.withWatermark("ts", "1 day")
        .groupBy("ts")
        .agg(F.sum("d").alias("delta"))
    )
    q = (
        per_ts.writeStream.format("memory")
        .queryName(_SWEEP_SINK)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sweep.finalize_daily_peaks(spark.table(_SWEEP_SINK)).orderBy("day")


_SESSION_SINK = "streaming_session_windows_sink"


@register(
    "streaming_session_windows",
    bench=True,
    oracle="""
    WITH o AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                    OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                       > 1800000000
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, ts, value,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM o
    )
    SELECT user_id,
           CAST(min(ts) AS TIMESTAMP) AS session_start,
           make_timestamp(max(epoch_us(ts)) + 1800000000) AS session_end,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM s GROUP BY user_id, sid
    ORDER BY user_id, session_start
    """,
    doc="Structured Streaming SESSION windows (the dynamic-gap shape "
    "completing the window matrix beside tumbling and sliding): "
    "session_window(ts, 30 minutes) per user over the events file "
    "stream, availableNow, memory sink, complete mode.  The oracle is "
    "the lag/cumsum batch twin with Spark's merge rule mirrored "
    "EXACTLY: a successor at exactly gap distance MERGES — new "
    "session only when diff > gap, the lenient rule, pinned "
    "empirically by test_session_window_exact_gap_merges and "
    "agreeing with the batch sessionization query.  session_end is "
    "last event + gap, Spark's window.end.  In production the same "
    "agg runs unbounded in append mode with the watermark closing "
    "sessions; complete mode makes the finite replay deterministic "
    "for the hash gate.  DECIMAL sums keep values exact.",
)
def streaming_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = sf_dir.rstrip("/")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    schema = spark.read.parquet(f"{base}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(base)
    )
    stream = normalize_event_ts(stream)
    agg = (
        stream.withWatermark("ts", "1 day")
        .groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("double")
            .alias("total_value"),
        )
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(_SESSION_SINK)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(_SESSION_SINK)
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
        .orderBy("user_id", "session_start")
    )


import itertools as _it
import os as _os
import tempfile as _tempfile

_TLOG_SINK_SEQ = _it.count()


@register(
    "streaming_tlog_sink",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    """,
    doc="exactly-once streaming sink into the tlog table format: the "
    "events file stream lands through foreachBatch where EVERY "
    "micro-batch is one tlog.commit(epoch=batch_id) — the epoch "
    "idempotence token makes a retried batch a manifest no-op "
    "(operators/tlog.py), upgrading at-least-once delivery to "
    "exactly-once table contents (Delta's txn-version contract in "
    "one manifest line; retry no-op pinned by "
    "test_stream_to_tlog_retry_is_noop).  The gated output reads "
    "the committed table back through the manifest and aggregates "
    "split-invariant totals, so the hash holds under ANY "
    "micro-batch partitioning.  Scale: each batch writes its own "
    "version directory (no rewrite of history); vacuum/compact "
    "bound manifest replay as the stream ages.",
)
def streaming_tlog_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib

    from ..operators import tlog
    from ..streaming.pipeline import stream_to_tlog

    base = sf_dir.rstrip("/")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    tag = (
        f"{hashlib.sha256(base.encode()).hexdigest()[:12]}"
        f"_{_os.getpid()}_{next(_TLOG_SINK_SEQ)}"
    )
    table = _os.path.join(
        _tempfile.gettempdir(), f"spark_graft_stream_tlog_{tag}"
    )
    schema = spark.read.parquet(f"{base}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(base)
    )
    stream = normalize_event_ts(stream).select(
        "event_id", "user_id", "event_type", "value"
    )
    q = stream_to_tlog(stream, table)
    q.awaitTermination()
    out = tlog.read_version(spark, table)
    return out.agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.countDistinct("event_type").cast("bigint").alias("n_types"),
        F.sum(F.col("value").cast("decimal(18,4)"))
        .cast("double")
        .alias("total_value"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    )


_STATEFUL_SESS_SINK = "streaming_stateful_sessionize_sink"


@register(
    "streaming_stateful_sessionize",
    oracle="""
    WITH g AS (
      SELECT user_id, ts,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
               OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             THEN 1 ELSE 0 END AS new_session
      FROM events
    )
    SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions,
           count(*) AS n_events
    FROM g GROUP BY user_id ORDER BY user_id
    """,
    doc="the CUSTOM stateful streaming operator held to the hash gate: "
    "streaming.pipeline.stateful_sessionize (applyInPandasWithState — "
    "per-user GroupState carries (last event us, sessions, events) "
    "across micro-batches, a 30-minute inactivity gap starts a "
    "session) run over the events table replayed as a file stream, "
    "availableNow, memory sink.  Each micro-batch emits the "
    "CUMULATIVE per-user totals, so max-per-user over the appended "
    "emits is the final state regardless of how the replay split "
    "into batches, and on a finite replay that equals the batch "
    "lag/cumsum sessionization — the SAME oracle SQL as the batch "
    "`sessionization` query, making this the finite-replay "
    "equivalence the two-micro-batch pytest "
    "(tests/test_streaming.py) pins locally.  Scale: state is "
    "per-user O(1) (three BIGINTs); unbounded deployments add a "
    "ProcessingTimeTimeout + TTL for abandoned keys.",
)
def streaming_stateful_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.pipeline import stateful_sessionize

    base = sf_dir.rstrip("/")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    schema = spark.read.parquet(f"{base}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(base)
    )
    stream = normalize_event_ts(stream)
    sess = stateful_sessionize(stream, gap_minutes=30)
    q = (
        sess.writeStream.format("memory")
        .queryName(_STATEFUL_SESS_SINK)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # cumulative emits: the per-user max IS the final state, batch
    # split-invariant (both counters are non-decreasing per user)
    return (
        spark.table(_STATEFUL_SESS_SINK)
        .groupBy("user_id")
        .agg(
            F.max("n_sessions").cast("bigint").alias("n_sessions"),
            F.max("n_events").cast("bigint").alias("n_events"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# streaming_kmv_distinct (round 12): the KMV bottom-k sketch as a
# custom stateful streaming operator.
# ---------------------------------------------------------------------------

_KMV_STREAM_K = 64
_KMV_STREAM_SINK = "streaming_kmv_distinct_sink"


def _skmv_oracle() -> str:
    from ..operators.sketches import kmv_hash_sql

    h = kmv_hash_sql("CAST(user_id AS VARCHAR)", "duckdb")
    return f"""
    WITH hs AS (
      SELECT DISTINCT event_type, {h} AS h FROM events
    ),
    ranked AS (
      SELECT event_type, h,
             row_number() OVER (PARTITION BY event_type ORDER BY h) AS rk
      FROM hs
    ),
    bk AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_held,
             CAST(max(h) AS BIGINT) AS h_k
      FROM ranked WHERE rk <= {_KMV_STREAM_K}
      GROUP BY event_type
    )
    SELECT event_type, n_held, h_k,
           CAST(CASE WHEN n_held < {_KMV_STREAM_K} THEN n_held
                ELSE FLOOR(({_KMV_STREAM_K} - 1) * 1000000007.0 / h_k + 0.5)
                END AS BIGINT) AS est_distinct
    FROM bk ORDER BY event_type
    """


@register(
    "streaming_kmv_distinct",
    oracle=_skmv_oracle(),
    doc="the KMV bottom-k distinct sketch as a CUSTOM STATEFUL "
    "STREAMING operator (streaming.pipeline.stateful_kmv_distinct + "
    "sketches.kmv_hash_sql): per event_type, GroupState carries the "
    "sorted bottom-64 distinct uniformized user hashes across "
    "micro-batches plus an emit sequence counter; the final state is "
    "recovered as the max-seq emit per key (max_by), which equals "
    "the batch bottom-k over a finite replay regardless of the "
    "micro-batch split — the sessionize finite-replay equivalence "
    "applied to a sketch (min(h_k) over emits would be wrong while "
    "the sketch is underfull).  The "
    "estimator ((k-1)*P/h_k, exact count when n_held < k) applies "
    "AFTER the final aggregation, so the stream carries only exact "
    "integers and the oracle is the batch KMV SQL.  O(k) state per "
    "key; events replayed as a file stream, availableNow, memory "
    "sink.",
)
def streaming_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import kmv_hash_sql
    from ..streaming.pipeline import stateful_kmv_distinct

    base = sf_dir.rstrip("/")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    schema = spark.read.parquet(f"{base}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(base)
    )
    hashed = stream.select(
        F.col("event_type").alias("key"),
        F.expr(
            kmv_hash_sql("CAST(user_id AS STRING)", "spark")
        ).alias("h"),
    )
    out = stateful_kmv_distinct(hashed, k=_KMV_STREAM_K)
    q = (
        out.writeStream.format("memory")
        .queryName(_KMV_STREAM_SINK)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # final state per key = the LAST emit (largest seq).  min(h_k)
    # over emits would be wrong while the sketch is underfull: h_k is
    # the max of the held hashes until n_held reaches k, so an early
    # partial batch could contribute a spuriously small h_k.
    final = (
        spark.table(_KMV_STREAM_SINK)
        .groupBy(F.col("key").alias("event_type"))
        .agg(
            F.max_by("n_held", "seq").cast("bigint").alias("n_held"),
            F.max_by("h_k", "seq").cast("bigint").alias("h_k"),
        )
    )
    return final.select(
        "event_type",
        "n_held",
        "h_k",
        F.expr(
            f"CAST(CASE WHEN n_held < {_KMV_STREAM_K} THEN n_held"
            f" ELSE FLOOR(({_KMV_STREAM_K} - 1) * 1000000007.0 / h_k + 0.5)"
            f" END AS BIGINT)"
        ).alias("est_distinct"),
    ).orderBy("event_type")
