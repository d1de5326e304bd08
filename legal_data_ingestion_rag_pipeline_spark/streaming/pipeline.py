"""Streaming ingestion seam + windowed stats (SURVEY §2.7).

The reference lists streaming ingestion only as future work
(README.md:244-245); the engine is built so batch and streaming share
one code path: `ingest_batch` is a pure function, so a stream of raw
dockets runs through `foreachBatch` with MERGE sinks unchanged —
idempotent upserts give exactly-once table state on retries.

Also provides the tumbling-window daily stats (A8's streaming form)
with watermarked late-data handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..plans.ingest import ingest_batch
from ..sources.readers import RAW_SCHEMA


def read_docket_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream of docket JSONL (one object per line).

    Kafka/Kinesis swap in by replacing this reader — the rest of the
    pipeline is source-agnostic.
    """
    return spark.readStream.schema(RAW_SCHEMA).json(input_dir)


def start_ingest_stream(
    spark: SparkSession,
    raw_stream: DataFrame,
    state: dict,
    checkpoint_dir: str,
):
    """foreachBatch wiring: each micro-batch runs the SAME ingest_batch
    as the batch path; `state` carries the evolving table versions
    (in a deployment: Delta tables, where MERGE makes each batch
    idempotent under retry).
    """

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        batch = batch_df.withColumn("_seq", F.monotonically_increasing_id())
        result = ingest_batch(
            spark, batch, existing=state.get("tables"), run_id=epoch_id + 1
        )
        # materialize new versions so the next batch sees them
        state["tables"] = {k: v.localCheckpoint(eager=True) for k, v in result.tables.items()}
        state.setdefault("counts", []).append(result.counts)
        # tables are checkpointed — drop the batch caches so a
        # long-running stream doesn't hold one validation pass per
        # micro-batch in executor memory
        result.release()

    return (
        raw_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stateful_sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState):
    per-user session counting with a `gap_minutes` inactivity split.

    State per user = (last event epoch-us, sessions so far, events so
    far); each micro-batch emits the cumulative totals, so the latest
    emit per user equals the batch sessionization query over the same
    events — the test feeds two time-ordered files as two micro-batches
    and asserts exactly that (state survives across batches).

    At scale: state is per-user O(1); with real unbounded streams add
    a ProcessingTimeTimeout + state TTL for abandoned keys.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key, pdfs, state):
        import pandas as pd

        pdf = pd.concat(list(pdfs))
        if len(pdf) == 0:
            return
        # total order matching the batch oracle's (ts, event_id)
        pdf = pdf.sort_values(["ts", "event_id"])
        if state.exists:
            last_us, n_sessions, n_events = state.get
        else:
            last_us, n_sessions, n_events = -(10**18), 0, 0
        for ts in pdf["ts"]:
            us = ts.value // 1000  # pandas ns -> epoch us
            if us - last_us > gap_us:
                n_sessions += 1
            n_events += 1
            last_us = us
        state.update((int(last_us), int(n_sessions), int(n_events)))
        yield pd.DataFrame(
            [(key[0], n_sessions, n_events)],
            columns=["user_id", "n_sessions", "n_events"],
        )

    return events.select("user_id", "ts", "event_id").groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType="user_id bigint, n_sessions bigint, n_events bigint",
        stateStructType="last_us bigint, n_sessions bigint, n_events bigint",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_stream_click_purchase(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Stream-stream inner join: each purchase joined to the same
    user's clicks from the preceding hour (the streaming twin of the
    batch range_join_clicks_before_purchase query).

    Both sides carry watermarks and the join condition bounds click
    time relative to purchase time, so Spark can expire buffered state:
    a click older than (purchase watermark - 1h) can never match again.
    On a finite replay the inner-join output equals the batch range
    join — the test asserts exactly that.
    """
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("pts"),
        )
        .withWatermark("pts", watermark)
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("cts"),
        )
        .withWatermark("cts", watermark)
    )
    return purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("cts") >= F.col("pts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("cts") < F.col("pts")),
        "inner",
    ).select("purchase_id", "click_id", F.col("p_user").alias("user_id"))


def windowed_daily_stats(events: DataFrame, watermark: str = "1 day") -> DataFrame:
    """A8 as a streaming aggregation: tumbling 1-day windows with a
    watermark bounding state for late data."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            # decimal partial sums make the result independent of the
            # float-add order across partitions/micro-batches
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").alias("day_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def windowed_sliding_stats(
    events: DataFrame,
    window: str = "2 days",
    slide: str = "1 day",
    watermark: str = "1 day",
) -> DataFrame:
    """Sliding (hopping) windows — the overlapping-window shape
    tumbling cannot express: every event lands in window/slide
    windows (2 here), the rolling-rate view dashboards actually
    want. Same bounded-state contract as the tumbling agg: the
    watermark closes windows whose end has passed; state is
    (windows-per-event x groups), still bounded. Decimal partial sums
    keep totals order-independent across micro-batches.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def streaming_dedup_exact(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: first occurrence per content hash wins.

    The streaming face of operators/dedup.exact_dedup for a continuous
    document feed (the standing-index batch variant is
    dedup_incremental_exact). ``dropDuplicatesWithinWatermark`` keys
    state on the sha256 content hash and EVICTS entries older than the
    watermark — bounded state at 100 TB/day feeds, with the documented
    contract that a duplicate arriving later than the watermark gap
    re-admits the content (the batch standing-index pass is the
    backstop for those).
    """
    h = F.sha2(F.col(text_col).cast("string"), 256)
    return (
        docs.withColumn("content_hash", h)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["content_hash"])
    )


def streaming_neardup_minhash(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
    n_hashes: int = 32,
    shingle_words: int = 3,
    id_col: str | None = None,
) -> DataFrame:
    """Streaming NEAR-dup suppression: first doc per full MinHash
    signature wins.

    The streaming face of the batch MinHash pass (operators/dedup):
    the signature is computed with the same portable polynomial
    family (so batch and stream agree bit-for-bit), serialized to one
    key, and deduplicated with ``dropDuplicatesWithinWatermark``.
    Keying on the FULL signature keeps only extremely-near duplicates
    (all n_hashes slots agree — boilerplate, mirrored posts, trivial
    rewraps), the right precision/state trade for an inline
    continuous feed: one state row per distinct signature, eviction
    watermark-bounded, no candidate-pair join in the hot path. Banded
    LSH recall (partial-overlap pairs) stays in the batch/backfill
    pass — a streaming band join would multiply state by ``bands``
    and need a second stateful stage.

    Documents too short to shingle (< shingle_words tokens) fall back
    to exact content-hash dedup. NULL text gets a per-row UNIQUE key
    (``'__null:' + id_col``, or a uuid when no id column is given) and
    passes through undeduplicated — sha2(NULL) is NULL, and
    dropDuplicatesWithinWatermark treats NULL keys as equal, which
    would silently swallow every null-text document after the first.
    The repartition barriers mirror the batch with_minhash: without
    them CollapseProject re-derives the gram-hash array once per
    signature slot (the measured 10x blowup); both are plain
    Exchanges, legal in streaming plans.
    """
    from ..functions import portable as PT
    from ..session import barrier

    staged = barrier(
        barrier(docs)
        .withColumn("_tokens", F.expr(PT.tokens(text_col, PT.SPARK)))
        .withColumn("_tok_hashes", F.expr(PT.hash_array("_tokens", PT.SPARK)))
        .withColumn(
            "_gram_hashes",
            F.expr(PT.word_ngram_hashes("_tok_hashes", shingle_words, PT.SPARK)),
        )
    )
    sig_csv = F.expr(
        "array_join(transform("
        + PT.minhash_from_hashes("_gram_hashes", n_hashes, PT.SPARK)
        + ", x -> CAST(x AS STRING)), ',')"
    )
    null_key = (
        F.concat(F.lit("__null:"), F.col(id_col).cast("string"))
        if id_col is not None
        else F.concat(F.lit("__null:"), F.expr("uuid()"))
    )
    key = (
        F.when(F.col(text_col).isNull(), null_key)
        .when(F.size("_gram_hashes") > 0, sig_csv)
        .otherwise(F.sha2(F.col(text_col).cast("string"), 256))
    )
    return (
        staged.withColumn("_dedup_key", key)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["_dedup_key"])
        .drop("_tokens", "_tok_hashes", "_gram_hashes", "_dedup_key")
    )


def start_cms_stream(
    spark: SparkSession,
    text_stream: DataFrame,
    state: dict,
    checkpoint_dir: str,
    d: int = 3,
    width: int = 256,
    text_col: str = "text",
):
    """Streaming count-min sketch maintenance: each micro-batch builds
    its own bounded d x width sketch (operators/sketches.cms_build)
    and merges it into the standing sketch by plain counter addition —
    the CMS mergeability law (pinned in tests/test_pretrain_ops.py),
    which is exactly why this is THE streaming frequency structure.
    State stays <= d*width rows forever, regardless of stream volume;
    in a deployment the standing sketch is a Delta table and the merge
    is an idempotent MERGE keyed on (h_idx, bucket).
    """
    from ..functions import portable as PT
    from ..operators.sketches import cms_build

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        items = batch_df.select(
            F.explode(F.expr(PT.tokens(text_col, PT.SPARK))).alias("tok")
        )
        delta = cms_build(items, "tok", d=d, width=width)
        prev = state.get("sketch")
        merged = delta if prev is None else (
            prev.unionAll(delta)
            .groupBy("h_idx", "bucket")
            .agg(F.sum("cnt").alias("cnt"))
        )
        state["sketch"] = merged.localCheckpoint(eager=True)

    return (
        text_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stateful_wallet_balance(events: DataFrame) -> DataFrame:
    """The clamped-wallet recurrence (operators/recurrence.
    clamped_running_balance) as a STREAMING operator on the Spark 4
    ``transformWithStateInPandas`` API — typed, state-store-backed
    ValueState instead of applyInPandasWithState's single implicit
    tuple (the successor API: multiple named states, timers, TTL).

    State per user = (bal, n_clamps, n_steps); each micro-batch walks
    its rows in (ts, event_id) order continuing from stored state and
    emits the cumulative triple, so the latest emit per user equals
    the batch walk over the full event log — the
    exactly-once-state-continuation contract the test asserts across
    two time-ordered micro-batches.  delta = +cents on purchase,
    -cents on error, 0 otherwise (the batch query's mapping).

    Requires the RocksDB state store provider (transformWithState's
    backing store); the caller sets
    ``spark.sql.streaming.stateStore.providerClass``.  ENVIRONMENT
    NOTE: the TWS Python worker speaks protobuf to the JVM; this
    image ships google.protobuf broken, so the cross-batch test
    (tests/test_streaming.py) import-gates and skips here — the
    applyInPandasWithState twin (stateful_sessionize) carries the
    verified stateful-streaming contract in this image.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class WalletProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "wallet", "bal bigint, n_clamps bigint, n_steps bigint"
            )

        def handleInputRows(self, key, rows, timer_values):
            import pandas as pd

            pdf = pd.concat(list(rows))
            if len(pdf) == 0:
                return
            pdf = pdf.sort_values(["ts", "event_id"])
            prior = self._state.get() if self._state.exists() else None
            bal, clamps, steps = prior if prior else (0, 0, 0)
            for d in pdf["delta"]:
                nxt = bal + int(d)
                if nxt < 0:
                    clamps += 1
                    bal = 0
                else:
                    bal = nxt
                steps += 1
            self._state.update((int(bal), int(clamps), int(steps)))
            yield pd.DataFrame(
                [(key[0], int(bal), int(clamps), int(steps))],
                columns=[
                    "user_id",
                    "final_balance",
                    "n_clamps",
                    "n_steps",
                ],
            )

        def close(self) -> None:
            pass

    deltas = events.select(
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
    return deltas.groupBy("user_id").transformWithStateInPandas(
        WalletProcessor(),
        outputStructType=(
            "user_id bigint, final_balance bigint, "
            "n_clamps bigint, n_steps bigint"
        ),
        outputMode="Update",
        timeMode="None",
    )


def stream_to_tlog(
    stream: DataFrame,
    table_path: str,
    checkpoint_dir: str | None = None,
):
    """Exactly-once micro-batch sink into a tlog table: every batch is
    one ``tlog.commit(..., epoch=batch_id)``.  The epoch token makes a
    RETRIED batch a no-op (the log already holds that epoch — see
    operators/tlog.commit), which upgrades foreachBatch's
    at-least-once delivery to exactly-once table contents: the same
    idempotence contract Delta's txn-version-per-stream gives its
    streaming writer, in one manifest line.  Combined with the
    checkpoint (which replays unfinished epochs after a crash), the
    table converges to exactly-once regardless of retries.
    """
    from ..operators import tlog

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        tlog.commit(batch_df, table_path, "append", epoch=int(epoch_id))

    w = stream.writeStream.foreachBatch(_process)
    if checkpoint_dir is not None:
        w = w.option("checkpointLocation", checkpoint_dir)
    return w.trigger(availableNow=True).start()


def stateful_kmv_distinct(events: DataFrame, k: int = 64) -> DataFrame:
    """Custom stateful streaming operator: per-key KMV (bottom-k)
    distinct-count sketch maintained in GroupState across
    micro-batches — the streaming composition of
    operators/sketches.kmv_sketch.

    State per key = the sorted bottom-k distinct uniformized hashes
    seen so far (<= k BIGINTs) plus an emit sequence counter; each
    micro-batch merges the batch's hashes into the state and emits
    (key, seq, n_held, h_k).  The FINAL state per key is recovered as
    the row with the LARGEST seq (``F.max_by(..., "seq")``) — NOT by
    aggregating min/max over the emits: while the sketch is underfull
    (n_held < k) h_k is the max of the held hashes and can move in
    EITHER direction across batches, so min(h_k) over emits can pick
    an early partial maximum and corrupt the estimate by orders of
    magnitude.  The seq-recovered final state equals the batch
    bottom-k over the same rows regardless of how the replay divided
    into micro-batches — the finite-replay equivalence the
    stateful_sessionize operator pins, applied to a sketch.

    At scale: O(k) state per key; the estimator (k-1)*P/h_k (exact
    n_held when n_held < k) is applied AFTER the final per-key
    recovery so the stream only carries exact integers.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdfs, state):
        import pandas as pd

        batch = set()
        for pdf in pdfs:
            batch.update(int(x) for x in pdf["h"])
        if not batch:
            return
        held, seq = (
            (list(state.get[0]), int(state.get[1]))
            if state.exists
            else ([], 0)
        )
        merged = sorted(set(held) | batch)[:k]
        seq += 1
        state.update((merged, seq))
        yield pd.DataFrame(
            [(key[0], seq, len(merged), merged[-1])],
            columns=["key", "seq", "n_held", "h_k"],
        )

    return events.groupBy("key").applyInPandasWithState(
        fn,
        outputStructType="key string, seq bigint, n_held bigint, h_k bigint",
        stateStructType="hashes array<bigint>, seq bigint",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stateful_misra_gries(events: DataFrame, k: int = 8) -> DataFrame:
    """Custom stateful streaming operator: per-key Misra-Gries
    heavy-hitter summary (<= ``k`` counters) maintained in GroupState
    across micro-batches — the streaming composition of the batch MG
    machinery (operators/sketches.misra_gries_shards).

    Unlike the KMV/CMS sketches, MG state is ORDER-SENSITIVE (the
    decrement step depends on arrival order), so determinism is
    engineered explicitly: within each batch invocation the rows are
    replayed in ascending ``event_id`` order (the unique arrival
    proxy), and time-partitioned micro-batches therefore evolve the
    state exactly as a single-pass replay in global event_id order —
    the finite-replay equivalence, for an order-dependent automaton.
    Final state per key = the max-``seq`` emit (the underfull-sketch
    lesson from stateful_kmv_distinct applies verbatim).

    Input columns: key string, event_id bigint, item string.
    Emits (key, seq, items array, counts array); counters are the MG
    lower bounds with the classic n/(k+1) guarantee.  O(k) state per
    key.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdfs, state):
        import pandas as pd

        rows: list[tuple[int, str]] = []
        for pdf in pdfs:
            rows.extend(
                (int(e), str(i)) for e, i in zip(pdf["event_id"], pdf["item"])
            )
        if not rows:
            return
        rows.sort()
        if state.exists:
            items, counts, seq = (
                list(state.get[0]),
                [int(c) for c in state.get[1]],
                int(state.get[2]),
            )
        else:
            items, counts, seq = [], [], 0
        ctr = dict(zip(items, counts))
        for _eid, it in rows:
            if it in ctr:
                ctr[it] += 1
            elif len(ctr) < k:
                ctr[it] = 1
            else:
                dead = []
                for existing in ctr:
                    ctr[existing] -= 1
                    if ctr[existing] == 0:
                        dead.append(existing)
                for d in dead:
                    del ctr[d]
        seq += 1
        its = sorted(ctr)
        state.update((its, [ctr[i] for i in its], seq))
        yield pd.DataFrame(
            [(key[0], seq, its, [ctr[i] for i in its])],
            columns=["key", "seq", "items", "counts"],
        )

    return events.groupBy("key").applyInPandasWithState(
        fn,
        outputStructType=(
            "key string, seq bigint, items array<string>, "
            "counts array<bigint>"
        ),
        stateStructType=(
            "items array<string>, counts array<bigint>, seq bigint"
        ),
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
