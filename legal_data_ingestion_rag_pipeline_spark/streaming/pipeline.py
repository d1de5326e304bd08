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

    return (
        raw_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


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
