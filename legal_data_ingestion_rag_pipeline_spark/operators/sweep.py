"""Sweep-line interval analytics: peak concurrency over (start, end)
intervals via a distributed two-phase prefix sum.

The classic single-machine sweep (sort all +1/-1 change points, walk a
running counter) serializes on one global sort.  The distributed form
used here:

1. change points aggregate per exact timestamp FIRST (one shuffle on a
   near-unique key — removes tie-order ambiguity entirely, because the
   running sum then never depends on the order of equal timestamps);
2. the running sum splits into a per-day window (parallel across days,
   each day's change points sorted independently) plus a day-level
   carry-in offset computed by a window over per-day delta totals —
   that second window is single-partition but CALENDAR-bounded (rows =
   distinct days, the same scale argument as the gap-fill operator),
   never corpus-bounded;
3. the carry table is broadcast back, so the fact-scale side is touched
   by exactly two narrow shuffles (per-ts agg, per-day window) and no
   global sort.

Intervals are half-open [start, end): an interval whose start equals
its end contributes nothing (its +1 and -1 cancel inside the per-ts
aggregation).  Peak is the maximum instantaneous concurrency measured
immediately after each change point — the standard step-function
convention, and the one a plain `SUM() OVER (ORDER BY ts)` oracle
reproduces exactly.

No analog in the reference (its modules — `ingest.py`, `rag.py`,
`api.py`, `data_quality.py` — contain no interval/occupancy query);
this is the scheduling/occupancy shape every large-scale telemetry
pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def concurrency_by_day(
    intervals: DataFrame, start_col: str, end_col: str
) -> DataFrame:
    """Daily peak concurrency over half-open [start_col, end_col)
    timestamp intervals.

    Returns one row per day containing at least one change point:
    ``day``, ``carry_in`` (concurrency entering the day), the day's
    ``peak_concurrent``, and ``n_starts`` (intervals opening that day).
    """
    starts = intervals.select(
        F.col(start_col).alias("ts"), F.lit(1).alias("d")
    )
    ends = intervals.select(F.col(end_col).alias("ts"), F.lit(-1).alias("d"))
    per_ts = (
        starts.unionByName(ends)
        .groupBy("ts")
        .agg(F.sum("d").alias("delta"))
    )

    n_starts = (
        intervals.select(F.to_date(start_col).alias("day"))
        .groupBy("day")
        .agg(F.count("*").cast("bigint").alias("n_starts"))
    )
    daily = finalize_daily_peaks(per_ts)
    return daily.join(n_starts, "day", "left").select(
        "day",
        "carry_in",
        "peak_concurrent",
        F.coalesce("n_starts", F.lit(0)).cast("bigint").alias("n_starts"),
    )


def finalize_daily_peaks(per_ts: DataFrame) -> DataFrame:
    """The batch FINALIZE stage of the sweep: fold a (ts, delta)
    change-point table — however it was produced, one batch pass or a
    streaming pre-aggregate maintained under a watermark — into
    (day, carry_in, peak_concurrent).  This split is the lambda
    shape: the commutative-associative part (summing deltas per
    timestamp) streams incrementally; the order-dependent part (the
    prefix sum) runs here, over the already-shrunk change-point
    table, with the same two-phase day-partitioned discipline.
    """
    per_ts = per_ts.withColumn("day", F.to_date("ts"))

    # Day-level carry: calendar-bounded single-partition window.
    day_tot = per_ts.groupBy("day").agg(F.sum("delta").alias("day_delta"))
    w_days = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    offsets = day_tot.select(
        "day",
        F.coalesce(F.sum("day_delta").over(w_days), F.lit(0))
        .cast("bigint")
        .alias("carry_in"),
    )

    # In-day running sum: parallel across days.
    w_in_day = Window.partitionBy("day").orderBy("ts")
    daily_max = (
        per_ts.withColumn("run_in_day", F.sum("delta").over(w_in_day))
        .groupBy("day")
        .agg(F.max("run_in_day").alias("max_run"))
    )

    return daily_max.join(F.broadcast(offsets), "day").select(
        "day",
        "carry_in",
        (F.col("max_run") + F.col("carry_in"))
        .cast("bigint")
        .alias("peak_concurrent"),
    )


def sessions_from_events(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    gap_us: int = 1_800_000_000,
) -> DataFrame:
    """Gap-rule sessionization into explicit intervals: a new session
    starts when the microsecond gap to the previous event of the same
    user exceeds ``gap_us``.  Microsecond integer arithmetic so every
    engine agrees exactly.  Returns (user, session_no, s, e).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    prev_us = F.lag(F.unix_micros(ts_col)).over(w)
    new_session = F.when(
        prev_us.isNull() | (F.unix_micros(ts_col) - prev_us > gap_us), 1
    ).otherwise(0)
    w_run = (
        Window.partitionBy(user_col)
        .orderBy(ts_col, tiebreak_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        events.withColumn("session_no", F.sum(new_session).over(w_run))
        .groupBy(user_col, "session_no")
        .agg(F.min(ts_col).alias("s"), F.max(ts_col).alias("e"))
    )
