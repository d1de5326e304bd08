"""MERGE-style upsert on plain parquet (SURVEY S3, §4#2).

Delta's MERGE INTO is the first choice on a real deployment; the v1
image has no Delta jars, so this implements the documented fallback:
key-join the batch against the target, classify insert/update, and
produce the new table plus the reference's insert/update metrics
(which Postgres derived from xmax=0, ingest.py:611-644).

Last-writer-wins *within* a batch is resolved first via a sequence
column (the reference processes file order row-by-row; duplicate
case_number within one file ends as an update with the last payload).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window, functions as F


@dataclass
class MergeResult:
    merged: DataFrame
    n_inserted: int
    n_updated: int


def last_wins(batch: DataFrame, key_cols: list[str], seq_col: str) -> DataFrame:
    """Collapse intra-batch duplicates: highest seq per key survives."""
    w = Window.partitionBy(*key_cols).orderBy(F.desc(seq_col))
    return batch.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def batch_upsert_counts(batch: DataFrame, key_cols: list[str], seq_col: str) -> DataFrame:
    """Reference counting quirk: the FIRST occurrence of a key in the
    file counts as insert, every later one as update (ingest.py:618-644).
    Returns per-key (n_occurrences) so callers derive
    inserted = #keys-new-to-target, updated = #rows - inserted."""
    return batch.groupBy(*key_cols).agg(F.count(seq_col).alias("n_occurrences"))


def merge_upsert(
    target: DataFrame,
    batch: DataFrame,
    key_cols: list[str],
    seq_col: str,
    touch_col: str | None = "updated_at",
) -> MergeResult:
    """Upsert batch into target; returns merged table + metrics.

    Plan shape: one shuffle of each side on the key (sort-merge or
    broadcast if the batch is small — Catalyst/AQE decide), no driver
    loop. With Delta available the same call maps 1:1 onto MERGE INTO
    whenMatchedUpdate/whenNotMatchedInsert and the metrics come from
    operationMetrics instead of the two counts here.
    """
    deduped = last_wins(batch, key_cols, seq_col).drop(seq_col)
    if touch_col and touch_col in deduped.columns:
        deduped = deduped.withColumn(touch_col, F.current_timestamp())

    existing_keys = target.select(*key_cols)
    n_updated = deduped.join(existing_keys, key_cols, "left_semi").count()
    n_inserted = deduped.count() - n_updated

    kept = target.join(deduped.select(*key_cols), key_cols, "left_anti")
    merged = kept.unionByName(deduped, allowMissingColumns=True)
    return MergeResult(merged=merged, n_inserted=n_inserted, n_updated=n_updated)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Table-version diff (the CDC feed a lakehouse derives between
    two snapshots — what Delta's CHANGE DATA FEED materializes):
    returns (key_cols..., change) with change in
    ('insert', 'delete', 'update'); unchanged rows are dropped.

    Row identity on the keys, row content on
    sha2(concat_ws(0x01, compare_cols)) computed MAP-SIDE on each
    snapshot, so the full outer join shuffles (key, 64-char hash) —
    never the payload (the operators/dedup.py hashed-key
    convention).  One key shuffle per side; at 100 TB both snapshots
    of the same table share layout, so bucketed/partitioned stores
    make the join co-located.  NULL-safe: concat_ws SKIPS null slots
    (("a", NULL, "b") and ("a", "b", NULL) would collide), so each
    compare column coalesces to an out-of-band sentinel first — NULL
    vs NULL is unchanged, NULL vs '' is an update.
    """
    def hashed(df: DataFrame, tag: str) -> DataFrame:
        h = F.sha2(
            F.concat_ws(
                "\x01",
                *[
                    F.coalesce(F.col(c).cast("string"), F.lit("\x02"))
                    for c in compare_cols
                ],
            ),
            256,
        )
        return df.select(*key_cols, h.alias(tag))

    o = hashed(old, "_h_old")
    n = hashed(new, "_h_new")
    joined = o.join(n, key_cols, "full_outer")
    change = (
        F.when(F.col("_h_old").isNull(), F.lit("insert"))
        .when(F.col("_h_new").isNull(), F.lit("delete"))
        .when(~F.col("_h_old").eqNullSafe(F.col("_h_new")), F.lit("update"))
    )
    return (
        joined.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(*key_cols, "change")
    )


def scd2_history(
    obs: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from an observation
    log: collapse consecutive equal values per key into versioned
    intervals (key..., version, value, valid_from, valid_to,
    n_events, is_current) — the standard warehouse dimension-history
    build (Kimball SCD2), and the batch form of the reference's
    updated_at versioning.

    Runs-of-equal detection is lag + null-safe inequality, version
    ids are a running sum, interval closing is lead(valid_from) — all
    inside windows partitioned by the dimension key, so state is
    bounded per key and the only shuffle is the key hash partition.
    The (ts, tiebreak...) chain must be total per key for
    deterministic output; pass tiebreak_cols when ts alone can tie
    (the l_linenumber lesson). NULL values are versions too: NULL ->
    NULL is unchanged, NULL -> 'x' opens a new version (eqNullSafe,
    IS DISTINCT FROM in the oracle).
    """
    order = [F.col(ts_col), *[F.col(c) for c in (tiebreak_cols or [])]]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    prev = F.lag(F.col(value_col)).over(w)
    changed = (
        F.when(F.row_number().over(w) == 1, 1)
        .when(~F.col(value_col).eqNullSafe(prev), 1)
        .otherwise(0)
    )
    run = Window.partitionBy(*key_cols).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    versioned = obs.withColumn("_chg", changed).withColumn(
        "version", F.sum("_chg").over(run).cast("bigint")
    )
    grp = versioned.groupBy(*key_cols, "version").agg(
        F.min(value_col).alias(value_col),
        F.min(ts_col).alias("valid_from"),
        F.count("*").cast("bigint").alias("n_events"),
    )
    w2 = Window.partitionBy(*key_cols).orderBy("version")
    return grp.withColumn("valid_to", F.lead("valid_from").over(w2)).select(
        *key_cols,
        "version",
        value_col,
        "valid_from",
        "valid_to",
        "n_events",
        F.col("valid_to").isNull().alias("is_current"),
    )
