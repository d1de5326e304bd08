"""Surrogate-key assignment and dimension get-or-create (SURVEY S4, §4#1).

Postgres SERIAL has no Spark analogue; the reference's per-row dict
cache + INSERT RETURNING (ingest.py:418-451 etc.) becomes set-at-a-time:

1. distinct new natural keys = batch anti-join existing dim;
2. assign ids = existing max id + row_number over a deterministic
   order (first-seen sequence when available, else natural key);
3. union with the existing dim; facts then equi-join (broadcast) to
   resolve ids.

Determinism note: row_number over a global order is a single-partition
window — fine for dimension tables (they are small by definition).
Fact-scale id assignment should use monotonically_increasing_id or
zipWithIndex instead; dims here are the dictionary-sized side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def assign_ids(
    new_rows: DataFrame,
    order_col: str,
    id_col: str = "id",
    start_at: int = 1,
) -> DataFrame:
    """Deterministic dense ids start_at, start_at+1, ... by order_col.

    Single-partition global window — ONLY for dictionary-sized inputs
    (dimension tables).  Fact-scale assignment must use
    :func:`assign_ids_ranged`.
    """
    w = Window.orderBy(order_col)
    return new_rows.withColumn(id_col, (F.row_number().over(w) + F.lit(start_at - 1)).cast("long"))


def assign_ids_ranged(
    new_rows: DataFrame,
    order_col: str,
    id_col: str = "id",
    start_at: int = 1,
    bucket_width: int = 1 << 20,
    bucket_counts: list[tuple[int, int]] | None = None,
) -> DataFrame:
    """Dense deterministic ids in `order_col` order WITHOUT a
    single-partition window — the fact-scale recipe.

    `order_col` must be non-negative integral (the ingest `_seq` file
    sequence).  Rows bucket by ``order_col DIV bucket_width`` — an
    order-preserving, data-independent split — then per-bucket counts
    (one tiny row per bucket, collected to the driver exactly like a
    broadcast small side) become cumulative offsets, and the id is
    ``offset + row_number within the bucket``.  The result is
    bit-identical to ``row_number() OVER (ORDER BY order_col)`` but the
    widest window any task evaluates is `bucket_width` rows: 10^10 new
    keys at the default width is ~10^4 buckets, each an independent
    task, instead of one task sorting everything.

    ``bucket_counts``: optional precomputed (bucket, count) rows —
    callers that batch several scalar statistics into one driver
    round-trip (plans/ingest's fused stats job) pass the counts in and
    skip this function's own collect; the rows must be exactly
    ``new_rows.groupBy(order_col DIV bucket_width).count()``.
    """
    bucket = F.expr(f"CAST({order_col} AS BIGINT) DIV {bucket_width}")
    bucketed = new_rows.withColumn("_id_bucket", bucket)
    counts = sorted(
        bucketed.groupBy("_id_bucket").count().collect()
        if bucket_counts is None
        else bucket_counts,
        key=lambda r: r[0],
    )
    offsets, acc = [], 0
    for r in counts:
        offsets.append((int(r[0]), acc))
        acc += r[1]
    spark = new_rows.sparkSession
    off_df = spark.createDataFrame(
        offsets, schema="_id_bucket bigint, _id_offset bigint"
    )
    w = Window.partitionBy("_id_bucket").orderBy(order_col)
    return (
        bucketed.join(F.broadcast(off_df), "_id_bucket")
        .withColumn(
            id_col,
            (F.row_number().over(w) + F.col("_id_offset") + F.lit(start_at - 1)).cast(
                "long"
            ),
        )
        .drop("_id_bucket", "_id_offset")
    )


def get_or_create(
    existing: DataFrame,
    batch_keys: DataFrame,
    natural_key: str,
    id_col: str = "id",
    order_col: str | None = None,
) -> DataFrame:
    """Union of existing dim + newly assigned rows for unseen keys.

    `batch_keys` needs the natural key column (plus any payload columns
    to carry onto new rows). Existing rows keep their ids — re-running
    the same batch is a no-op (idempotent, the reference's cache
    semantics without id churn).
    """
    order_col = order_col or natural_key
    new_keys = batch_keys.dropDuplicates([natural_key]).join(
        existing.select(natural_key), natural_key, "left_anti"
    )
    max_id = (existing.agg(F.max(id_col).alias("m")).collect()[0].m) or 0
    new_rows = assign_ids(new_keys, order_col, id_col, start_at=max_id + 1)
    return existing.unionByName(new_rows, allowMissingColumns=True)
