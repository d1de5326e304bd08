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
    """Deterministic dense ids start_at, start_at+1, ... by order_col."""
    w = Window.orderBy(order_col)
    return new_rows.withColumn(id_col, (F.row_number().over(w) + F.lit(start_at - 1)).cast("long"))


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
