"""Top-k and per-group argmax operators (SURVEY O1-O4, A9).

Catalyst plans orderBy+limit as TakeOrderedAndProject — true top-k,
no global sort — so these helpers just standardize deterministic
tie-breaking, the property every oracle comparison depends on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def top_k(df: DataFrame, order: list[Column], k: int) -> DataFrame:
    """orderBy + limit with the caller's (total) ordering chain."""
    return df.orderBy(*order).limit(k)


def argmax_per_group(
    df: DataFrame,
    group_cols: list[str],
    order: list[Column],
    keep_rank_col: str | None = None,
) -> DataFrame:
    """Best row per group under a total ordering (window row_number==1).

    The reference does this in driver-side Python for best-chunk-per-
    case (rag.py:207-224); here it's a single window — shuffle on the
    group key only, linear in data size.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order)
    ranked = df.withColumn("_rn", F.row_number().over(w))
    out = ranked.filter(F.col("_rn") == 1)
    if keep_rank_col:
        return out.withColumnRenamed("_rn", keep_rank_col)
    return out.drop("_rn")
