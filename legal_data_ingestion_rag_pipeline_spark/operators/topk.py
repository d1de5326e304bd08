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


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    salt: int = 8,
) -> DataFrame:
    """Skew-resistant inner equi-join: replicate the small/build side
    ``salt`` times and spread the big side's hot keys across replicas
    with a deterministic per-row salt, so one hot key occupies ``salt``
    reducers instead of one.

    Results are identical to ``big.join(small, big_key == small_key)``
    — salting only changes the shuffle distribution. Use when AQE's
    skew-join split can't help: streaming joins, skew on the FIRST
    shuffle (AQE needs completed map stats), or aggregations keyed on
    the join key downstream.

    The salt on the big side is ``pmod(hash(key, monotonic_id), salt)``
    — deterministic within a run, uniform across replicas.
    """
    exploded = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    salted_big = big.withColumn(
        "_salt",
        F.pmod(F.hash(F.col(big_key), F.monotonically_increasing_id()), F.lit(salt)),
    )
    cond = (salted_big[big_key] == exploded[small_key]) & (
        salted_big["_salt"] == exploded["_salt"]
    )
    return salted_big.join(exploded, cond).drop("_salt")


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


def key_skew_profile(
    df: DataFrame, key_col: str, top: int = 10, salt_threshold_ppm: int = 31250
) -> DataFrame:
    """Join/agg-key skew diagnostic — the decision input for
    :func:`salted_join`: the ``top`` heaviest keys with row counts and
    integer parts-per-million share, plus a ``recommend_salt`` flag
    per key (share above ``salt_threshold_ppm``; the default is
    1/32 of the data ≈ one full shuffle partition at the session's 32
    partitions — a single key owning a whole reducer is exactly the
    straggler salting exists for).

    One aggregation on the key (uniformly shuffled regardless of the
    data's own skew — the count, not the rows, moves), then a global
    top-k over the tiny count table. Shares are exact integer
    arithmetic (ppm = cnt * 1e6 DIV total) so the report hash-gates.
    NULL keys are profiled too — they hash to one reducer like any
    hot key, which is precisely when you want to see them.
    """
    counts = df.groupBy(key_col).agg(F.count("*").alias("key_rows"))
    total = counts.agg(F.sum("key_rows").cast("bigint").alias("_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            key_col,
            "key_rows",
            F.expr("(key_rows * 1000000) DIV _total").alias("share_ppm"),
            F.col("_total").alias("total_rows"),
        )
        .withColumn(
            "recommend_salt", F.col("share_ppm") > F.lit(salt_threshold_ppm)
        )
        .orderBy(F.desc("key_rows"), F.asc_nulls_first(key_col))
        .limit(top)
    )
