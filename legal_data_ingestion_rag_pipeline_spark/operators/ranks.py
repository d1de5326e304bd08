"""Two-phase global ranks and prefix sums — order statistics without
a global sort.

A global ``row_number() OVER (ORDER BY v)`` or running ``SUM() OVER
(ORDER BY v)`` collapses to ONE task in Spark (an empty-partition
window is a single-partition sort) — the classic scale-killer for
rank statistics (Spearman, Gini, RFM quintiles) and ECDFs (KS).  The
distributed form here is the ``operators/sweep.py`` discipline
applied to value order instead of time order:

1. the caller supplies a BAND column that is monotone non-decreasing
   in the sort order and RANGE-BOUNDED — its distinct count depends
   on the value range and band width, never on the corpus size
   (``cents DIV 100_000`` over a bounded price domain, the same
   argument that makes the sweep's per-day carry calendar-bounded);
2. per-band row counts / partial sums aggregate first (one shuffle on
   the band key);
3. the band-level carry-in offsets come from a window over the BAND
   table — single-partition but band-bounded, never corpus-bounded —
   and broadcast back;
4. in-band ranks / running sums compute in parallel across bands
   (window partitioned by band), and the global value is in-band
   value + carry-in.

Determinism: the in-band order must be TOTAL (value plus an explicit
tie-break chain), so any partitioning yields bit-identical ranks —
the hash-gate requirement.  Oracles deliberately use the plain
single-window SQL formulation: an independent algorithm arriving at
the same ranks is exactly what the gate should prove.

No analog in the reference (its modules — ``ingest.py``, ``rag.py``,
``api.py``, ``data_quality.py`` — compute no rank statistics); this
is the order-statistics layer every experimentation / data-quality
platform needs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def _carry_window(part_cols: Sequence[str], band_col: str):
    if part_cols:
        w = Window.partitionBy(*part_cols).orderBy(band_col)
    else:
        w = Window.orderBy(band_col)
    return w.rowsBetween(Window.unboundedPreceding, -1)


def two_phase_rank(
    df: DataFrame,
    order_cols: Sequence[str | Column],
    band_col: str,
    part_cols: Sequence[str] = (),
    rank_name: str = "rank",
) -> DataFrame:
    """Append 1-based global ``rank_name`` over ``order_cols`` (a
    TOTAL order: include a tie-break key) within each ``part_cols``
    group, computed band-parallel as described in the module
    docstring.  ``band_col`` must be monotone non-decreasing in the
    ``order_cols`` order within every group."""
    counts = df.groupBy(*part_cols, band_col).agg(
        F.count("*").cast("bigint").alias("_bn")
    )
    offsets = counts.select(
        *part_cols,
        band_col,
        F.coalesce(F.sum("_bn").over(_carry_window(part_cols, band_col)), F.lit(0))
        .cast("bigint")
        .alias("_off"),
    )
    w_in = Window.partitionBy(*part_cols, band_col).orderBy(*order_cols)
    return (
        df.join(F.broadcast(offsets), [*part_cols, band_col])
        .withColumn(
            rank_name,
            (F.row_number().over(w_in) + F.col("_off")).cast("bigint"),
        )
        .drop("_off")
    )


def two_phase_prefix_sum(
    df: DataFrame,
    order_cols: Sequence[str | Column],
    band_col: str,
    sum_cols: Sequence[str],
    part_cols: Sequence[str] = (),
    suffix: str = "_run",
) -> DataFrame:
    """Append inclusive running sums ``{c}{suffix}`` of each
    ``sum_cols`` column over the total ``order_cols`` order within
    ``part_cols``, band-parallel.  Same band contract as
    :func:`two_phase_rank`."""
    carries = df.groupBy(*part_cols, band_col).agg(
        *[F.sum(c).cast("bigint").alias(f"_t_{c}") for c in sum_cols]
    )
    w_carry = _carry_window(part_cols, band_col)
    offsets = carries.select(
        *part_cols,
        band_col,
        *[
            F.coalesce(F.sum(f"_t_{c}").over(w_carry), F.lit(0))
            .cast("bigint")
            .alias(f"_o_{c}")
            for c in sum_cols
        ],
    )
    w_in = (
        Window.partitionBy(*part_cols, band_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = df.join(F.broadcast(offsets), [*part_cols, band_col])
    for c in sum_cols:
        out = out.withColumn(
            f"{c}{suffix}",
            (F.sum(c).over(w_in) + F.col(f"_o_{c}")).cast("bigint"),
        )
    return out.drop(*[f"_o_{c}" for c in sum_cols])


def two_phase_prefix_max(
    df: DataFrame,
    order_cols: Sequence[str | Column],
    band_col: str,
    val_col: str,
    part_cols: Sequence[str] = (),
    out_name: str = "prefix_max",
    inclusive: bool = False,
) -> DataFrame:
    """Append the running maximum of ``val_col`` over the total
    ``order_cols`` order within ``part_cols``, band-parallel (same
    band contract as :func:`two_phase_rank`).  ``inclusive=False``
    gives the STRICT-predecessor max (NULL for the first row) — the
    form dominance tests (skyline) and record-breaking queries need.

    Phase 1 computes per-band maxima (one bounded aggregate); phase 2
    turns them into exclusive band carries over the band table (rows
    = #bands); phase 3 combines the in-band running max (window
    partitioned BY BAND — never a global sort) with the carry via
    null-skipping ``greatest``."""
    carries = df.groupBy(*part_cols, band_col).agg(
        F.max(val_col).alias("_bm")
    )
    offsets = carries.select(
        *part_cols,
        band_col,
        F.max("_bm")
        .over(_carry_window(part_cols, band_col))
        .alias("_om"),
    )
    end = 0 if inclusive else -1
    w_in = (
        Window.partitionBy(*part_cols, band_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, end)
    )
    return (
        df.join(F.broadcast(offsets), [*part_cols, band_col])
        .withColumn(
            out_name, F.greatest(F.max(val_col).over(w_in), F.col("_om"))
        )
        .drop("_om")
    )


def quintile_score(rank_col: str, n_col: str) -> Column:
    """Exact-integer quintile score 1..5 from a 1-based rank and the
    group size: ``1 + ((rank-1)*5) DIV n`` — the RFM scoring rule,
    identical under Spark and DuckDB integer division (both operands
    non-negative)."""
    return (
        F.lit(1)
        + F.expr(f"(({rank_col} - 1) * 5) DIV {n_col}")
    ).cast("bigint")


def rbo_weights_p12(k: int, p: float = 0.9) -> list[tuple[int, int]]:
    """Truncated rank-biased-overlap depth weights (Webber, Moffat &
    Zobel 2010): W_d = (1-p) * p^(d-1), pico-snapped ONCE in Python
    and embedded as literals on BOTH engines — the transcendental
    never runs in either plan."""
    import math

    return [
        (d, math.floor((1.0 - p) * p ** (d - 1) * 1e12 + 0.5))
        for d in range(1, k + 1)
    ]


def rbo_truncated(
    a: DataFrame,
    b: DataFrame,
    k: int = 10,
    p: float = 0.9,
    query_col: str = "q_id",
    item_col: str = "vec_id",
    rank_col: str = "rank",
) -> DataFrame:
    """(query, n_common, rbo_p12): truncated RBO between two
    per-query rankings — the top-WEIGHTED rank-similarity metric
    (recall@k counts the sets; RBO also scores WHERE the common items
    sit).  An item in both top-d lists contributes to every depth
    >= max(rank_a, rank_b); per depth, term = FLOOR(W_d * overlap_d
    / d + 0.5) with pico-snapped literal weights, so the score is an
    exact BIGINT sum.  All frames are k-row bounded per query —
    matched pairs x depths is <= k^2 tiny rows."""
    aa = a.select(
        F.col(query_col).alias("q"),
        F.col(item_col).alias("i"),
        F.col(rank_col).cast("bigint").alias("ra"),
    ).filter(F.col("ra") <= k)
    bb = b.select(
        F.col(query_col).alias("q"),
        F.col(item_col).alias("i"),
        F.col(rank_col).cast("bigint").alias("rb"),
    ).filter(F.col("rb") <= k)
    matched = aa.join(bb, ["q", "i"]).select(
        "q", F.greatest("ra", "rb").alias("dmin")
    )
    spark = a.sparkSession
    weights = spark.createDataFrame(
        rbo_weights_p12(k, p), "d: bigint, w_p12: bigint"
    )
    contrib = (
        matched.join(F.broadcast(weights), F.col("dmin") <= F.col("d"))
        .groupBy("q", "d", "w_p12")
        .agg(F.count("*").cast("bigint").alias("ov"))
        .select(
            "q",
            F.expr("CAST(FLOOR(w_p12 * ov / d + 0.5) AS BIGINT)").alias(
                "term"
            ),
            F.when(F.col("d") == k, F.col("ov")).alias("_common"),
        )
    )
    return contrib.groupBy(F.col("q").alias(query_col)).agg(
        F.max("_common").cast("bigint").alias("n_common"),
        F.sum("term").cast("bigint").alias("rbo_p12"),
    )
