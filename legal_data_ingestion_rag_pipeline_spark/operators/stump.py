"""Histogram-based decision-stump split search — the distributed
split-finding pattern of the gradient-boosting family (LightGBM's
histogram algorithm, XGBoost's approx tree method).

Why histograms: the naive split search sorts the feature and scans
every distinct value — a global sort per feature per node, the
classic scale-killer.  The histogram form needs ONE groupBy over a
CONSTANT number of bins: per-bin (count, positive-count) aggregates
map-side-combine down to <= B rows regardless of corpus size, the
cumulative left/right statistics are a window over the B-row
histogram (bin-bounded, never corpus-bounded — the operators/ranks.py
band argument), and the impurity scan of the B-1 candidate splits is
driver-trivial.  At 100 TB the only fact-scale work is the single
binning pass, which pipelines into the scan.

Determinism: bins derive from exact integer feature values and the
exact integer (min, max) of the column, so every engine computes the
same bin for every row; impurities are micro-snapped once per
candidate from ratios of exact BIGINT counts (the chi-squared
convention — IEEE double arithmetic on exact-integer inputs is
bit-identical across engines).

No analog in the reference (its scope ends at retrieval); this is the
supervised-selection operator a training-data pipeline uses to learn
quality filters (fasttext-style classifiers, GBDT quality scores).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def histogram_split_search(
    df: DataFrame,
    feature_col: str,
    label_col: str,
    n_bins: int = 64,
) -> DataFrame:
    """Return the Gini-impurity table of every candidate binary split
    of exact-BIGINT ``feature_col`` against 0/1 ``label_col``.

    Output columns (one row per candidate split, i.e. per non-empty
    bin that leaves both sides non-empty):

    - ``split_bin``    — histogram bin b; the split is
                         "feature <= upper edge of b"
    - ``split_upper``  — exact upper-edge feature value of bin b
    - ``n_left / pos_left / n_right / pos_right`` — exact counts
    - ``gini_micro``   — weighted post-split Gini impurity
                         ``(nL*GL + nR*GR)/N`` in micro-units,
                         snapped once per candidate

    The caller picks ``ORDER BY gini_micro, split_bin LIMIT 1`` for
    the stump, or keeps the table for gain diagnostics.
    """
    stats = df.agg(
        F.min(feature_col).cast("bigint").alias("mn"),
        F.max(feature_col).cast("bigint").alias("mx"),
        F.count("*").cast("bigint").alias("n_tot"),
        F.sum(label_col).cast("bigint").alias("pos_tot"),
    )
    binned = df.crossJoin(F.broadcast(stats)).select(
        F.expr(
            f"CAST((({feature_col} - mn) * {n_bins}) DIV (mx - mn + 1)"
            " AS BIGINT)"
        ).alias("bin"),
        F.col(label_col).cast("bigint").alias("y"),
    )
    hist = binned.groupBy("bin").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("pos"),
    )
    # Cumulative left-side stats: a window over <= n_bins rows — bin-
    # bounded, never corpus-bounded (the ranks.py band argument), so
    # the single-partition window is a constant-size step at any scale.
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "bin",
        F.sum("n").over(w).cast("bigint").alias("n_left"),
        F.sum("pos").over(w).cast("bigint").alias("pos_left"),
    )
    return (
        cum.crossJoin(F.broadcast(stats))
        .filter((F.col("n_left") > 0) & (F.col("n_left") < F.col("n_tot")))
        .select(
            F.col("bin").alias("split_bin"),
            F.expr(f"mn + ((bin + 1) * (mx - mn + 1)) DIV {n_bins} - 1")
            .cast("bigint")
            .alias("split_upper"),
            "n_left",
            "pos_left",
            (F.col("n_tot") - F.col("n_left")).alias("n_right"),
            (F.col("pos_tot") - F.col("pos_left")).alias("pos_right"),
            F.expr(
                "CAST(floor((CAST(pos_left AS DOUBLE) * (n_left - pos_left)"
                " / n_left"
                " + CAST(pos_tot - pos_left AS DOUBLE)"
                " * ((n_tot - n_left) - (pos_tot - pos_left))"
                " / (n_tot - n_left))"
                " * 2000000.0 / n_tot + 0.5) AS BIGINT)"
            ).alias("gini_micro"),
        )
    )
