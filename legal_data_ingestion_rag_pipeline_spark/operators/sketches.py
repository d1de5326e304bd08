"""Count-min sketch: fixed-size frequency summaries for heavy-hitter
mining over unbounded token streams.

At 100 TB a full token->count table is itself huge (the long tail of a
web corpus is billions of distinct tokens); a CMS compresses it to
d x width counters with a one-sided error guarantee:

    true_count <= estimate <= true_count + eps * total_tokens

with eps = e/width at failure probability e^-d.  The sketch is built
with ONE aggregation whose key space is exactly d*width rows — the
shuffle volume is capped by the sketch size, not the corpus — and it
merges across partitions/days by plain counter addition, which is why
this is the standard streaming-frequency structure.

Hashing uses the portable universal family (functions/portable.py:
h_i(x) = (a_i * poly_hash(x) + b_i) mod P, bucket = h_i mod width), so
a DuckDB oracle reproduces the sketch bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions import portable as PT


def _bucket_cols(base_hash: F.Column, d: int, width: int) -> list[F.Column]:
    consts = PT._perm_constants(d)
    return [
        (((base_hash * a + b) % PT.P) % width).cast("bigint")
        for (a, b) in consts[:d]
    ]


def cms_build(
    items: DataFrame,
    key_col: str,
    d: int = 3,
    width: int = 256,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the sketch: (h_idx, bucket, cnt), one row per non-empty
    counter.  One map-side explode (d rows per item) and one shuffle
    on (h_idx, bucket) — at most d*width groups regardless of corpus
    size, so the reduce side is constant-bounded.

    ``weight_col``: build from PRE-AGGREGATED (key, count) rows
    instead of raw items — counters are identical (sum of per-key
    counts == row count), but the build input is vocabulary-scale.
    Use it whenever an exact key aggregate already exists in the
    plan; raw streams keep the unweighted path."""
    base = F.expr(PT.poly_hash(key_col, PT.SPARK))
    buckets = F.array(*_bucket_cols(base, d, width))
    w = (
        F.col(weight_col).cast("bigint")
        if weight_col is not None
        else F.lit(1).cast("bigint")
    )
    return (
        # NULL keys hash to NULL buckets and would accumulate phantom
        # (h_idx, NULL) counters — exclude them, matching the exact
        # count semantics where COUNT(col) skips NULLs
        items.filter(F.col(key_col).isNotNull())
        .select(w.alias("_w"), F.posexplode(buckets).alias("h_idx", "bucket"))
        .groupBy("h_idx", "bucket")
        .agg(F.sum("_w").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame, keys: DataFrame, key_col: str, d: int = 3, width: int = 256
) -> DataFrame:
    """Point-estimate each key: min over the d counters it hashes to.
    The sketch side is at most d*width rows — always broadcast — so
    estimation never shuffles the key set.  Buckets the sketch never
    saw count as 0 (the true CMS semantics: absent counter = 0).
    NULL keys are excluded, mirroring cms_build — they hash to NULL
    buckets, which posexplode would silently drop; filtering keeps the
    two halves of the API symmetric (a key the build ignored is a key
    estimation refuses rather than answering est=0 for)."""
    base = F.expr(PT.poly_hash(key_col, PT.SPARK))
    buckets = F.array(*_bucket_cols(base, d, width))
    keys = keys.filter(F.col(key_col).isNotNull())
    exploded = keys.select(
        key_col, F.posexplode(buckets).alias("h_idx", "bucket")
    )
    joined = exploded.join(F.broadcast(sketch), ["h_idx", "bucket"], "left")
    return (
        joined.groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def bucket_exprs_sql(
    hash_expr: str, d: int, width: int
) -> list[str]:
    """The d bucket expressions over a precomputed base-hash SQL
    expression — shared by the Spark plan and the DuckDB oracle so the
    sketch layout is identical on both engines."""
    return [
        f"((({hash_expr}) * {a} + {b}) % {PT.P}) % {width}"
        for (a, b) in PT._perm_constants(d)[:d]
    ]


def histogram_build(
    items: DataFrame, col: str, lo: Column | float, hi: Column | float, n_bins: int = 256
) -> DataFrame:
    """Equi-width histogram sketch: (bin, cnt), at most ``n_bins``
    rows regardless of input size.  Like the CMS it merges across
    partitions/days by plain counter addition, and the quantile
    estimates it yields carry a hard error bound of one bin width —
    a DETERMINISTIC alternative to t-digest/GK sketches, whose
    merge-order-dependent centroids cannot be hash-checked across
    engines.  ``lo``/``hi`` may be literals or 1-row aggregate
    columns (cross-joined broadcast upstream)."""
    lo_c = lo if isinstance(lo, Column) else F.lit(float(lo))
    hi_c = hi if isinstance(hi, Column) else F.lit(float(hi))
    x = F.col(col).cast("double")
    span = hi_c - lo_c
    # span == 0 (constant column) would raise under ANSI division —
    # every value belongs to bin 0 in that case
    raw = F.when(
        span > 0, F.floor((x - lo_c) / span * n_bins).cast("bigint")
    ).otherwise(F.lit(0).cast("bigint"))
    bin_ = F.coalesce(
        F.least(F.lit(n_bins - 1).cast("bigint"), F.greatest(F.lit(0).cast("bigint"), raw)),
        F.lit(0).cast("bigint"),
    )
    return (
        items.filter(x.isNotNull())
        .select(bin_.alias("bin"))
        .groupBy("bin")
        .agg(F.count("*").alias("cnt"))
    )


def histogram_quantiles(
    hist: DataFrame, qs: list[float], lo: Column | float, hi: Column | float, n_bins: int = 256
) -> DataFrame:
    """Quantile estimates from the histogram: for each q, the upper
    edge of the first bin whose cumulative count reaches q * total.
    The window/cumsum runs over <= n_bins rows (never the data), so
    this is driver-cheap at any corpus size.  Output (q, estimate,
    max_err) where max_err is the one-bin-width guarantee."""
    from pyspark.sql import Window

    lo_c = lo if isinstance(lo, Column) else F.lit(float(lo))
    hi_c = hi if isinstance(hi, Column) else F.lit(float(hi))
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "bin",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(
            Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("total"),
    )
    q_rows = F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q")
    crossed = cum.select("*", q_rows).filter(
        F.col("cum") >= F.col("q") * F.col("total")
    )
    width = (hi_c - lo_c) / n_bins
    return (
        crossed.groupBy("q")
        .agg(F.min("bin").alias("_bin"))
        .select(
            "q",
            (lo_c + (F.col("_bin") + 1) * width).cast("double").alias("estimate"),
            width.cast("double").alias("max_err"),
        )
        .orderBy("q")
    )


# ---------------------------------------------------------------------------
# Bloom filter: set-membership summaries for map-side decontamination
# ---------------------------------------------------------------------------
#
# The set-membership complement of the CMS: at 100 TB the benchmark
# n-gram blacklist (decontamination, Brown et al. 2020 App. C) is
# millions of grams, but its Bloom bitmap is a few KB-MB of BIGINT
# words — always broadcastable, so the corpus-side probe is pure
# map-side codegen (no shuffle of the fact table, ever).  One-sided
# error: present grams ALWAYS hit (no false negatives — the property
# decontamination requires); false positives occur at a deterministic,
# oracle-reproducible set of positions since the hash family is the
# portable polynomial one.  Bitmaps merge across batches/days by
# plain bit_or, like CMS counters merge by addition.
#
# Words carry 63 usable bits, not 64: DuckDB raises on CAST(1 AS
# BIGINT) << 63 (signed overflow) while Spark wraps, so the portable
# mask family stops at bit 62.

BLOOM_BITS_PER_WORD = 63


def _bloom_pos_cols(hash_col: str, k: int, m_words: int) -> list[F.Column]:
    m = m_words * BLOOM_BITS_PER_WORD
    consts = PT._perm_constants(k)
    base = F.col(hash_col)
    return [(((base * a + b) % PT.P) % m).cast("bigint") for (a, b) in consts[:k]]


def bloom_build(
    items: DataFrame, hash_col: str, k: int = 4, m_words: int = 64
) -> DataFrame:
    """Build the bitmap: (word_idx, word) rows, word = bit_or of
    1 << (pos % 63) for every key's k positions.  One shuffle bounded
    by ``m_words`` groups regardless of input size; NULL hashes are
    excluded (cms_build convention)."""
    positions = F.array(*_bloom_pos_cols(hash_col, k, m_words))
    return (
        items.filter(F.col(hash_col).isNotNull())
        .select(F.explode(positions).alias("pos"))
        .select(
            (F.col("pos") / BLOOM_BITS_PER_WORD).cast("bigint").alias("word_idx"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {BLOOM_BITS_PER_WORD} AS INT))"
            ).alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(bit)").alias("word"))
    )


def bloom_probe(
    bloom: DataFrame,
    keys: DataFrame,
    hash_col: str,
    k: int = 4,
    m_words: int = 64,
) -> DataFrame:
    """Append ``might_contain`` to ``keys``: true iff all k bits are
    set.  The bitmap (<= m_words rows) broadcasts; the probe is an
    explode to k rows, a broadcast left join on word_idx (absent word
    = all zeros), and a bool_and — the key set never shuffles beyond
    its own k-row explode."""
    positions = F.array(*_bloom_pos_cols(hash_col, k, m_words))
    exploded = keys.filter(F.col(hash_col).isNotNull()).select(
        "*", F.explode(positions).alias("pos")
    )
    checked = (
        exploded.withColumn(
            "word_idx",
            (F.col("pos") / BLOOM_BITS_PER_WORD).cast("bigint"),
        )
        .withColumn(
            "bit",
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {BLOOM_BITS_PER_WORD} AS INT))"
            ),
        )
        .join(F.broadcast(bloom), "word_idx", "left")
        .withColumn(
            "_hit",
            (F.coalesce(F.col("word"), F.lit(0)).bitwiseAND(F.col("bit")) == F.col("bit")),
        )
    )
    group_cols = [c for c in keys.columns]
    return checked.groupBy(*group_cols).agg(
        F.expr("bool_and(_hit)").alias("might_contain")
    )


def bloom_pos_exprs_sql(hash_expr: str, k: int, m_words: int) -> list[str]:
    """Dialect-neutral position expressions for the oracle: arm i is
    ((hash * a_i + b_i) % P) % (m_words * 63)."""
    m = m_words * BLOOM_BITS_PER_WORD
    consts = PT._perm_constants(k)
    return [
        f"((({hash_expr}) * {a} + {b}) % {PT.P}) % {m}" for (a, b) in consts[:k]
    ]
