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
    """Membership column over the DISTINCT non-NULL rows of ``keys``:
    one row per distinct key tuple with ``might_contain`` = true iff
    all k bits are set.  Like :func:`cms_estimate`, this is
    key-domain (not row-aligned) semantics: duplicate input rows
    collapse through the final groupBy and rows with NULL
    ``hash_col`` are excluded (a NULL key has no hash positions) —
    callers needing per-row alignment should left-join this result
    back onto their rows.  The bitmap (<= m_words rows) broadcasts;
    the probe is an explode to k rows, a broadcast left join on
    word_idx (absent word = all zeros), and a bool_and — the key set
    never shuffles beyond its own k-row explode."""
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


# ---------------------------------------------------------------------------
# HyperLogLog: cardinality summaries (the third sketch of the triad)
# ---------------------------------------------------------------------------
#
# CMS answers "how often", Bloom answers "have I seen", HLL answers
# "how many distinct" — the count-distinct that matters at 100 TB
# (distinct URLs, tokens, users) where the exact distinct's shuffle is
# the corpus itself.  The register table is 2^b rows REGARDLESS of
# input size, built in one bounded-key aggregation, and merges across
# batches/days by register-wise MAX (the property that makes HLL the
# streaming/partitioned cardinality structure, Flajolet et al. 2007).
#
# Portability: the hash is the 30-bit portable polynomial, split as
# bucket = h % m and w = h // m (so w < 2^(30-b)); the register is
# rank(w) = leading-zero count + 1 over the (30-b)-bit window,
# computed from length(bin(w)) — a STRING operation both engines
# define identically, no libm.  The estimator folds the registers
# into ONE exact integer S = sum(2^(rank_bits - M_j)) (BIGINT — max
# term 2^rank_bits, m terms), so the only float step is a single
# literal-arithmetic division: bit-reproducible across engines.
# Raw Flajolet estimator, no small/large-range corrections: the gated
# query reports the exact distinct beside it, so the error is visible
# and value-hash-checked rather than patched.

HLL_HASH_BITS = 30  # poly_hash range is [0, P), P ~ 2^30


def hll_register(items: DataFrame, key_col: str, b: int = 8) -> DataFrame:
    """Build the register table: (bucket, max_rank), one row per
    non-empty bucket of m = 2^b.  NULL keys are excluded (cms_build
    convention).  The bucket/rank expressions come from hll_sql_parts
    so the Spark plan and the DuckDB oracle share one formulation."""
    parts = hll_sql_parts(key_col, b, PT.SPARK)
    return (
        items.filter(F.col(key_col).isNotNull())
        .selectExpr(
            f"CAST({parts['bucket']} AS BIGINT) AS bucket",
            f"CAST({parts['rank']} AS BIGINT) AS rank",
        )
        .groupBy("bucket")
        .agg(F.max("rank").alias("max_rank"))
    )


def hll_estimate(registers: DataFrame, b: int = 8) -> DataFrame:
    """Fold the register table into the raw HLL estimate: one row
    (m, n_buckets_used, s_scaled, est_hll).  ``s_scaled`` is the exact
    BIGINT sum of 2^(rank_bits+1 - M_j) over ALL m buckets (empty
    buckets contribute M = 0); the estimate divides it out in one
    literal double expression."""
    m = 1 << b
    rank_bits = HLL_HASH_BITS - b
    shift = rank_bits + 1  # max stored rank, so exponents stay >= 0
    spark = registers.sparkSession
    allb = spark.range(m).select(F.col("id").alias("bucket"))
    filled = allb.join(registers, "bucket", "left").select(
        "bucket", F.coalesce("max_rank", F.lit(0)).alias("mr")
    )
    agg = filled.agg(
        F.count(F.when(F.col("mr") > 0, 1)).cast("bigint").alias("n_buckets_used"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({shift} - mr AS INT))"))
        .cast("bigint")
        .alias("s_scaled"),
    )
    est = f"{hll_coefficient(b)!r} / CAST(s_scaled AS DOUBLE)"
    return agg.select(
        F.lit(m).cast("bigint").alias("m"),
        "n_buckets_used",
        "s_scaled",
        F.expr(PT.round6(est, PT.SPARK)).alias("est_hll"),
    )


def hll_coefficient(b: int) -> float:
    """alpha_m * m^2 * 2^shift, folded to ONE Python float literal
    shared by the Spark plan and the DuckDB oracle.  Folding matters:
    SQL literals like 0.7213 parse as DECIMAL in both engines but
    with DIFFERENT division semantics (measured: the same alpha text
    diverged in the 8th significant digit), so the constant arithmetic
    must not happen engine-side at all — the estimate is then a single
    double division of two identical values."""
    m = 1 << b
    shift = (HLL_HASH_BITS - b) + 1
    alpha = 0.7213 / (1.0 + 1.079 / m)
    # window-bias correction: w is uniform over [0, P/m), not
    # [0, 2^rank_bits) — every dyadic leading-zero probability is
    # inflated by 2^HASH_BITS/P, so the estimate scales back by
    # P/2^HASH_BITS (measured +7.4% bias without it)
    window = PT.P / float(1 << HLL_HASH_BITS)
    return alpha * m * m * float(1 << shift) * window


def hll_sql_parts(key_expr: str, b: int, dialect: str) -> dict[str, str]:
    """Dialect-neutral building blocks for the oracle: bucket, w and
    rank expressions over a key expression.

    The poly hash is finalized with a NON-LINEAR mid-square step,
    h' = (((h*h) % P) * a + c) % P: the geometric rank statistic needs
    uniform high bits, raw poly hashes of short/structured keys (e.g.
    decimal ids) are near-arithmetic progressions there (measured 5x
    underestimates), and affine maps alone preserve AP structure —
    squaring breaks it.  All intermediates stay under 2^60, BIGINT-
    safe in both engines (DuckDB raises on overflow, Spark wraps —
    neither path is reached)."""
    m = 1 << b
    rank_bits = HLL_HASH_BITS - b
    a, c = PT._perm_constants(1)[0]
    h0 = PT.poly_hash(key_expr, dialect)
    h = f"((((({h0}) * ({h0})) % {PT.P}) * {a} + {c}) % {PT.P})"
    bucket = f"(({h}) % {m})"
    w = f"CAST(({h}) / {m} AS BIGINT)" if dialect == PT.SPARK else f"(({h}) // {m})"
    rank = (
        f"CASE WHEN ({w}) = 0 THEN {rank_bits + 1} "
        f"ELSE {rank_bits + 1} - length(bin({w})) END"
    )
    return {"m": str(m), "bucket": bucket, "rank": rank, "shift": str(rank_bits + 1)}


def hll_register_grouped(
    items: DataFrame, group_cols: list[str], key_col: str, b: int = 8
) -> DataFrame:
    """Group-wise HLL registers: (group..., bucket, max_rank) — at
    most 2^b rows PER GROUP whatever the group's size, so per-group
    distinct counts shuffle sketch-sized state, not keys (the
    approx_count_distinct shape, but portable and mergeable across
    batches by max like the global form)."""
    parts = hll_sql_parts(key_col, b, PT.SPARK)
    return (
        items.filter(F.col(key_col).isNotNull())
        .selectExpr(
            *group_cols,
            f"CAST({parts['bucket']} AS BIGINT) AS bucket",
            f"CAST({parts['rank']} AS BIGINT) AS rank",
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rank").alias("max_rank"))
    )


def hll_estimate_grouped(
    registers: DataFrame, group_cols: list[str], b: int = 8
) -> DataFrame:
    """Per-group estimates from grouped registers: (group...,
    n_buckets_used, s_scaled, est_hll).  Empty buckets contribute
    2^shift to the harmonic sum, accounted arithmetically (m minus
    the group's bucket count) instead of materializing a calendar of
    empty registers per group."""
    m = 1 << b
    shift = (HLL_HASH_BITS - b) + 1
    agg = registers.groupBy(*group_cols).agg(
        F.count("*").cast("bigint").alias("n_buckets_used"),
        (
            F.sum(
                F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({shift} - max_rank AS INT))")
            )
            + (F.lit(m) - F.count("*")) * F.lit(1 << shift)
        )
        .cast("bigint")
        .alias("s_scaled"),
    )
    est = f"{hll_coefficient(b)!r} / CAST(s_scaled AS DOUBLE)"
    return agg.select(
        *group_cols,
        "n_buckets_used",
        "s_scaled",
        F.expr(PT.round6(est, PT.SPARK)).alias("est_hll"),
    )


def bloom_bits_literal(bloom: DataFrame, m_words: int) -> list[int]:
    """Collect a built bitmap into a dense word list (driver-side —
    the bitmap is m_words BIGINTs, KB-scale by construction)."""
    got = {int(r.word_idx): int(r.word) for r in bloom.collect()}
    return [got.get(i, 0) for i in range(m_words)]


def bloom_might_contain_sql(
    hash_expr: str, bits: list[int], k: int, dialect: str
) -> str:
    """Pure map-side membership expression over a LITERAL bitmap (the
    folded-model convention of operators/classifier.py): the k bit
    checks AND together in one codegen projection, so a Bloom
    PREFILTER costs zero shuffles on the probed side — bloom_probe's
    DataFrame form, by contrast, reshapes the key set through an
    explode + groupBy and is for producing a membership COLUMN, not
    for prefiltering a fact table."""
    m_words = len(bits)
    m = m_words * BLOOM_BITS_PER_WORD
    consts = PT._perm_constants(k)
    w_lit = ", ".join(f"CAST({w} AS BIGINT)" for w in bits)
    arr = f"array({w_lit})" if dialect == PT.SPARK else f"[{w_lit}]"
    checks = []
    for (a, c) in consts[:k]:
        pos = f"((({hash_expr}) * {a} + {c}) % {PT.P}) % {m}"
        widx = f"CAST(({pos}) / {BLOOM_BITS_PER_WORD} AS BIGINT)"
        if dialect != PT.SPARK:
            widx = f"(({pos}) // {BLOOM_BITS_PER_WORD})"
        mask = (
            f"shiftleft(CAST(1 AS BIGINT), CAST(({pos}) % {BLOOM_BITS_PER_WORD} AS INT))"
            if dialect == PT.SPARK
            else f"(CAST(1 AS BIGINT) << CAST(({pos}) % {BLOOM_BITS_PER_WORD} AS INT))"
        )
        word = (
            PT.element_at_1based(arr, f"({widx}) + 1", dialect)
            if dialect == PT.SPARK
            else f"list_extract({arr}, ({widx}) + 1)"
        )
        checks.append(f"((({word}) & ({mask})) = ({mask}))")
    return "(" + " AND ".join(checks) + ")"


def write_hll_registers(
    items: DataFrame,
    key_col: str,
    path: str,
    b: int = 8,
    mode: str = "overwrite",
) -> None:
    """Append-only HLL register STORE: each batch writes its own
    register table (bucket, max_rank) to ``path``; merging is a
    register-wise max at read time.  Because max is associative and
    commutative, appending a batch IS the sketch update — no standing
    state is read, locked, or rewritten (the write_gram_artifact /
    lsh_band_index discipline applied to the cardinality sketch), and
    any subset of batches can be estimated after the fact.  Each
    batch's file is at most m = 2^b rows regardless of batch size.
    """
    hll_register(items, key_col, b=b).write.mode(mode).parquet(path)


def hll_estimate_from_store(spark, path: str, b: int = 8) -> DataFrame:
    """Fold ALL appended register batches into one estimate: a
    register-wise max (the sketch-merge operation), then the standard
    exact-integer harmonic fold.  Scan cost is (n_batches x m) rows —
    sketch-scale, never corpus-scale."""
    merged = (
        spark.read.parquet(path)
        .groupBy("bucket")
        .agg(F.max("max_rank").alias("max_rank"))
    )
    return hll_estimate(merged, b=b)


def write_histogram(
    items: DataFrame,
    col: str,
    lo: float,
    hi: float,
    path: str,
    n_bins: int = 256,
    mode: str = "overwrite",
) -> None:
    """Append-only histogram STORE: each batch writes its own
    (bin, cnt) table to ``path``; merging is counter ADDITION at read
    time — the additive complement of the HLL store's register-max
    (write_hll_registers).  The bucketing domain [lo, hi) must be
    FIXED across batches (fix it a priori in production — a price
    domain, a latency SLA range); each batch's file is at most
    ``n_bins`` rows regardless of batch size."""
    histogram_build(items, col, lo, hi, n_bins).write.mode(mode).parquet(
        path
    )


def histogram_from_store(spark, path: str) -> DataFrame:
    """Fold ALL appended batches into one histogram: sum counters per
    bin (associative + commutative, so batch order and partitioning
    never matter).  Scan cost is (n_batches x n_bins) rows —
    sketch-scale, never corpus-scale."""
    return (
        spark.read.parquet(path)
        .groupBy("bin")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values / bottom-k "theta") sketch — the order-statistics
# member of the sketch family (Bar-Yossef et al. 2002; Beyer et al. 2007).
# Unlike HLL registers (union-only algebra; intersections via
# inclusion-exclusion, see hll_intersection_estimate), a bottom-k sketch
# is a UNIFORM SAMPLE of the hashed key space, so it estimates ANY set
# expression — intersection, difference, Jaccard — by counting members
# of the union sketch that satisfy the expression.  Mergeable: the union
# of two sketches is the k smallest of their concatenation.
# ---------------------------------------------------------------------------

def kmv_hash_sql(key_expr: str, dialect: str) -> str:
    """Uniformized key hash for order-statistics sketches: the
    portable poly-hash post-mixed by a double Lehmer step
    (x -> x*48271 mod P, twice).  The raw poly-hash of SHORT keys is
    bounded by ~31^len — far from uniform on [0, P) — and KMV's
    (k-1)*P/h_k estimator requires uniformity; two multiplicative
    wraps around the prime modulus spread any short-key range across
    the full space.  Same integer arithmetic in both dialects."""
    from ..functions import portable as PT

    h = PT.poly_hash(key_expr, dialect)
    return f"((({h}) * 48271 % {PT.P}) * 48271 % {PT.P})"


def kmv_sketch(
    items: DataFrame, key_col: str, k: int = 128
) -> DataFrame:
    """(h): the k smallest DISTINCT uniformized-hash values of the
    key column — the bottom-k sketch.  Plan: one distinct shuffle on
    the uniform hash, then a global top-k (TakeOrderedAndProject —
    never a full sort); the result is k rows, broadcastable
    everywhere downstream."""
    from ..functions import portable as PT

    h = F.expr(
        kmv_hash_sql(f"CAST({key_col} AS STRING)", PT.SPARK)
    ).alias("h")
    # NULL keys hash to NULL, and the engines DISAGREE on NULL sort
    # placement (Spark NULLS FIRST asc, DuckDB NULLS LAST) — exclude
    # them, matching COUNT(col)'s NULL-skipping semantics
    return (
        items.filter(F.col(key_col).isNotNull())
        .select(h)
        .distinct()
        .orderBy("h")
        .limit(k)
    )


def kmv_set_stats(
    sa: DataFrame, sb: DataFrame, k: int = 128
) -> DataFrame:
    """One row of KMV set-expression estimates from two bottom-k
    sketches: the union sketch's k-th minimum drives the distinct
    estimate (k-1)*P/h_k, and membership counts inside the union
    sketch drive Jaccard / intersection / difference — each final
    number ONE snapped double division of exact integers.

    Underfull branch (round-12 advice): when the union sketch holds
    n_held < k rows, BOTH input sketches were complete sets (a KMV
    sketch with fewer than k entries IS its set), so the estimator
    switches to exact counts — est_union = n_held, est_a_only =
    n_a_only — and every ratio divides by n_held, not the nominal k
    (which equals n_held exactly when the sketch is full, so the full
    branch is unchanged).  Mirrors kmv_estimate_from_store's exact
    branch."""
    from ..functions import portable as PT

    u = sa.unionByName(sb).distinct().orderBy("h").limit(k)
    flags = (
        u.join(sa.withColumn("_a", F.lit(1)), "h", "left")
        .join(sb.withColumn("_b", F.lit(1)), "h", "left")
        .select(
            "h",
            F.coalesce("_a", F.lit(0)).alias("in_a"),
            F.coalesce("_b", F.lit(0)).alias("in_b"),
        )
    )
    return flags.agg(
        F.lit(k).cast("bigint").alias("k"),
        F.count("*").cast("bigint").alias("n_held"),
        F.max("h").cast("bigint").alias("h_k"),
        F.sum(
            F.when((F.col("in_a") == 1) & (F.col("in_b") == 1), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_both"),
        F.sum(
            F.when((F.col("in_a") == 1) & (F.col("in_b") == 0), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_a_only"),
    ).select(
        "k",
        "h_k",
        F.expr(
            f"CAST(CASE WHEN n_held < {k} THEN n_held"
            f" ELSE FLOOR(({k} - 1) * {PT.P}.0 / h_k + 0.5) END AS BIGINT)"
        ).alias("est_union"),
        F.expr(
            "CAST(FLOOR(n_both * 1000000.0 / n_held + 0.5) AS BIGINT)"
        ).alias("jaccard_micro"),
        F.expr(
            f"CAST(CASE WHEN n_held < {k} THEN n_a_only"
            f" ELSE FLOOR(CAST(FLOOR(({k} - 1) * {PT.P}.0 / h_k + 0.5)"
            f" AS DOUBLE) * n_a_only / {k} + 0.5) END AS BIGINT)"
        ).alias("est_a_only"),
    )


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters — the DETERMINISTIC-guarantee frequency
# summary (Misra & Gries 1982; mergeability per Agarwal et al. 2012,
# "Mergeable Summaries").  CMS (above) gives probabilistic
# overestimates; an MG summary with k counters guarantees every item
# with frequency > n/(k+1) survives and undercounts by at most the
# total decrement — a guarantee class a curation pipeline can act on
# without a confidence parameter.
# ---------------------------------------------------------------------------

def misra_gries_py(
    stream: list[str], k: int
) -> dict[str, int]:
    """Reference MG pass: k counters, decrement-all on overflow."""
    c: dict[str, int] = {}
    for x in stream:
        if x in c:
            c[x] += 1
        elif len(c) < k:
            c[x] = 1
        else:
            dead = []
            for key in c:
                c[key] -= 1
                if c[key] == 0:
                    dead.append(key)
            for key in dead:
                del c[key]
    return c


def misra_gries_shards(
    items: DataFrame,
    key_col: str,
    order_cols: list[str],
    k: int = 32,
    n_shards: int = 8,
) -> DataFrame:
    """(shard, item, cnt): per-shard MG summaries.  Items shard BY KEY
    (pmod of the portable poly-hash), so every occurrence of a word
    lands in one shard and the shard summaries cover disjoint item
    sets — the trivially-mergeable decomposition; within a shard the
    stream replays in the deterministic ``order_cols`` order (MG
    counters are order-sensitive, so determinism requires a total
    order — the sequence-packing convention).  One grouped Arrow pass
    (FlatMapGroupsInPandas), O(k) state per shard."""
    from ..functions import portable as PT

    sharded = items.filter(F.col(key_col).isNotNull()).select(
        F.col(key_col).alias("item"),
        *[F.col(c) for c in order_cols],
        F.pmod(
            F.expr(PT.poly_hash(key_col, PT.SPARK)), F.lit(n_shards)
        ).cast("bigint").alias("shard"),
    )

    def _mg(pdf):
        import pandas as pd

        pdf = pdf.sort_values(order_cols, kind="mergesort")
        c = misra_gries_py(list(pdf["item"]), k)
        return pd.DataFrame(
            {
                "shard": pdf["shard"].iloc[0],
                "item": list(c),
                "cnt": [c[i] for i in c],
            }
        )

    return sharded.groupBy("shard").applyInPandas(
        _mg, "shard bigint, item string, cnt bigint"
    )


def misra_gries_merge_py(
    counters: list[tuple[str, int]], k: int
) -> dict[str, int]:
    """Prune a union of disjoint-item summaries back to k counters:
    keep the k largest after subtracting the (k+1)-th value
    (Agarwal et al. 2012), ties on item ASC."""
    if len(counters) <= k:
        return dict(counters)
    ranked = sorted(counters, key=lambda t: (-t[1], t[0]))
    cut = ranked[k][1]
    out = {}
    for item, cnt in ranked[:k]:
        if cnt - cut > 0:
            out[item] = cnt - cut
    return out


def write_kmv_sketch(
    items: DataFrame,
    key_col: str,
    path: str,
    k: int = 128,
    mode: str = "append",
) -> None:
    """Persist one batch's bottom-k sketch rows (h) to the standing
    store.  Appending IS the incremental update: KMV merge is
    bottom-k of the union (associative + commutative), so read-time
    folding of all batches equals the single-pass full build."""
    kmv_sketch(items, key_col, k).write.mode(mode).parquet(path)


def kmv_estimate_from_store(spark, path: str, k: int = 128) -> DataFrame:
    """Fold ALL stored batches: distinct union, bottom-k, then the
    (k-1)*P/h_k estimator (exact count when fewer than k hashes).
    One row: (n_held, h_k, est_distinct)."""
    from ..functions import portable as PT

    merged = (
        spark.read.parquet(path).distinct().orderBy("h").limit(k)
    )
    return merged.agg(
        F.count("*").cast("bigint").alias("n_held"),
        F.max("h").cast("bigint").alias("h_k"),
    ).select(
        "n_held",
        "h_k",
        F.expr(
            f"CAST(CASE WHEN n_held < {k} THEN n_held"
            f" ELSE FLOOR(({k} - 1) * {PT.P}.0 / h_k + 0.5)"
            f" END AS BIGINT)"
        ).alias("est_distinct"),
    )
