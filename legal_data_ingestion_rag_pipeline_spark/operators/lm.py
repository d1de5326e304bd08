"""N-gram language-model perplexity scoring for corpus filtering.

The CCNet/Gopher quality signal the classifier family doesn't cover:
score each document by the cross-entropy of its word bigrams under an
add-one-smoothed bigram LM — documents whose text is "surprising" to
a reference corpus (boilerplate soup, lists, OCR noise) score high
and get filtered.  Here the LM is trained on the corpus itself; in
production you pass counts built from a trusted reference corpus
(Wikipedia is the CCNet choice) through the same API.

Spark-first shape, 100 TB-safe:

- LM training is two aggregations over exploded tokens/bigrams —
  the same single-pass vocabulary build as BPE's word_frequencies;
  the model tables are vocabulary-scale, never corpus-scale;
- scoring joins each document's bigrams to the LM on the uniform
  bigram key (ONE shuffle join) with a unigram-keyed fallback join
  for unseen bigrams, then one per-doc aggregation;
- determinism: per-bigram -ln p is snapped to integer MICRO-units
  (floor(x*1e6 + 0.5), the operators/fts.py BM25 convention) and
  summed as BIGINT, so the per-doc score is order-independent and
  bit-identical across engines; the published average is integer
  division (micro-units), exact on both.

p(w2|w1) = (c(w1 w2) + 1) / (c(w1) + V)   — add-one smoothing,
all-integer numerator/denominator, so the double input to ln() is the
same IEEE value on both engines.

The interpolated KNESER-NEY variant (train_kneser_ney_lm /
kneser_ney_score) replaces add-one with absolute discounting plus a
continuation-probability backoff — the smoothing that actually wins
for text (Chen & Goodman 1998):

    P_KN(w2|w1) = max(c(w1 w2) - D, 0) / c(w1 .)
                + D * N1+(w1,.) / c(w1 .) * N1+(.,w2) / B

with discount D = 3/4 kept RATIONAL so the whole probability is one
ratio of exact BIGINTs:

    P_KN = (max(4*c2 - 3, 0) * B + 3 * n1p_fw * ncont)
           / (4 * c1w * B)

where c1w = sum_w2 c(w1 w2), n1p_fw = |{w2 : c(w1 w2) > 0}|,
ncont = |{w1 : c(w1 w2) > 0}| (the continuation count — how many
DISTINCT histories a word completes, the Kneser-Ney insight), and
B = total distinct bigram types.  Every model statistic derives from
the bigram-type table alone, so KN training adds only
vocabulary-scale aggregations on top of the bigram count pass — no
extra corpus-scale shuffle.  Exactness bound: the numerator
max(4*c2-3,0)*B must stay below 2^53 for the int→double cast to be
exact (documented; at web scale pass pre-thresholded count tables).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import portable as PT

#: bigram join-key separator (never appears in whitespace tokens)
SEP = "\x01"


def _toks(text_col: str) -> F.Column:
    return F.expr(PT.tokens(text_col, PT.SPARK))


def _bigrams(toks: F.Column) -> F.Column:
    n = F.greatest(F.size(toks) - 1, F.lit(0))
    return F.zip_with(
        F.slice(toks, 1, n),
        F.slice(toks, 2, n),
        lambda a, b: F.concat(a, F.lit(SEP), b),
    )


def train_bigram_lm(
    docs: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame, int]:
    """(unigram_counts, bigram_counts, vocab_size): the one-pass LM
    build.  Returns DataFrames (word, c1) and (bigram, c2) plus the
    distinct-unigram count V (a 1-row scalar collect)."""
    toks = docs.select(_toks(text_col).alias("_t"))
    uni = (
        toks.select(F.explode("_t").alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("c1"))
    )
    bi = (
        toks.select(F.explode(_bigrams(F.col("_t"))).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("c2"))
    )
    v = uni.count()
    return uni, bi, int(v)


def perplexity_score(
    docs: DataFrame,
    uni: DataFrame,
    bi: DataFrame,
    vocab_size: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document bigram cross-entropy in exact micro-units:
    (id, n_bigrams, sum_nlp_micro, avg_nlp_micro).

    Documents with < 2 tokens survive with n_bigrams = 0 and zero
    sums (scoring must never delete documents).  avg is integer
    micro-unit division — exact, order-independent, hash-stable."""
    pairs = docs.select(
        id_col, F.explode_outer(_bigrams(_toks(text_col))).alias("bigram")
    )
    lm_uni = uni.select(
        F.col("word").alias("_w1"), F.col("c1").alias("_c1")
    )
    joined = (
        pairs.withColumn(
            "_w1", F.substring_index(F.col("bigram"), SEP, 1)
        )
        .join(bi, "bigram", "left")
        .join(lm_uni, "_w1", "left")
    )
    p = (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(1)).cast("double") / (
        F.coalesce(F.col("_c1"), F.lit(0)) + F.lit(vocab_size)
    ).cast("double")
    nlp_micro = F.floor(-F.log(p) * F.lit(1000000.0) + F.lit(0.5)).cast(
        "bigint"
    )
    per_row = F.when(F.col("bigram").isNotNull(), nlp_micro).otherwise(
        F.lit(None)
    )
    return (
        joined.select(id_col, per_row.alias("_nlp"))
        .groupBy(id_col)
        .agg(
            F.count("_nlp").alias("n_bigrams"),
            F.coalesce(F.sum("_nlp"), F.lit(0)).alias("sum_nlp_micro"),
        )
        .select(
            id_col,
            "n_bigrams",
            "sum_nlp_micro",
            # integer (DIV) division, not double-then-truncate: exact
            # at any magnitude, same semantics as DuckDB's //
            F.expr("sum_nlp_micro DIV greatest(n_bigrams, 1)").alias(
                "avg_nlp_micro"
            ),
        )
    )


def train_kneser_ney_lm(
    docs: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame, DataFrame, int]:
    """(bigram_counts, w1_stats, w2_stats, n_bigram_types): the
    Kneser-Ney model build.  bigram_counts is (bigram, c2); w1_stats
    is (_w1, c1w, n1p_fw) — per-history total count and distinct-
    follower count; w2_stats is (_w2, ncont) — per-word continuation
    count (distinct histories it completes).  All three derive from
    the bigram-TYPE table, so the only corpus-scale work is the one
    bigram count pass; the model tables are vocabulary-scale."""
    toks = docs.select(_toks(text_col).alias("_t"))
    bi = (
        toks.select(F.explode(_bigrams(F.col("_t"))).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").cast("bigint").alias("c2"))
    )
    w1s = (
        bi.withColumn("_w1", F.substring_index("bigram", SEP, 1))
        .groupBy("_w1")
        .agg(
            F.sum("c2").cast("bigint").alias("c1w"),
            F.count("*").cast("bigint").alias("n1p_fw"),
        )
    )
    w2s = (
        bi.withColumn("_w2", F.substring_index("bigram", SEP, -1))
        .groupBy("_w2")
        .agg(F.count("*").cast("bigint").alias("ncont"))
    )
    b = bi.count()
    return bi, w1s, w2s, int(b)


def kneser_ney_score(
    docs: DataFrame,
    bi: DataFrame,
    w1s: DataFrame,
    w2s: DataFrame,
    n_bigram_types: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document Kneser-Ney cross-entropy in exact micro-units:
    (id, n_bigrams, sum_nlp_micro, avg_nlp_micro) — same output
    contract as perplexity_score.

    P_KN is formed as one ratio of exact BIGINTs (module docstring),
    so the double input to ln() is bit-identical across engines; -ln
    snaps to micro-units before the per-doc sum.  Bigrams whose
    history is unseen by the model (impossible when scoring the
    training corpus; possible on held-out text) contribute no term —
    they are excluded from n_bigrams rather than scored with a
    garbage denominator.  <2-token documents survive with
    n_bigrams = 0 (scoring must never delete documents).

    Implemented as the per-document aggregation of
    :func:`kneser_ney_row_scores` — ONE definition of the P_KN
    formula, so the aggregate and order-statistic consumers (Min-K%%
    Prob) can never drift apart."""
    return (
        kneser_ney_row_scores(
            docs, bi, w1s, w2s, n_bigram_types, text_col, id_col
        )
        .groupBy(id_col)
        .agg(
            F.count("_nlp").alias("n_bigrams"),
            F.coalesce(F.sum("_nlp"), F.lit(0)).alias("sum_nlp_micro"),
        )
        .select(
            id_col,
            "n_bigrams",
            "sum_nlp_micro",
            F.expr("sum_nlp_micro DIV greatest(n_bigrams, 1)").alias(
                "avg_nlp_micro"
            ),
        )
    )


def kneser_ney_row_scores(
    docs: DataFrame,
    bi: DataFrame,
    w1s: DataFrame,
    w2s: DataFrame,
    n_bigram_types: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-BIGRAM Kneser-Ney scores: (id, _nlp) with one non-null row
    per scorable bigram occurrence — the per-row frame
    :func:`kneser_ney_score` aggregates, exposed for order-statistic
    consumers (Min-K%% Prob).  Same exactness contract: P_KN is one
    ratio of exact BIGINTs, -ln snapped to micro per row."""
    pairs = docs.select(
        id_col, F.explode_outer(_bigrams(_toks(text_col))).alias("bigram")
    )
    joined = (
        pairs.withColumn("_w1", F.substring_index("bigram", SEP, 1))
        .withColumn("_w2", F.substring_index("bigram", SEP, -1))
        .join(bi, "bigram", "left")
        .join(w1s, "_w1", "left")
        .join(w2s, "_w2", "left")
    )
    num = (
        F.greatest(F.lit(4) * F.coalesce(F.col("c2"), F.lit(0)) - 3, F.lit(0))
        * F.lit(n_bigram_types)
        + F.lit(3)
        * F.coalesce(F.col("n1p_fw"), F.lit(0))
        * F.coalesce(F.col("ncont"), F.lit(0))
    ).cast("bigint")
    den = (
        F.lit(4) * F.coalesce(F.col("c1w"), F.lit(0)) * F.lit(n_bigram_types)
    ).cast("bigint")
    nlp_micro = F.floor(
        -F.log(num.cast("double") / den.cast("double")) * F.lit(1000000.0)
        + F.lit(0.5)
    ).cast("bigint")
    scorable = (
        F.col("bigram").isNotNull()
        & (F.coalesce(F.col("c1w"), F.lit(0)) > 0)
        & (num > 0)
    )
    return joined.select(
        id_col, F.when(scorable, nlp_micro).otherwise(F.lit(None)).alias("_nlp")
    )
