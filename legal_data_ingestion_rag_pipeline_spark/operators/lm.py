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
