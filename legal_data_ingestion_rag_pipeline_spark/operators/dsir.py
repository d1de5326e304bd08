"""DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling") —
Spark-first.

The modern pretraining-data curation move the quality-classifier family
(operators/classifier.py) doesn't cover: instead of a trained
discriminator, estimate importance weights

    w(x) = p_target(x) / p_source(x)

under two hashed bag-of-n-grams unigram models — the target model fit
on a small high-quality corpus (here: a designated source subset of
the documents table), the source model on the raw pool — and keep the
top-weight raw documents.  No training loop, no labels: two count
passes and a scoring pass.

Exactness contract (the Kneser-Ney convention): per-bucket counts are
exact BIGINTs; the smoothed probability ratio

    ((t_c + 1) * (S + NB)) / ((s_c + 1) * (T + NB))

is formed as ONE ratio of exact BIGINT products so the double input to
ln() is bit-identical across engines; -/+ln snaps to micro units
(FLOOR(x*1e6 + 0.5)) per BUCKET, and a document's weight is the exact
BIGINT sum of its token-occurrence bucket scores.  Ties break on
doc_id.  NOTE: the BIGINT products bound corpus size at ~3e9 token
occurrences per side (product < 2^63); beyond that, compute the two
ln() terms separately and add the micro values — same plan shape.

Scale shape (100 TB):
- ONE corpus-scale tokenize/explode pass, immediately collapsed to a
  locally-checkpointed per-document bucket-count frame (<= NB rows
  per doc, far smaller than the token stream; checkpoint blocks are
  GC-cleaned, never CacheManager-pinned); BOTH count models and the
  scoring pass read that frame, so the regex tokenize executes once
  (target membership is a column predicate, not a second scan);
- the (doc, bucket) collapse is the one corpus-scale shuffle
  (map-side partial agg, uniform composite key); the bucket-count
  model on top of it is <= NB rows — KBs;
- the per-bucket log-ratio table is NB rows and BROADCAST to the
  scoring join, so the raw pool is scored map-side;
- the only other shuffles are the per-document weight sum (uniform
  doc_id key) and a column-pruned 2-column pool-id scan; top-k plans
  as TakeOrderedAndProject.

No reference-file citation applies: /root/reference stops at
retrieval; this extends the curation family (SURVEY.md beyond-
reference operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import portable as PT

#: hashed feature-space size (DSIR uses 10k buckets at paper scale;
#: NB=256 keeps every bucket populated at gate scale so the smoothing
#: path and the generic path are both exercised)
N_BUCKETS = 256


def bucket_sql(word_expr: str, dialect: str, n_buckets: int = N_BUCKETS) -> str:
    """Hashed-feature bucket of a token: portable poly hash mod NB —
    identical integer arithmetic in Spark SQL and DuckDB."""
    return f"(({PT.poly_hash(word_expr, dialect)}) % {n_buckets})"


def log_ratio_micro_sql(
    t_c: str, s_c: str, t_tot: str, s_tot: str, n_buckets: int = N_BUCKETS
) -> str:
    """Micro-snapped smoothed log importance ratio of one bucket.
    Identical text works in both dialects (ln/floor/CAST are common);
    inputs are exact-BIGINT column references."""
    num = f"(({t_c}) + 1) * (({s_tot}) + {n_buckets})"
    den = f"(({s_c}) + 1) * (({t_tot}) + {n_buckets})"
    return (
        f"CAST(FLOOR(ln(CAST({num} AS DOUBLE) / CAST({den} AS DOUBLE))"
        f" * 1000000.0 + 0.5) AS BIGINT)"
    )


def dsir_weights(
    docs: DataFrame,
    is_target: F.Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """(id, n_tokens, dsir_weight_micro) for every NON-target document
    (the raw pool DSIR resamples from).  Documents with no tokens
    survive with (0, 0) — selection must never delete candidates."""
    toks = docs.select(
        id_col,
        is_target.alias("_t"),
        F.explode(F.expr(PT.tokens(text_col, PT.SPARK))).alias("word"),
    ).withColumn(
        "_b", F.expr(bucket_sql("word", PT.SPARK, n_buckets))
    )
    # ONE tokenize pass: collapse token occurrences to per-document
    # bucket counts (<= n_buckets rows per doc, far smaller than the
    # exploded token frame) and localCheckpoint THAT — both the
    # bucket-count models and the scoring pass read the materialized
    # blocks, so the expensive regex tokenize/explode runs exactly
    # once.  localCheckpoint (NOT persist): persist pins the frame in
    # the session CacheManager until an explicit unpersist — which no
    # caller of a lazily-returned frame can place — leaking executor
    # storage across a long registry sweep; checkpoint blocks are
    # owned by the RDD and the ContextCleaner drops them when the
    # result frame is garbage collected (round-12 advice).
    doc_bucket = (
        toks.groupBy(id_col, "_t", "_b")
        .agg(F.count("*").cast("bigint").alias("c"))
        .localCheckpoint(eager=True)
    )
    bstats = doc_bucket.groupBy("_b").agg(
        F.sum(F.when(F.col("_t"), F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("t_c"),
        F.sum(F.when(F.col("_t"), 0).otherwise(F.col("c")))
        .cast("bigint")
        .alias("s_c"),
    )
    totals = bstats.agg(
        F.sum("t_c").cast("bigint").alias("t_tot"),
        F.sum("s_c").cast("bigint").alias("s_tot"),
    )
    lr = (
        bstats.crossJoin(F.broadcast(totals))
        .select(
            "_b",
            F.expr(
                log_ratio_micro_sql("t_c", "s_c", "t_tot", "s_tot", n_buckets)
            ).alias("lr_micro"),
        )
    )
    scored = (
        doc_bucket.filter(~F.col("_t"))
        .join(F.broadcast(lr), "_b")
        .groupBy(id_col)
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.sum(F.col("c") * F.col("lr_micro"))
            .cast("bigint")
            .alias("dsir_weight_micro"),
        )
    )
    pool_ids = docs.filter(~is_target).select(id_col)
    return pool_ids.join(scored, id_col, "left").select(
        id_col,
        F.coalesce("n_tokens", F.lit(0)).cast("bigint").alias("n_tokens"),
        F.coalesce("dsir_weight_micro", F.lit(0))
        .cast("bigint")
        .alias("dsir_weight_micro"),
    )
