"""Round-13 pins.

Pytest pins for the round-12 ADVICE fixes (so they cannot silently
regress — round-12 verdict ask #3 and the fresh round-12 ADVICE
items):

- packing.pack_assignments pmod sharding under NEGATIVE doc_ids
- pca.gram_exact NULL-embedding / empty-input guards
- _golden_oracle SQL escaping of quote-bearing source literals
- portable.sq_l2_q6 overflow guard (the corrected |elem| <= 33 bound)
- sketches.kmv_set_stats underfull exact branch
- operators/dsir no-CacheManager-pin (localCheckpoint, not persist)
"""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# packing: pmod sharding must match Python % for negative ids
# ---------------------------------------------------------------------------

def test_packing_negative_doc_ids_shard_like_python_mod(spark):
    from legal_data_ingestion_rag_pipeline_spark.operators import packing

    rows = [(i, "w " * (abs(i) % 7 + 1)) for i in range(-9, 10) if i != 0]
    docs = spark.createDataFrame(rows, "doc_id: bigint, text: string")
    n_shards = 4
    got = packing.pack_assignments(
        docs, capacity=8, n_shards=n_shards
    ).collect()
    assert len(got) == len(rows)
    for r in got:
        # Python % is always non-negative for a positive modulus —
        # the twin's semantics; Spark's % is NOT (dividend sign)
        assert r.shard == r.doc_id % n_shards, (r.doc_id, r.shard)
        assert 0 <= r.shard < n_shards


# ---------------------------------------------------------------------------
# pca.gram_exact guards
# ---------------------------------------------------------------------------

def test_pca_gram_exact_rejects_null_embeddings(spark):
    from legal_data_ingestion_rag_pipeline_spark.operators import pca

    e = spark.createDataFrame(
        [([0.1, 0.2],), (None,), ([0.3, 0.4],)],
        "embedding: array<double>",
    )
    with pytest.raises(ValueError, match="NULL rows"):
        pca.gram_exact(e)


def test_pca_gram_exact_rejects_empty_input(spark):
    from legal_data_ingestion_rag_pipeline_spark.operators import pca

    e = spark.createDataFrame([], "embedding: array<double>")
    with pytest.raises(ValueError, match="empty input"):
        pca.gram_exact(e)


# ---------------------------------------------------------------------------
# golden-record oracle: quote-bearing source must render valid SQL
# ---------------------------------------------------------------------------

def test_golden_oracle_escapes_quoted_sources(tmp_path):
    from legal_data_ingestion_rag_pipeline_spark.plans.driver_queries_similarity import (  # noqa: E501
        _golden_oracle,
    )

    pdf = pd.read_parquet(f"{SF}/documents.parquet")
    pdf["source"] = "o'brien & co's"
    pdf.to_parquet(str(tmp_path / "documents.parquet"))
    sql = _golden_oracle(str(tmp_path))
    out = duckdb.connect().execute(sql).fetchall()  # must not raise
    if out:  # clusters formed: every canonical source is the literal
        assert all(r[3] == "o'brien & co's" for r in out)


# ---------------------------------------------------------------------------
# portable.sq_l2_q6 overflow guard
# ---------------------------------------------------------------------------

def test_sq_l2_q6_guard_raises_beyond_bound(spark):
    from legal_data_ingestion_rag_pipeline_spark.functions import portable as PT

    df = spark.createDataFrame(
        [([100.0, 0.0], [0.0, 0.0])], "a: array<double>, b: array<double>"
    )
    with pytest.raises(Exception, match="sq_l2_q6"):
        df.select(F.expr(PT.sq_l2_q6("a", "b", PT.SPARK))).collect()


def test_sq_l2_q6_guard_passes_in_bound_and_matches_unguarded(spark):
    from legal_data_ingestion_rag_pipeline_spark.functions import portable as PT

    df = spark.createDataFrame(
        [([33.0, -33.0, 0.5], [-33.0, 33.0, 0.25])],
        "a: array<double>, b: array<double>",
    )
    guarded = df.select(
        F.expr(PT.sq_l2_q6("a", "b", PT.SPARK)).alias("d")
    ).collect()[0].d
    plain = df.select(
        F.expr(PT.sq_l2_q6("a", "b", PT.SPARK, guard=False)).alias("d")
    ).collect()[0].d
    assert guarded == plain == 2 * 66_000_000**2 + 250_000**2


# ---------------------------------------------------------------------------
# sketches.kmv_set_stats underfull branch
# ---------------------------------------------------------------------------

def test_kmv_set_stats_underfull_is_exact(spark):
    from legal_data_ingestion_rag_pipeline_spark.operators import sketches

    # tiny sets: the union sketch holds FAR fewer than k hashes, so
    # every estimate must be EXACT (both sketches are complete sets)
    a = spark.createDataFrame([(i,) for i in range(10)], "key: bigint")
    b = spark.createDataFrame([(i,) for i in range(5, 18)], "key: bigint")
    k = 128
    sa = sketches.kmv_sketch(a, "key", k)
    sb = sketches.kmv_sketch(b, "key", k)
    est = sketches.kmv_set_stats(sa, sb, k).collect()[0]
    assert est.est_union == 18  # |A ∪ B| exactly
    assert est.est_a_only == 5  # |A \ B| exactly
    # jaccard over the held union: 5 shared / 18 held
    assert est.jaccard_micro == round(5 / 18 * 1_000_000)


def test_kmv_set_stats_full_branch_unchanged(spark):
    """When both sets exceed k the union sketch is full (n_held == k)
    and the corrected divisors equal the nominal k — the historical
    estimator is reproduced bit-for-bit."""
    from legal_data_ingestion_rag_pipeline_spark.functions import portable as PT
    from legal_data_ingestion_rag_pipeline_spark.operators import sketches

    a = spark.range(0, 2000).selectExpr("id AS key")
    b = spark.range(1000, 3000).selectExpr("id AS key")
    k = 128
    sa = sketches.kmv_sketch(a, "key", k)
    sb = sketches.kmv_sketch(b, "key", k)
    est = sketches.kmv_set_stats(sa, sb, k).collect()[0]
    # replay the full-branch formula from the collected h_k
    import math

    assert est.est_union == math.floor((k - 1) * PT.P / est.h_k + 0.5)
    # calibration: within 35% of the true union 3000
    assert abs(est.est_union - 3000) < 0.35 * 3000


# ---------------------------------------------------------------------------
# dsir: no CacheManager pin (localCheckpoint, not persist)
# ---------------------------------------------------------------------------

def test_dsir_leaves_no_cache_manager_pin(spark):
    from legal_data_ingestion_rag_pipeline_spark.plans.registry import registry

    spark.catalog.clearCache()
    df = registry()["dsir_importance_resampling"].spark(spark, SF)
    df.collect()
    # persist() would pin the bucket-count frame in the session
    # CacheManager until an explicit unpersist no caller can place;
    # localCheckpoint blocks are RDD-owned and GC-cleaned instead
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()
