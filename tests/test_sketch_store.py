"""The HLL register store: append-only batches, register-wise max
merge, estimate equality with the single-pass build."""

from __future__ import annotations

from pyspark.sql import functions as F

from legal_data_ingestion_rag_pipeline_spark.operators import sketches


def _keys(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.concat(F.lit("k"), F.col("id")).alias("k")
    )


def test_store_merge_equals_single_pass(tmp_path, spark):
    store = str(tmp_path / "hll_store")
    sketches.write_hll_registers(
        _keys(spark, 0, 600), "k", store, b=6, mode="overwrite"
    )
    # overlapping second batch: duplicates must not inflate the sketch
    sketches.write_hll_registers(
        _keys(spark, 400, 1000), "k", store, b=6, mode="append"
    )
    merged = sketches.hll_estimate_from_store(spark, store, b=6).collect()[0]
    full = sketches.hll_estimate(
        sketches.hll_register(_keys(spark, 0, 1000), "k", b=6), b=6
    ).collect()[0]
    assert merged.asDict() == full.asDict()


def test_batch_register_file_bounded_by_m(tmp_path, spark):
    store = str(tmp_path / "hll_store")
    sketches.write_hll_registers(
        _keys(spark, 0, 100_000), "k", store, b=6, mode="overwrite"
    )
    # 100k keys collapse to at most 2^6 register rows on disk
    assert spark.read.parquet(store).count() <= 64


def test_bloom_or_merge_equals_single_build(spark):
    """Bloom bitmaps merge by word-wise OR — the third leg of the
    sketch-merge triad (CMS sum, HLL max, Bloom OR)."""
    from legal_data_ingestion_rag_pipeline_spark.functions import portable as PT

    def hashed(lo, hi):
        return spark.range(lo, hi).select(
            F.expr(
                PT.poly_hash("CAST(concat('k', id) AS STRING)", PT.SPARK)
            ).alias("h")
        )

    a = sketches.bloom_build(hashed(0, 300), "h", k=4, m_words=32)
    b = sketches.bloom_build(hashed(200, 500), "h", k=4, m_words=32)
    merged = {
        r.word_idx: r.word
        for r in a.unionByName(b)
        .groupBy("word_idx")
        .agg(F.expr("bit_or(word)").alias("word"))
        .collect()
    }
    single = {
        r.word_idx: r.word
        for r in sketches.bloom_build(hashed(0, 500), "h", k=4, m_words=32).collect()
    }
    assert merged == single


def test_histogram_sum_merge_equals_single_build(spark):
    """Equi-width histogram counters merge by plain addition (same
    lo/hi/n_bins) — the fourth mergeable sketch beside CMS/HLL/Bloom."""
    a = sketches.histogram_build(
        spark.range(0, 600).selectExpr("CAST(id AS DOUBLE) AS v"),
        "v", 0.0, 1000.0, n_bins=32,
    )
    b = sketches.histogram_build(
        spark.range(600, 1000).selectExpr("CAST(id AS DOUBLE) AS v"),
        "v", 0.0, 1000.0, n_bins=32,
    )
    merged = {
        r.bin: r.cnt
        for r in a.unionByName(b)
        .groupBy("bin").agg(F.sum("cnt").alias("cnt")).collect()
    }
    single = {
        r.bin: r.cnt
        for r in sketches.histogram_build(
            spark.range(0, 1000).selectExpr("CAST(id AS DOUBLE) AS v"),
            "v", 0.0, 1000.0, n_bins=32,
        ).collect()
    }
    assert merged == single
