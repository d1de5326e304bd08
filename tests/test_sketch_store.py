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
