"""Stored quantized retrieval tiers (operators/ann.py
write_binary_tier / write_pq_codes): the persisted index must be
bit-faithful to the in-plan packing, and the fine scan must touch
ONLY the stored codes until rescore — asserted from the physical
plan, not just claimed in docstrings."""

from __future__ import annotations

from pyspark.sql import functions as F

from legal_data_ingestion_rag_pipeline_spark.operators import ann
from legal_data_ingestion_rag_pipeline_spark.operators.pq import (
    pq_adc_topk,
    pq_train_codebook,
)
from legal_data_ingestion_rag_pipeline_spark.session import load_table

SF = "/root/testdata/sf0.001"


def _corpus_cents_queries(spark):
    e = load_table(spark, SF, "embeddings")
    cents = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("c_vec")
    )
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return e, cents, q


def test_binary_tier_roundtrip_matches_inplan(tmp_path, spark):
    """write_binary_tier -> read_binary_tier -> from_tier search is
    row-identical to the on-the-fly ivf_binary_topk (the faithful-
    rewrite bar the gate holds ann_ivf_binary_stored to)."""
    e, cents, q = _corpus_cents_queries(spark)
    assigned = ann.ivf_assign(e, cents)
    path = str(tmp_path / "btier")
    ann.write_binary_tier(assigned, path, dim=64)

    tier = ann.read_binary_tier(spark, path)
    stored = ann.ivf_binary_topk_from_tier(
        tier, e.select("vec_id", "embedding"), cents, q, dim=64, k=10, probes=2, pool=30
    )
    inplan = ann.ivf_binary_topk(assigned, cents, q, dim=64, k=10, probes=2, pool=30)

    key = lambda r: (r.q_id, r.rank)  # noqa: E731
    got = {key(r): (r.vec_id, round(r.similarity, 9)) for r in stored.collect()}
    want = {key(r): (r.vec_id, round(r.similarity, 9)) for r in inplan.collect()}
    assert got == want


def test_binary_tier_stores_no_floats_and_scan_reads_only_words(tmp_path, spark):
    """The tier table has NO float column (dim/8 bytes of BIGINT words
    per vector), and the fine-scan stage's FileScan of the tier reads
    only id + word columns — the float table appears in the plan only
    on the rescore leg."""
    e, cents, q = _corpus_cents_queries(spark)
    assigned = ann.ivf_assign(e, cents)
    path = str(tmp_path / "btier")
    ann.write_binary_tier(assigned, path, dim=64)

    tier = ann.read_binary_tier(spark, path)
    assert "embedding" not in tier.columns
    assert {"vec_id", "centroid_id", "_cw0", "_cw1"} <= set(tier.columns)
    word_types = dict(tier.dtypes)
    assert word_types["_cw0"] == "bigint" and word_types["_cw1"] == "bigint"

    out = ann.ivf_binary_topk_from_tier(
        tier, e.select("vec_id", "embedding"), cents, q, dim=64, k=10, probes=2, pool=30
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # every FileScan over the tier path must project only words + ids
    tier_scans = [
        seg for seg in plan.split("FileScan")[1:] if "btier" in seg.split("\n")[0]
    ]
    assert tier_scans, "no FileScan of the stored tier in the plan"
    for seg in tier_scans:
        head = seg.split("\n")[0]
        assert "embedding" not in head, head


def test_binary_tier_cell_partitioned_prunes(tmp_path, spark):
    """Cell partitioning works like write_cell_partitioned: a probed
    read lists only the probed cell directories."""
    e, cents, _ = _corpus_cents_queries(spark)
    assigned = ann.ivf_assign(e.limit(64), cents)
    path = str(tmp_path / "btier")
    ann.write_binary_tier(assigned, path, dim=64)

    probed = ann.read_binary_tier(spark, path).filter(
        F.col("centroid_id").isin(1, 3)
    )
    files = {
        r.f
        for r in probed.select(F.input_file_name().alias("f")).distinct().collect()
    }
    assert files
    assert all("centroid_id=1" in f or "centroid_id=3" in f for f in files)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "centroid_id" in plan.split("PartitionFilters")[1][:120]


def test_flat_binary_tier_layout(tmp_path, spark):
    """centroid_id=None writes the flat IndexBinaryFlat layout:
    unpartitioned, id + words only."""
    e, _, _ = _corpus_cents_queries(spark)
    path = str(tmp_path / "flat")
    ann.write_binary_tier(e, path, dim=64, centroid_id=None)
    tier = ann.read_binary_tier(spark, path)
    assert set(tier.columns) == {"vec_id", "_cw0", "_cw1"}
    assert tier.count() == e.count()


def test_pq_codes_roundtrip_matches_inplan(tmp_path, spark):
    """write_pq_codes -> pq_adc_topk_from_codes is row-identical to
    the on-the-fly pq_adc_topk under the same trained codebook."""
    e, _, q = _corpus_cents_queries(spark)
    book = pq_train_codebook(e, m=4, k_cb=8, iters=2)
    path = str(tmp_path / "pqcodes")
    ann.write_pq_codes(e, book, path)

    codes = ann.read_pq_codes(spark, path)
    assert "embedding" not in codes.columns
    assert {"vec_id", "pq_code_0", "pq_code_3"} <= set(codes.columns)

    stored = ann.pq_adc_topk_from_codes(
        codes, e.select("vec_id", "embedding"), q, book, k=10, pool=50
    )
    inplan = pq_adc_topk(e, q, book, k=10, pool=50)
    key = lambda r: (r.q_id, r.rank)  # noqa: E731
    got = {key(r): (r.vec_id, round(r.similarity, 9)) for r in stored.collect()}
    want = {key(r): (r.vec_id, round(r.similarity, 9)) for r in inplan.collect()}
    assert got == want
