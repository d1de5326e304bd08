"""The Arrow fast paths must be BIT-IDENTICAL to their Column-
expression specs (which the DuckDB oracles mirror): same polynomial
hashes, same fold-left IEEE double arithmetic, same rounding."""

from __future__ import annotations

from legal_data_ingestion_rag_pipeline_spark.operators import dedup
from legal_data_ingestion_rag_pipeline_spark.plans import (
    driver_queries_similarity as DQ,
)
from legal_data_ingestion_rag_pipeline_spark.plans.registry import registry
from legal_data_ingestion_rag_pipeline_spark.session import load_table

SF = "/root/testdata/sf0.001"


def test_minhash_arrow_matches_sql(spark):
    docs = load_table(spark, SF, "documents")
    fast = dedup.with_minhash(docs, "text", "doc_id", engine="arrow")
    slow = dedup.with_minhash(docs, "text", "doc_id", engine="sql")
    # one execution per engine (the two exceptAll counts ran each
    # pipeline TWICE — the sql path's 32-slot expression codegen is
    # the expensive part; r14 test-wall fix).  Multiset equality via
    # sorted rows == the two exceptAll==0 assertions.
    fast_rows = sorted((r[0], tuple(r[1])) for r in fast.collect())
    slow_rows = sorted((r[0], tuple(r[1])) for r in slow.collect())
    assert fast_rows == slow_rows and len(fast_rows) > 0


def test_quality_arrow_matches_sql(spark):
    fast = registry()["textstats_quality"].spark(spark, SF)
    slow = DQ.textstats_quality_sql_path(spark, SF)
    # same one-execution-per-engine rewrite as the minhash parity test
    fast_rows = sorted(tuple(r) for r in fast.collect())
    slow_rows = sorted(tuple(r) for r in slow.collect())
    assert fast_rows == slow_rows and len(fast_rows) > 0


def test_rag_arrow_matches_sql(spark):
    fast = [tuple(r) for r in registry()["rag_semantic_search"].spark(spark, SF).collect()]
    slow = [tuple(r) for r in DQ.rag_semantic_search_sql_path(spark, SF).collect()]
    assert fast == slow and len(fast) > 0


def test_curation_arrow_matches_expression_specs(spark):
    """Fused quality+lang pass == quality_stats_arrow + lang_id
    expression, column by column."""
    from pyspark.sql import functions as F

    from legal_data_ingestion_rag_pipeline_spark.functions import portable as PT
    from legal_data_ingestion_rag_pipeline_spark.functions import textstats as TS

    docs = load_table(spark, SF, "documents")
    fused = TS.curation_stats_arrow(docs, "text", "doc_id")
    q = TS.quality_stats_arrow(docs, "text", "doc_id").select("doc_id", "quality")
    lang = docs.withColumn(
        "tokens", F.expr(PT.tokens("text", PT.SPARK))
    ).select("doc_id", TS.lang_id("tokens").alias("lang_pred"))
    spec = q.join(lang, "doc_id").select("doc_id", "quality", "lang_pred")
    assert fused.exceptAll(spec).count() == 0
    assert spec.exceptAll(fused).count() == 0


def test_simhash_arrow_matches_sql(spark):
    docs = load_table(spark, SF, "documents")
    fast = dedup.simhash_docs(docs, "text", "doc_id", engine="arrow")
    slow = dedup.simhash_docs(docs, "text", "doc_id", engine="sql")
    assert fast.exceptAll(slow).count() == 0
    assert slow.exceptAll(fast).count() == 0
