"""Direct pins for the five functions MACHINERY_COVERAGE.json still
reports as having no query, pytest, or covered-caller coverage after
the round-12 tracer upgrade — the convenience layer over the portable
SQL builders.  Cross-engine parity is asserted against DuckDB running
the duck-dialect twin where one exists.
"""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from legal_data_ingestion_rag_pipeline_spark.functions import (
    portable as PT,
    similarity as SIM,
    textstats as TS,
)
from legal_data_ingestion_rag_pipeline_spark.operators import fts, topk

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "pack my box with five dozen liquor jugs"),
    (3, "the the the"),
]


def test_unit_normalize_scales_to_unit_norm_and_nulls_zero(spark):
    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0])], "id: bigint, v: array<double>"
    )
    out = {r.id: r.u for r in df.select("id", SIM.unit_normalize("v").alias("u")).collect()}
    assert out[1] == [0.6, 0.8]
    assert out[2] is None  # zero vector -> null, never a div-by-zero


def test_whitespace_token_count_matches_duckdb_twin(spark):
    df = spark.createDataFrame(DOCS, "doc_id: bigint, text: string")
    got = {
        r.doc_id: r.n
        for r in df.select(
            "doc_id", TS.whitespace_token_count("text").cast("bigint").alias("n")
        ).collect()
    }
    duck = duckdb.connect()
    duck.register("t", pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    want = dict(
        duck.execute(
            f"SELECT doc_id, len({PT.tokens('text', PT.DUCKDB)}) FROM t"
        ).fetchall()
    )
    assert got == {k: int(v) for k, v in want.items()}
    assert got[3] == 3


def test_fingerprint_matches_duckdb_twin(spark):
    df = spark.createDataFrame(DOCS, "doc_id: bigint, text: string")
    got = {
        r.doc_id: r.fp
        for r in df.select(
            "doc_id", TS.fingerprint("text").cast("bigint").alias("fp")
        ).collect()
    }
    grams = PT.char_ngrams("text", 8, PT.DUCKDB)
    hashed = PT.transform(grams, f"g -> {PT.poly_hash('g', PT.DUCKDB)}", PT.DUCKDB)
    duck = duckdb.connect()
    duck.register("t", pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    want = dict(
        duck.execute(
            f"SELECT doc_id, {PT.array_min(hashed, PT.DUCKDB)} FROM t"
        ).fetchall()
    )
    assert got == {k: int(v) for k, v in want.items()}


def test_postings_inverted_index_rows(spark):
    df = spark.createDataFrame(DOCS[:1] + DOCS[2:], "doc_id: bigint, text: string")
    rows = fts.postings(df, "doc_id", "text").collect()
    # one row per (doc, term) carrying tf and dl
    three_rows = [r for r in rows if r.doc_id == 3]
    assert len(three_rows) == 1
    assert three_rows[0].term == "the" and three_rows[0].tf == 3 and three_rows[0].dl == 3
    one_rows = [r for r in rows if r.doc_id == 1]
    assert len(one_rows) == 8 and all(r.dl == 9 for r in one_rows)
    assert {r.term: r.tf for r in one_rows}["the"] == 2
    assert {r.term for r in one_rows} == {
        "the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog",
    }


def test_top_k_total_order_and_plan(spark):
    df = spark.range(100).withColumn("v", (F.col("id") * 37) % 11)
    out = topk.top_k(df, [F.desc("v"), F.asc("id")], 5)
    got = [(r.v, r.id) for r in out.collect()]
    assert got == sorted(
        [((i * 37) % 11, i) for i in range(100)], key=lambda t: (-t[0], t[1])
    )[:5]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # top-k, never a global sort
