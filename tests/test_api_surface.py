"""Pins for public API-surface functions whose only consumers are
downstream users (the machinery-coverage tool flagged them as having
neither a gated query nor a direct pytest): argmax_per_group,
surrogate.get_or_create, upsert.batch_upsert_counts,
variations.merge_variations, normalize.non_empty,
linededup.segment_lines."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def test_argmax_per_group_total_order(spark):
    from legal_data_ingestion_rag_pipeline_spark.operators.topk import (
        argmax_per_group,
    )

    df = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 10), ("a", 3, 5), ("b", 7, 1)],
        "g: string, id: bigint, score: bigint",
    )
    best = argmax_per_group(
        df, ["g"], [F.desc("score"), F.asc("id")]
    ).collect()
    got = {r.g: r.id for r in best}
    assert got == {"a": 1, "b": 7}  # tie on score -> lowest id wins
    ranked = argmax_per_group(
        df, ["g"], [F.desc("score"), F.asc("id")], keep_rank_col="rk"
    )
    assert set(ranked.columns) >= {"g", "id", "score", "rk"}


def test_surrogate_get_or_create_stable_ids(spark):
    from legal_data_ingestion_rag_pipeline_spark.operators.surrogate import (
        get_or_create,
    )

    existing = spark.createDataFrame(
        [(1, "ca"), (2, "ny")], "id: bigint, state: string"
    )
    batch = spark.createDataFrame(
        [("ny",), ("tx",), ("wa",)], "state: string"
    )
    out = get_or_create(existing, batch, "state").collect()
    ids = {r.state: r.id for r in out}
    # existing keys keep their ids; new keys get fresh ids above max
    assert ids["ca"] == 1 and ids["ny"] == 2
    assert {ids["tx"], ids["wa"]} == {3, 4}
    # re-running with the grown dim is a no-op on ids (idempotent)
    grown = spark.createDataFrame(
        [(r.id, r.state) for r in out], "id: bigint, state: string"
    )
    again = get_or_create(grown, batch, "state").collect()
    assert {r.state: r.id for r in again} == ids


def test_batch_upsert_counts_first_is_insert(spark):
    from legal_data_ingestion_rag_pipeline_spark.operators.upsert import (
        batch_upsert_counts,
    )

    batch = spark.createDataFrame(
        [("k1", 1), ("k1", 2), ("k2", 3)], "k: string, seq: bigint"
    )
    got = {r.k: r.n_occurrences for r in
           batch_upsert_counts(batch, ["k"], "seq").collect()}
    assert got == {"k1": 2, "k2": 1}


def test_merge_variations_additive_counters(spark):
    from legal_data_ingestion_rag_pipeline_spark.operators.variations import (
        merge_variations,
    )

    t0 = dt.datetime(2026, 1, 1)
    t1 = dt.datetime(2026, 2, 1)
    t2 = dt.datetime(2026, 3, 1)
    schema = (
        "field: string, seen_count: bigint, "
        "first_seen_at: timestamp, last_seen_at: timestamp"
    )
    existing = spark.createDataFrame([("court", 3, t0, t1)], schema)
    batch = spark.createDataFrame(
        [("court", 2, t1, t2), ("judge", 1, t2, t2)], schema
    )
    got = {
        r.field: (r.seen_count, r.first_seen_at, r.last_seen_at)
        for r in merge_variations(existing, batch, ["field"]).collect()
    }
    assert got["court"] == (5, t0, t2)  # counters add, min/max stamps
    assert got["judge"] == (1, t2, t2)  # batch-only key survives


def test_non_empty_predicate(spark):
    from legal_data_ingestion_rag_pipeline_spark.functions.normalize import (
        non_empty,
    )

    df = spark.createDataFrame(
        [("x",), ("  ",), ("",), (None,)], "v: string"
    )
    kept = [r.v for r in df.filter(non_empty("v")).collect()]
    assert kept == ["x"]


def test_segment_lines_keeps_null_text_docs(spark):
    from legal_data_ingestion_rag_pipeline_spark.operators.linededup import (
        segment_lines,
    )

    docs = spark.createDataFrame(
        [(1, "a\nb\nc"), (2, None), (3, "single")],
        "doc_id: bigint, text: string",
    )
    out = segment_lines(docs).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc[1]) == 3  # one row per line, positions preserved
    assert [x[2] for x in sorted(map(tuple, by_doc[1]))] == ["a", "b", "c"]
    assert 2 in by_doc  # NULL text must not delete the document
    assert len(by_doc[3]) == 1
