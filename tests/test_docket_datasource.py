"""The custom docketjson Python DataSource (Spark 4 connector API):
file-parallel scan, stable _seq total order, ingest-pipeline parity
with the built-in reader."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from legal_data_ingestion_rag_pipeline_spark.plans.ingest import ingest_batch
from legal_data_ingestion_rag_pipeline_spark.sources.docket_datasource import (
    SEQ_FILE_STRIDE,
    read_raw_dockets_source,
)
from legal_data_ingestion_rag_pipeline_spark.sources.readers import (
    RAW_FIELDS,
    read_raw_dockets,
)

from fixtures import DOCKETS


def _write(path, records):
    path.write_text(json.dumps(records), encoding="utf-8")


def test_source_matches_builtin_reader(spark, tmp_path):
    f = tmp_path / "a.json"
    _write(f, DOCKETS)
    via_source = read_raw_dockets_source(spark, str(f))
    via_builtin = read_raw_dockets(spark, str(f))
    a = [
        tuple(r[k] for k in RAW_FIELDS)
        for r in via_source.orderBy("_seq").collect()
    ]
    b = [
        tuple(r[k] for k in RAW_FIELDS)
        for r in via_builtin.orderBy("_seq").collect()
    ]
    assert a == b
    # _seq is 0-based record order within the single file
    seqs = [r._seq for r in via_source.orderBy("_seq").collect()]
    assert seqs == list(range(len(DOCKETS)))


def test_source_multi_file_partitions_and_order(spark, tmp_path):
    half = len(DOCKETS) // 2
    _write(tmp_path / "part-0.json", DOCKETS[:half])
    _write(tmp_path / "part-1.json", DOCKETS[half:])
    df = read_raw_dockets_source(spark, str(tmp_path / "*.json"))
    # one partition per file — the layout IS the parallelism
    assert df.rdd.getNumPartitions() == 2
    rows = df.orderBy("_seq").collect()
    assert len(rows) == len(DOCKETS)
    # file index ordering: part-0 records sort before part-1
    assert [r.case_number for r in rows] == [
        d["case_number"] for d in DOCKETS
    ]
    assert rows[half]._seq == SEQ_FILE_STRIDE  # second file's base


def test_ingest_through_source_matches_counts(spark, tmp_path):
    f = tmp_path / "a.json"
    _write(f, DOCKETS)
    raw = read_raw_dockets_source(spark, str(f))
    r = ingest_batch(spark, raw, existing=None, run_id=1)
    assert r.counts["read"] == 10
    assert r.counts["inserted"] == 3
    assert r.counts["updated"] == 1
    assert r.counts["failed"] == 6
    # last-writer-wins respected the _seq order: the duplicate
    # case_number kept the LATER record's title
    cases = {c.case_number: c.title for c in r.tables["cases"].collect()}
    assert cases["1:23-cv-00001"] == "Smith v. Acme Corp (amended)"


def test_source_non_string_values_stringified(spark, tmp_path):
    f = tmp_path / "odd.json"
    _write(
        f,
        [
            {
                "case_number": "X-1",
                "court": "C",
                "title": 42,
                "filed_date": "2024-01-01",
                "parties": None,
                "case_type": "civil",
                "judge": "J",
                "docket_text": "",
                "status": "active",
            }
        ],
    )
    row = read_raw_dockets_source(spark, str(f)).collect()[0]
    assert row.title == "42"  # permissive: scalars stringify
    assert row.parties is None


def test_source_streaming_two_batches(spark, tmp_path):
    """The connector's streaming half (SimpleDataSourceStreamReader):
    availableNow over file 1, then a SECOND query from the same
    checkpoint after file 2 lands — only the new file's records
    append (offset = files-consumed, replay-stable _seq)."""
    src = tmp_path / "stream_src"
    src.mkdir()
    _write(src / "a.json", DOCKETS[:4])
    from legal_data_ingestion_rag_pipeline_spark.sources.docket_datasource import (
        DocketJsonDataSource,
    )

    spark.dataSource.register(DocketJsonDataSource)
    out_dir = tmp_path / "out"
    ckpt = tmp_path / "ckpt"

    def run_once():
        stream = spark.readStream.format("docketjson").load(
            str(src / "*.json")
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", str(out_dir))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert q.exception() is None

    run_once()
    got1 = spark.read.parquet(str(out_dir))
    assert got1.count() == 4

    _write(src / "b.json", DOCKETS[4:])
    run_once()
    rows = spark.read.parquet(str(out_dir)).orderBy("_seq").collect()
    assert len(rows) == len(DOCKETS)  # no duplicates from file a
    assert [r.case_number for r in rows] == [
        d["case_number"] for d in DOCKETS
    ]
    # second file's _seq rides file index 1
    assert rows[4]._seq == SEQ_FILE_STRIDE
