"""Custom Python DataSource (the Spark 4 ``pyspark.sql.datasource``
API) for the reference's raw-docket JSON format — S1 as a real
pluggable connector instead of a reader helper.

Why a custom source at 100 TB: the built-in JSON reader treats a
multiLine JSON ARRAY as one unsplittable blob per file (single-task
scan), and the ingest pipeline additionally needs a stable global
``_seq`` (last-writer-wins order) that ``monotonically_increasing_id``
only delivers single-partition.  This source makes the layout the
parallelism: ONE partition per input file, records streamed with
``ijson``-free incremental decoding (stdlib json per file — each file
is bounded by the export process that wrote it), and
``_seq = file_index * 2^32 + record_index`` — a total order that is
(a) computable with zero coordination, (b) stable under any task
scheduling, and (c) exactly the reference's processing order for a
sorted file list (ingest.py:693-698 processes files in listing order,
records in array order).

Registration (once per session)::

    spark.dataSource.register(DocketJsonDataSource)
    df = spark.read.format("docketjson").load("/data/dockets/*.json")

The planner only LISTS files (no data read on the driver); record
decode happens task-side in the partition reader.
"""

from __future__ import annotations

import glob as _glob
import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

#: column order must match sources/readers.RAW_FIELDS + _seq; the DDL
#: keeps the permissive 9-string schema-on-read contract.
DOCKET_DDL = (
    "case_number string, court string, title string, filed_date string, "
    "parties string, case_type string, judge string, docket_text string, "
    "status string, _seq long"
)

_FIELDS = (
    "case_number",
    "court",
    "title",
    "filed_date",
    "parties",
    "case_type",
    "judge",
    "docket_text",
    "status",
)

SEQ_FILE_STRIDE = 1 << 32


class _FilePartition(InputPartition):
    def __init__(self, index: int, path: str):
        self.index = index
        self.path = path


class DocketJsonReader(DataSourceReader):
    def __init__(self, options):
        path = options.get("path")
        if not path:
            raise ValueError("docketjson requires a path")
        if os.path.isdir(path):
            path = os.path.join(path, "*.json")
        self._files = sorted(_glob.glob(path)) or [path]

    def partitions(self):
        return [
            _FilePartition(i, p) for i, p in enumerate(self._files)
        ]

    def read(self, partition: _FilePartition):
        with open(partition.path, "r", encoding="utf-8") as f:
            records = json.load(f)
        if not isinstance(records, list):
            records = [records]
        base = partition.index * SEQ_FILE_STRIDE
        for i, rec in enumerate(records):
            if not isinstance(rec, dict):
                rec = {}
            vals = []
            for k in _FIELDS:
                v = rec.get(k)
                # permissive schema-on-read: everything surfaces as a
                # string for the validation cascade to judge, exactly
                # like the built-in reader's 9-string schema
                vals.append(
                    v
                    if v is None or isinstance(v, str)
                    else json.dumps(v, sort_keys=True)
                )
            yield (*vals, base + i)


class DocketJsonDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "docketjson"

    def schema(self) -> str:
        return DOCKET_DDL

    def reader(self, schema) -> DocketJsonReader:
        return DocketJsonReader(self.options)

    def simpleStreamReader(self, schema):
        return DocketJsonStreamReader(self.options)


def read_raw_dockets_source(spark, path: str):
    """Convenience: register (idempotent) and load through the
    connector.  The result feeds plans/ingest.ingest_batch unchanged —
    same columns, same ``_seq`` contract, file-parallel."""
    spark.dataSource.register(DocketJsonDataSource)
    return spark.read.format("docketjson").load(path)


class DocketJsonStreamReader(SimpleDataSourceStreamReader):
    """Streaming half of the connector (SimpleDataSourceStreamReader):
    the offset is the count of files consumed from the SORTED listing
    — an append-only directory contract (each export lands as a new
    file; files are immutable once written, the same contract Spark's
    own FileStreamSource assumes).  ``readBetweenOffsets`` replays any
    committed range deterministically from the listing, which is what
    makes recovery exactly-once: a restarted query re-reads precisely
    the files of the uncommitted batch, in the same order, with the
    same ``_seq`` values (file-index based, so replay-stable)."""

    def __init__(self, options):
        path = options.get("path")
        if not path:
            raise ValueError("docketjson stream requires a path")
        if os.path.isdir(path):
            path = os.path.join(path, "*.json")
        self._glob = path

    def _files(self):
        return sorted(_glob.glob(self._glob))

    def initialOffset(self) -> dict:
        return {"idx": 0}

    def _rows(self, files, base_index):
        for k, path in enumerate(files):
            yield from self._file_rows(_FilePartition(base_index + k, path))

    def _file_rows(self, partition):
        with open(partition.path, "r", encoding="utf-8") as f:
            records = json.load(f)
        if not isinstance(records, list):
            records = [records]
        base = partition.index * SEQ_FILE_STRIDE
        for i, rec in enumerate(records):
            if not isinstance(rec, dict):
                rec = {}
            vals = [
                (
                    v
                    if v is None or isinstance(v, str)
                    else json.dumps(v, sort_keys=True)
                )
                for v in (rec.get(k) for k in _FIELDS)
            ]
            yield (*vals, base + i)

    def read(self, start: dict):
        # materialized list, not a generator: the simple-reader
        # protocol prefetches and PICKLES the batch driver-side (its
        # documented trade — per-batch data must fit the driver; the
        # partition-planned DataSourceStreamReader is the scale path)
        files = self._files()
        lo = start["idx"]
        return list(self._rows(files[lo:], lo)), {"idx": len(files)}

    def readBetweenOffsets(self, start: dict, end: dict):
        files = self._files()
        return list(
            self._rows(files[start["idx"] : end["idx"]], start["idx"])
        )

    def commit(self, end: dict) -> None:
        pass
