"""Transaction-log table format: commit protocol, manifest replay,
time travel, orphan invisibility."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from legal_data_ingestion_rag_pipeline_spark.operators import tlog


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id").cast("bigint"))


def test_append_overwrite_replay(tmp_path, spark):
    path = str(tmp_path / "t")
    assert tlog.current_version(path) == -1
    v0 = tlog.commit(_df(spark, 0, 10), path, "append")
    v1 = tlog.commit(_df(spark, 10, 30), path, "append")
    v2 = tlog.commit(_df(spark, 100, 105), path, "overwrite")
    assert (v0, v1, v2) == (0, 1, 2)
    assert tlog.read_version(spark, path, 0).count() == 10
    assert tlog.read_version(spark, path, 1).count() == 30
    assert tlog.read_version(spark, path, 2).count() == 5
    # latest == v2 after the overwrite
    assert tlog.read_version(spark, path).count() == 5


def test_orphan_files_invisible(tmp_path, spark):
    path = str(tmp_path / "t")
    tlog.commit(_df(spark, 0, 10), path, "append")
    # simulate a crashed writer: data files exist, no manifest line
    orphan_dir = os.path.join(path, "data", "v999999")
    _df(spark, 0, 1000).write.parquet(orphan_dir)
    assert tlog.read_version(spark, path).count() == 10


def test_crashed_commit_attempt_recovered(tmp_path, spark):
    """A crash BETWEEN the data write and the manifest append leaves
    data/v{N} populated but unreferenced.  The next commit recomputes
    the same version number and must clear the orphan and succeed —
    the table stays writable without manual cleanup."""
    path = str(tmp_path / "t")
    tlog.commit(_df(spark, 0, 10), path, "append")
    # simulate the crashed attempt at the NEXT version number
    crashed_dir = os.path.join(path, "data", "v000001")
    _df(spark, 500, 600).write.parquet(crashed_dir)
    assert tlog.read_version(spark, path).count() == 10  # still invisible
    v = tlog.commit(_df(spark, 10, 15), path, "append")
    assert v == 1
    assert tlog.read_version(spark, path).count() == 15
    # the orphan's rows must NOT have leaked into the committed version
    assert tlog.read_version(spark, path).filter(F.col("id") >= 500).count() == 0


def test_uncommitted_version_rejected(tmp_path, spark):
    path = str(tmp_path / "t")
    tlog.commit(_df(spark, 0, 10), path, "append")
    with pytest.raises(ValueError):
        tlog.read_version(spark, path, 7)


def test_scan_reads_only_live_files(tmp_path, spark):
    path = str(tmp_path / "t")
    tlog.commit(_df(spark, 0, 10), path, "append")
    tlog.commit(_df(spark, 10, 20), path, "overwrite")
    files = tlog.read_version(spark, path).inputFiles()
    # the overwritten v0 directory must not appear in the scan inputs
    assert files and all("v000001" in f for f in files)


def test_streaming_microbatches_commit_as_versions(tmp_path, spark):
    """foreachBatch -> tlog.commit: every micro-batch becomes one
    committed version, giving a streaming sink exactly-once-per-batch
    append semantics plus time travel over the ingest history."""
    import time

    from legal_data_ingestion_rag_pipeline_spark.operators import tlog as T

    src = tmp_path / "src"
    src.mkdir()
    table = str(tmp_path / "table")
    _df(spark, 0, 50).toPandas().to_parquet(str(src / "a.parquet"))
    time.sleep(1.2)  # file-source orders batches by modification time
    _df(spark, 50, 80).toPandas().to_parquet(str(src / "b.parquet"))

    stream = (
        spark.readStream.schema("id bigint")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda batch_df, epoch_id: T.commit(batch_df, table, "append")
        )
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(180)
    assert q.exception() is None
    assert T.current_version(table) == 1
    assert T.read_version(spark, table, 0).count() == 50
    assert T.read_version(spark, table).count() == 80


def test_manifest_stats_prune_skips_files(tmp_path, spark):
    path = str(tmp_path / "t")
    tlog.commit(_df(spark, 0, 100).coalesce(1), path, "append", stats_col="id")
    tlog.commit(
        _df(spark, 1000, 1100).coalesce(1), path, "append", stats_col="id"
    )
    tlog.commit(
        _df(spark, 5000, 5100).coalesce(1), path, "append", stats_col="id"
    )
    pruned = tlog.read_version(spark, path, prune=(1050, 1060))
    assert len(pruned.inputFiles()) == 1
    # pruning is a superset guarantee: the row filter still applies
    assert pruned.filter("id BETWEEN 1050 AND 1060").count() == 11
    # unpruned read sees all three files
    assert len(tlog.read_version(spark, path).inputFiles()) == 3


def test_prune_keeps_statless_files(tmp_path, spark):
    path = str(tmp_path / "t")
    tlog.commit(_df(spark, 0, 10).coalesce(1), path, "append")  # no stats
    tlog.commit(
        _df(spark, 1000, 1010).coalesce(1), path, "append", stats_col="id"
    )
    pruned = tlog.read_version(spark, path, prune=(5, 7))
    # the statless file is conservatively kept; the out-of-range one drops
    assert len(pruned.inputFiles()) == 1
    assert pruned.count() == 10


def test_epoch_commit_idempotent(tmp_path, spark):
    path = str(tmp_path / "t")
    v0 = tlog.commit(_df(spark, 0, 10), path, "append", epoch=7)
    v_retry = tlog.commit(_df(spark, 0, 10), path, "append", epoch=7)
    assert v0 == v_retry == 0
    assert tlog.read_version(spark, path).count() == 10  # no double append
    v1 = tlog.commit(_df(spark, 10, 20), path, "append", epoch=8)
    assert v1 == 1


def test_vacuum_drops_old_versions_keeps_new(tmp_path, spark):
    path = str(tmp_path / "t")
    tlog.commit(_df(spark, 0, 10).coalesce(1), path, "append")
    tlog.commit(_df(spark, 10, 20).coalesce(1), path, "append")
    tlog.commit(_df(spark, 100, 120).coalesce(1), path, "overwrite")
    tlog.commit(_df(spark, 120, 130).coalesce(1), path, "append")
    deleted = tlog.vacuum(path, keep_from_version=2)
    # v0/v1 files referenced by no kept version are physically gone
    assert len(deleted) == 2 and all(os.path.exists(f) is False for f in deleted)
    # kept versions still read exactly
    assert tlog.read_version(spark, path, 2).count() == 20
    assert tlog.read_version(spark, path, 3).count() == 30
    # pre-retention versions are unreadable now
    with pytest.raises(ValueError):
        tlog.read_version(spark, path, 1)


def test_vacuum_preserves_stats_pruning(tmp_path, spark):
    path = str(tmp_path / "t")
    tlog.commit(_df(spark, 0, 10).coalesce(1), path, "append", stats_col="id")
    tlog.commit(
        _df(spark, 1000, 1010).coalesce(1), path, "append", stats_col="id"
    )
    tlog.vacuum(path, keep_from_version=1)
    pruned = tlog.read_version(spark, path, prune=(1005, 1006))
    assert len(pruned.inputFiles()) == 1
    assert tlog.read_version(spark, path).count() == 20


def test_seeded_fuzz_commit_sequences_match_model(tmp_path, spark):
    """Model-based seeded fuzz: random append/overwrite/epoch-retry
    sequences replayed against a pure-Python set model; every
    committed version's row set must match the model at every point
    (the test_fuzz.py convention applied to the table format)."""
    import random

    rng = random.Random(20260814)
    for seq_no in range(4):
        path = str(tmp_path / f"t{seq_no}")
        model: list[set[int]] = []  # live id-set per version
        used_epochs: set[int] = set()
        for _ in range(6):
            lo = rng.randrange(0, 1000)
            n = rng.randrange(1, 40)
            ids = set(range(lo, lo + n))
            action = rng.choice(["append", "append", "overwrite"])
            retry = model and rng.random() < 0.3
            if retry:
                # replay an already-committed epoch: must be a no-op
                epoch = rng.choice(sorted(used_epochs))
                v = tlog.commit(
                    _df(spark, lo, lo + n), path, action, epoch=epoch
                )
                assert v < len(model)
            else:
                epoch = len(used_epochs)
                used_epochs.add(epoch)
                v = tlog.commit(
                    _df(spark, lo, lo + n), path, action, epoch=epoch
                )
                prev = model[-1] if model else set()
                model.append(
                    ids if action == "overwrite" else (prev | ids)
                )
                assert v == len(model) - 1
        for v, expect in enumerate(model):
            got = {
                r.id for r in tlog.read_version(spark, path, v).collect()
            }
            assert got == expect, f"seq {seq_no} version {v}"


def test_bloom_index_prunes_point_lookup(tmp_path, spark):
    path = str(tmp_path / "t")
    segs = [("alpha", 0), ("beta", 1), ("gamma", 2)]
    for name, lo in segs:
        df = spark.range(lo * 100, lo * 100 + 50).select(
            F.col("id").cast("bigint"), F.lit(name).alias("seg")
        )
        tlog.commit(df.coalesce(1), path, "append")
    tlog.attach_bloom_index(path, "seg")
    hit = tlog.read_point_lookup(spark, path, "seg", "beta")
    assert len(hit.inputFiles()) == 1
    assert hit.count() == 50
    # absent value: every file's bloom says no -> empty without a scan
    miss = tlog.read_point_lookup(spark, path, "seg", "nope")
    assert miss.count() == 0


def test_bloom_index_spark_twin_parity(spark):
    # the manifest blooms use a pure-Python twin of sketches.bloom_build:
    # identical words for identical inputs, or lookups would silently
    # skip files that DO contain the value
    from legal_data_ingestion_rag_pipeline_spark.functions import portable as PT
    from legal_data_ingestion_rag_pipeline_spark.operators import sketches
    from legal_data_ingestion_rag_pipeline_spark.operators.tlog import (
        _py_bloom_words,
    )

    vals = ["alpha", "beta", "gamma", "delta", "x" * 40]
    df = spark.createDataFrame([(v,) for v in vals], "v: string").select(
        F.expr(PT.poly_hash("v", PT.SPARK)).alias("h")
    )
    spark_words = {
        r.word_idx: r.word
        for r in sketches.bloom_build(df, "h", k=4, m_words=16).collect()
    }
    py = _py_bloom_words(vals, k=4, m_words=16)
    expect = {i: w for i, w in enumerate(py) if w != 0}
    assert spark_words == expect


def test_bloom_index_survives_append_and_incremental_attach(tmp_path, spark):
    path = str(tmp_path / "t")
    tlog.commit(
        spark.range(0, 10).select(F.lit("a").alias("seg")).coalesce(1),
        path, "append",
    )
    tlog.attach_bloom_index(path, "seg")
    tlog.commit(
        spark.range(0, 10).select(F.lit("b").alias("seg")).coalesce(1),
        path, "append",
    )
    tlog.attach_bloom_index(path, "seg")  # only the new file is indexed
    hit = tlog.read_point_lookup(spark, path, "seg", "b")
    assert len(hit.inputFiles()) == 1 and hit.count() == 10


def test_compact_preserves_content_and_history(tmp_path, spark):
    path = str(tmp_path / "t")
    for lo in (0, 10, 20, 30):
        tlog.commit(_df(spark, lo, lo + 10).coalesce(2), path, "append")
    before = set(
        r.id for r in tlog.read_version(spark, path).collect()
    )
    assert len(tlog.live_files(path)) == 8
    v = tlog.compact(spark, path, target_files=1)
    assert len(tlog.live_files(path)) == 1
    after = set(r.id for r in tlog.read_version(spark, path).collect())
    assert after == before
    # pre-compaction version still time-travels
    assert tlog.read_version(spark, path, v - 1).count() == 40


def test_error_paths(tmp_path, spark):
    path = str(tmp_path / "t")
    with pytest.raises(ValueError):
        tlog.commit(_df(spark, 0, 5), path, "upsert")  # unknown action
    tlog.commit(_df(spark, 0, 5), path, "append")
    with pytest.raises(ValueError):
        tlog.vacuum(path, keep_from_version=5)  # out of range
    with pytest.raises(ValueError):
        tlog.read_version(spark, str(tmp_path / "absent"))  # empty table
    with pytest.raises(ValueError):
        tlog.attach_bloom_index(str(tmp_path / "absent"), "x")


def test_prune_composes_with_time_travel(tmp_path, spark):
    """Stats pruning must respect the version boundary: a file added
    AFTER the requested version never appears, even when its stats
    match the range."""
    path = str(tmp_path / "t")
    tlog.commit(_df(spark, 0, 100).coalesce(1), path, "append", stats_col="id")
    v0 = tlog.current_version(path)
    tlog.commit(
        _df(spark, 50, 150).coalesce(1), path, "append", stats_col="id"
    )
    old = tlog.read_version(spark, path, v0, prune=(60, 70))
    assert len(old.inputFiles()) == 1
    assert old.filter("id BETWEEN 60 AND 70").count() == 11
    new = tlog.read_version(spark, path, prune=(60, 70))
    assert len(new.inputFiles()) == 2  # both versions' files overlap 60-70
