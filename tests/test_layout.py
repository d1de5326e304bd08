"""Z-order layout (operators/layout.py): Morton key correctness and
the actual file-skipping payoff measured from parquet footer stats."""

from __future__ import annotations

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from legal_data_ingestion_rag_pipeline_spark.operators import layout


def test_morton_key_interleaves_bits(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (2, 3), (5, 6)], "x bigint, y bigint"
    )
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", layout.morton_key(F.col("x"), F.col("y"), bits=4).alias("z")
        ).collect()
    }

    def morton(x: int, y: int) -> int:
        z = 0
        for i in range(4):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    for (x, y), z in got.items():
        assert z == morton(x, y), (x, y, z)


def _file_ranges(path, col):
    out = []
    for f in sorted(path.glob("*.parquet")):
        md = pq.ParquetFile(f).metadata
        los, his = [], []
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    los.append(c.statistics.min)
                    his.append(c.statistics.max)
        if los:
            out.append(max(his) - min(los))
    return out


def test_zorder_write_narrows_both_columns(spark, tmp_path):
    # (a, b) decorrelated: a ascending, b = reversed bit pattern — a
    # plain sort by a leaves every file spanning b's full range
    n = 20_000
    df = (
        spark.range(0, n)
        .withColumn("a", F.col("id"))
        .withColumn("b", (F.col("id") * 7919) % n)
        .withColumn("v", F.col("id") % 13)
    )
    # 16 files = 4 leading Morton bits per curve segment = 2 bits per
    # dimension: each file covers ~a quarter of BOTH ranges (plus
    # straddle slack from range-partition boundary sampling)
    naive, zord = tmp_path / "naive", tmp_path / "zord"
    (
        df.repartitionByRange(16, "a")
        .sortWithinPartitions("a")
        .write.parquet(str(naive))
    )
    layout.write_zordered(df, str(zord), "a", "b", n_files=16, bits=10)

    # rows intact, _zkey not leaked into the output schema
    got = spark.read.parquet(str(zord))
    assert got.count() == n
    assert "_zkey" not in got.columns
    assert got.agg(F.sum("v")).first()[0] == df.agg(F.sum("v")).first()[0]

    naive_b = _file_ranges(naive, "b")
    z_a = _file_ranges(zord, "a")
    z_b = _file_ranges(zord, "b")
    # naive layout: every file spans essentially all of b
    assert min(naive_b) > 0.9 * n
    # z-order: BOTH columns narrow per file — each file covers a small
    # rectangle, so a 2-predicate query skips most files on stats
    assert sum(z_a) / len(z_a) < 0.5 * n
    assert sum(z_b) / len(z_b) < 0.5 * n


def test_zorder_constant_and_null_degrade_gracefully(spark, tmp_path):
    df = spark.range(0, 100).withColumn(
        "c", F.when(F.col("id") < 90, F.lit(5)).otherwise(F.lit(None))
    )
    # constant column -> level 0; NULLs -> level 0 (curve origin), no
    # rows lost, no error
    layout.write_zordered(df, str(tmp_path / "z"), "id", "c", n_files=2, bits=8)
    got = spark.read.parquet(str(tmp_path / "z"))
    assert got.count() == 100
    assert got.filter(F.col("c").isNull()).count() == 10
