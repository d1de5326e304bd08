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


def test_layout_zordered_scan_prunes_and_matches(spark):
    """The registered layout_zordered_scan query must (a) return the
    same aggregate as the plain table and (b) leave a store whose
    footer stats let the two-predicate box skip most files — the
    whole point of Z-ordering during compaction."""
    import hashlib
    import tempfile
    from pathlib import Path

    from legal_data_ingestion_rag_pipeline_spark.plans.driver_queries_scale import (
        _Z_PRICE,
        _Z_QTY,
        layout_zordered_scan,
    )
    from legal_data_ingestion_rag_pipeline_spark.session import load_table

    sf = "/root/testdata/sf0.001"
    got = {
        r.l_returnflag: (r.n_rows, round(r.sum_price, 2))
        for r in layout_zordered_scan(spark, sf).collect()
    }
    li = load_table(spark, sf, "lineitem")
    want = {
        r.l_returnflag: (r.n_rows, round(r.sum_price, 2))
        for r in li.filter(
            F.col("l_quantity").between(*_Z_QTY)
            & F.col("l_extendedprice").between(*_Z_PRICE)
        )
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("sum_price"),
        )
        .collect()
    }
    assert got == want and got

    import os

    tag = f"{hashlib.sha256(sf.encode()).hexdigest()[:12]}_{os.getpid()}"
    store = Path(tempfile.gettempdir()) / f"spark_graft_zstore_{tag}" / "lineitem_z"
    files = sorted(store.glob("*.parquet"))
    assert len(files) == 8
    candidates = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        stats = {}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema in ("l_quantity", "l_extendedprice") and c.statistics:
                    lo, hi = stats.get(c.path_in_schema, (float("inf"), float("-inf")))
                    stats[c.path_in_schema] = (
                        min(lo, c.statistics.min), max(hi, c.statistics.max)
                    )
        q, p = stats["l_quantity"], stats["l_extendedprice"]
        if q[0] <= _Z_QTY[1] and q[1] >= _Z_QTY[0] and p[0] <= _Z_PRICE[1] and p[1] >= _Z_PRICE[0]:
            candidates += 1
    # the predicate box covers ~6% of (qty, price) space; Morton
    # clustering must let footer stats rule out at least half the files
    assert candidates <= 4, candidates


def test_compaction_collapses_files_and_keeps_stats(spark, tmp_path):
    """layout.compact_files: 64 splinter files collapse to the
    size-targeted count, rows round-trip exactly, and the sorted
    rewrite keeps narrow per-file min/max stats on the sort key
    (compaction must not destroy clustering)."""
    from legal_data_ingestion_rag_pipeline_spark.operators.layout import (
        compact_files,
        small_file_report,
    )
    from legal_data_ingestion_rag_pipeline_spark.session import load_table

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    frag, tidy = str(tmp_path / "frag"), str(tmp_path / "tidy")
    li.repartition(64).write.mode("overwrite").parquet(frag)
    before = small_file_report(spark, frag)
    assert before["n_files"] == 64

    n = compact_files(spark, frag, tidy, target_file_bytes=1 << 20,
                      sort_col="l_orderkey")
    after = small_file_report(spark, tidy)
    assert after["n_files"] == n < 64
    assert spark.read.parquet(tidy).count() == li.count()

    # range-sorted rewrite: per-file key ranges must not all span the
    # whole table (the signature of preserved clustering)
    import pyarrow.parquet as pq

    ranges = []
    for f in sorted((tmp_path / "tidy").glob("*.parquet")):
        md = pq.ParquetFile(f).metadata
        los, his = [], []
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == "l_orderkey" and c.statistics:
                    los.append(c.statistics.min)
                    his.append(c.statistics.max)
        if los:
            ranges.append((min(los), max(his)))
    if len(ranges) > 1:
        full = max(h for _, h in ranges) - min(l for l, _ in ranges)
        assert all((h - l) < full for l, h in sorted(ranges))


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Bucketed co-located join: two tables bucketed+sorted on the
    join key join with ZERO shuffle exchanges — the pre-shuffled
    layout whose write-once cost amortizes over every future join.
    (Bucket scans are per-session tables; names are test-unique.)"""
    import os

    from legal_data_ingestion_rag_pipeline_spark.session import load_table

    sf = "/root/testdata/sf0.001"
    tag = f"t{os.getpid()}"
    t_ord, t_li = f"tb_orders_{tag}", f"tb_lineitem_{tag}"
    load_table(spark, sf, "orders").write.bucketBy(4, "o_orderkey").sortBy(
        "o_orderkey"
    ).mode("overwrite").saveAsTable(t_ord)
    load_table(spark, sf, "lineitem").write.bucketBy(4, "l_orderkey").sortBy(
        "l_orderkey"
    ).mode("overwrite").saveAsTable(t_li)
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the shuffle-join path: at test scale AQE would broadcast
        # the tiny tables, hiding exactly the Exchange this test checks
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        o = spark.table(t_ord)
        li = spark.table(t_li)
        joined = o.join(li, li.l_orderkey == o.o_orderkey).groupBy(
            "l_returnflag"
        ).count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        join_part = plan.split("HashAggregate")[-1]  # below the final agg
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange hashpartitioning" not in join_part, join_part[:500]
        # row parity with the plain join
        plain = (
            load_table(spark, sf, "orders")
            .join(
                load_table(spark, sf, "lineitem"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("l_returnflag")
            .count()
        )
        got = {r.l_returnflag: r["count"] for r in joined.collect()}
        want = {r.l_returnflag: r["count"] for r in plain.collect()}
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.sql(f"DROP TABLE IF EXISTS {t_ord}")
        spark.sql(f"DROP TABLE IF EXISTS {t_li}")
