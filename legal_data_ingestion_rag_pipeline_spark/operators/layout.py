"""Z-order (Morton) clustered data layout for multi-dimensional skip.

A single-column sort gives file-level min/max skipping on that column
only; queries filtering on a SECOND column still scan every file.
Interleaving the bits of two rank-normalized columns (the Morton
curve) clusters rows so that every file covers a small rectangle of
(c1, c2) space — both predicates prune files.  This is Delta/Iceberg
OPTIMIZE ZORDER BY; at 100 TB layout is routinely the difference
between scanning 100 TB and 100 GB.

Implementation is pure column expressions:

- each column is min/max-normalized to ``bits`` integer levels using
  bounds computed in ONE tiny aggregate (two scalar literals folded
  into the plan — no per-row rank window, which would be a global
  sort of its own);
- the Morton key is a fold of shifted bit tests (2*bits terms,
  whole-stage codegen);
- the write is repartitionByRange(zkey) + sortWithinPartitions(zkey):
  range partitioning bounds each output file to a contiguous Morton
  segment, i.e. a small spatial rectangle.

Ties/degenerate ranges (constant column) collapse to level 0 safely;
NULL values also land at level 0 (they cluster together at the curve
origin rather than erroring or scattering).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _levels(col: str, lo: float, hi: float, bits: int) -> Column:
    """Min/max-normalize a numeric column to [0, 2^bits - 1] integer
    levels with literal bounds."""
    n = (1 << bits) - 1
    if hi <= lo:
        return F.lit(0).cast("bigint")
    scaled = (F.col(col).cast("double") - F.lit(float(lo))) / F.lit(
        float(hi - lo)
    )
    return F.least(
        F.lit(n).cast("bigint"),
        F.greatest(
            F.lit(0).cast("bigint"),
            F.floor(scaled * F.lit(float(n + 1))).cast("bigint"),
        ),
    )


def morton_key(x: Column, y: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two level columns:
    bit i of x lands at 2i, bit i of y at 2i+1."""
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    out = terms[0]
    for t in terms[1:]:
        out = out.bitwiseOR(t)
    return out


def zorder_by(
    df: DataFrame, c1: str, c2: str, bits: int = 16
) -> DataFrame:
    """Append a ``_zkey`` Morton column over (c1, c2).  One scalar
    min/max aggregate; everything else is map-side codegen."""
    row = df.agg(
        F.min(F.col(c1).cast("double")),
        F.max(F.col(c1).cast("double")),
        F.min(F.col(c2).cast("double")),
        F.max(F.col(c2).cast("double")),
    ).first()
    lo1, hi1, lo2, hi2 = (float(v) if v is not None else 0.0 for v in row)
    key = morton_key(
        _levels(c1, lo1, hi1, bits), _levels(c2, lo2, hi2, bits), bits
    )
    return df.withColumn("_zkey", key)


def write_zordered(
    df: DataFrame,
    path: str,
    c1: str,
    c2: str,
    n_files: int,
    bits: int = 16,
) -> None:
    """Write parquet clustered along the Morton curve of (c1, c2):
    each output file covers a contiguous curve segment, so min/max
    footer stats on BOTH columns are narrow and both predicates skip
    files."""
    (
        zorder_by(df, c1, c2, bits)
        .repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def small_file_report(spark, path: str) -> dict:
    """File-size diagnostic for a parquet table: the small-file
    problem is THE steady-state killer of big tables (every file is a
    task + a footer fetch + an open; 100k x 1 MB files make a scan
    scheduler-bound, not IO-bound).  Returns counts/bytes from the
    file listing — driver-side metadata only, no data read."""
    import os

    files = [
        f[len("file:"):] if f.startswith("file:") else f
        for f in spark.read.parquet(path).inputFiles()
    ]
    sizes = [os.path.getsize(f) for f in files]
    return {
        "n_files": len(sizes),
        "total_bytes": sum(sizes),
        "min_bytes": min(sizes) if sizes else 0,
        "max_bytes": max(sizes) if sizes else 0,
    }


def compact_files(
    spark,
    src: str,
    dst: str,
    target_file_bytes: int = 128 << 20,
    sort_col: str | None = None,
) -> int:
    """Rewrite a fragmented parquet table into ~target-sized files —
    the OPTIMIZE/rewriteDataFiles maintenance operation.  File count
    is sized from the source listing; with ``sort_col`` the rewrite
    goes through repartitionByRange + sortWithinPartitions so the
    compacted files keep narrow min/max footer stats on the sort key
    (compaction should never destroy clustering — a plain
    repartition() would).  Returns the file count written.  One full
    shuffle of the table by construction; at 100 TB this runs
    per-partition (compact yesterday's directory), never whole-table.
    """
    import math

    rep = small_file_report(spark, src)
    n = max(1, math.ceil(rep["total_bytes"] / float(target_file_bytes)))
    df = spark.read.parquet(src)
    if sort_col is not None:
        df = df.repartitionByRange(n, sort_col).sortWithinPartitions(sort_col)
    else:
        df = df.repartition(n)
    df.write.mode("overwrite").parquet(dst)
    return n
