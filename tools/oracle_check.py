"""Driver-style correctness harness: run every registered query on
Spark AND its DuckDB oracle, compare row count, schema shape, and an
order-insensitive value hash — the same gate the driver applies.

Usage:
    python tools/oracle_check.py [--sf /root/testdata/sf0.01] [--only name[,name]]
"""

from __future__ import annotations

import argparse
import hashlib
import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import duckdb  # noqa: E402

from legal_data_ingestion_rag_pipeline_spark.plans.driver_queries import registry  # noqa: E402
from legal_data_ingestion_rag_pipeline_spark.session import TABLES, build_session  # noqa: E402


def canon(v) -> str:
    """Canonical string for one cell.

    INTENTIONAL conflation: float NaN canonicalizes to "<null>" — a
    nullable float column fetched through pandas delivers NULL as NaN
    on BOTH engines, so the two are indistinguishable at this layer;
    the cost is that a genuine Spark-NaN vs oracle-NULL difference
    would pass. Timezone-aware timestamps are normalized to UTC-naive
    before formatting so the same instant canonicalizes identically
    regardless of which engine attached a zone.
    """
    import datetime as _dt

    import numpy as _np
    import pandas as _pd

    if v is None or v is _pd.NaT:
        return "<null>"
    if isinstance(v, _np.ndarray):
        v = v.tolist()
    if isinstance(v, _np.generic):
        v = v.item()
    if isinstance(v, float):
        if math.isnan(v):
            return "<null>"
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    # normalize date-ish values: pandas Timestamp / datetime at midnight
    # print as bare dates so Spark DateType and DuckDB DATE-as-datetime64
    # canonicalize identically.
    if isinstance(v, (_pd.Timestamp, _dt.datetime)):
        if v.tzinfo is not None:  # same instant, zone-independent form
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        if (v.hour, v.minute, v.second, v.microsecond) == (0, 0, 0, 0):
            return v.strftime("%Y-%m-%d")
        return str(v)
    return str(v)


def df_rows(df):
    """pandas DataFrame -> list of plain tuples (the driver compares
    through pandas, so integer-typed DuckDB HUGEINT sums arrive as
    float64 — fetching this way makes the harness catch that class of
    mismatch instead of hiding it behind fetchall()'s Python ints)."""
    return [tuple(r) for r in df.itertuples(index=False, name=None)]


def value_hash(rows, colnames) -> str:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("\x01".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    ap.add_argument(
        "--vanilla",
        action="store_true",
        help="use a bare SparkSession like the correctness driver does "
        "(no build_session confs) — catches conf-dependency bugs",
    )
    args = ap.parse_args()

    if args.vanilla:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("oracle_check_vanilla")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("WARN")
    else:
        spark = build_session("oracle_check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    names = args.only.split(",") if args.only else None
    reg = registry()
    failures = 0
    for name, spec in reg.items():
        if names and name not in names:
            continue
        try:
            sdf = spec.spark(spark, args.sf)
            spdf = sdf.toPandas()
            srows = df_rows(spdf)
            scols = list(spdf.columns)
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        osql = spec.oracle_sql(args.sf)
        if osql is None:
            print(f"ROWS {name}: {len(srows)} rows (no oracle, rows-only check)")
            continue
        try:
            ddf = con.execute(osql).fetch_df()
            dcols = list(ddf.columns)
            drows = df_rows(ddf)
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rows {len(srows)} vs {len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols {sorted(scols)} vs {sorted(dcols)}")
        if not problems:
            sh, dh = value_hash(srows, scols), value_hash(drows, dcols)
            if sh != dh:
                problems.append("value hash mismatch")
                # show first differing canonical line for debugging
                so = sorted(range(len(scols)), key=lambda i: scols[i])
                do = sorted(range(len(dcols)), key=lambda i: dcols[i])
                sset = sorted("\x01".join(canon(r[i]) for i in so) for r in srows)
                dset = sorted("\x01".join(canon(r[i]) for i in do) for r in drows)
                for a, b in zip(sset, dset):
                    if a != b:
                        problems.append(f"  spark: {a[:200]}")
                        problems.append(f"  duck : {b[:200]}")
                        break
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems[:1]) + "")
            for p in problems[1:]:
                print(p)
            failures += 1
        else:
            print(f"OK   {name}: {len(srows)} rows")
    print(f"\n{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'} "
          f"({len([n for n in reg if not names or n in names])} queries)")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
