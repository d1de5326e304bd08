"""Measure time-vs-rows scaling exponents for the heavy
LLM-pipeline operators (round-9 verdict ask #5): run each query at
sf0.01 and sf0.1 (cold + median of 3 warm, the bench.py
methodology), divide by the driving table's row growth, and report
exponent = log(t_hi / t_lo) / log(rows_hi / rows_lo).

An exponent <= ~1.2 is empirical evidence the operator's cost is
near-linear in its input over the measurable range — the 100 TB
design claims (banded LSH, prefix-filter pruning, trained-IVF
bucketing, degree-oriented wedge join) made measurable.  Exponents
are biased DOWN by fixed per-job overhead at these sizes; an
exponent well above the design's expectation is the red flag.

Usage:
    python tools/scale_slope.py [--lo sf0.01] [--hi sf0.1]
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import duckdb  # noqa: E402

from legal_data_ingestion_rag_pipeline_spark.plans.driver_queries import registry  # noqa: E402
from legal_data_ingestion_rag_pipeline_spark.session import build_session  # noqa: E402

# (query, driving table) — the table whose row count the operator's
# cost is claimed linear-ish in.
TARGETS = [
    ("dedup_minhash_lsh", "documents"),
    ("dedup_prefix_jaccard", "documents"),
    ("boilerplate_segment_removal", "documents"),
    ("dbscan_ivf_clusters", "embeddings"),
    ("triangle_count_copurchase", "lineitem"),
    # round-11 additions
    ("dsir_importance_resampling", "documents"),
    ("sequence_packing_stats", "documents"),
    ("rm3_prf_expansion", "documents"),
    ("ktruss_copurchase", "lineitem"),
    ("tfidf_keyphrases", "documents"),
    # round-12 additions
    ("knn_shapley_values", "embeddings"),
    ("harmonic_centrality_copurchase", "lineitem"),
    ("geometric_median_labels", "embeddings"),
    ("bm25f_fielded_search", "documents"),
    ("levenshtein_blocked_pairs", "part"),
    # round-13 additions
    ("simrank_copurchase", "lineitem"),
    ("mst_copurchase_backbone", "lineitem"),
    ("c4_heuristic_line_filter", "documents"),
    ("corr_matrix_lineitem", "lineitem"),
    # round-13 second batch
    ("hyperanf_neighborhood", "lineitem"),
    ("plsa_topics_em", "documents"),
    ("mlp_quality_inference", "embeddings"),
    ("fts_maxscore_pruned_search", "documents"),
    ("ldp_randomized_response", "events"),
    ("mondrian_k_anonymize", "customer"),
    ("scc_subsequent_parts", "lineitem"),
]


def rows(sf_dir: str, table: str) -> int:
    return duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{sf_dir}/{table}.parquet')"
    ).fetchone()[0]


def time_query(spark, spec, sf_dir: str) -> float:
    runs = []
    for _ in range(4):
        t0 = time.perf_counter()
        df = spec.spark(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
    return sorted(runs[1:])[1]  # median of 3 warm (bench.py convention)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lo", default="/root/testdata/sf0.01")
    ap.add_argument("--hi", default="/root/testdata/sf0.1")
    ap.add_argument("--only", default=None, help="comma-separated query names")
    args = ap.parse_args()

    spark = build_session("scale_slope")
    # warm the session/Python-worker pool (bench.py convention)
    from pyspark.sql import functions as F

    spark.range(100_000).repartition(8).groupBy(
        (F.col("id") % 7).alias("k")
    ).count().write.format("noop").mode("overwrite").save()
    par = spark.sparkContext.defaultParallelism
    spark.range(par * 4).repartition(par).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    reg = registry()
    targets = TARGETS
    if args.only:
        keep = set(args.only.split(","))
        targets = [(n, t) for n, t in TARGETS if n in keep]
    out = []
    for name, table in targets:
        spec = reg[name]
        r_lo, r_hi = rows(args.lo, table), rows(args.hi, table)
        if r_hi <= r_lo:
            print(f"SKIP {name}: no row growth ({r_lo} -> {r_hi})")
            continue
        t_lo = time_query(spark, spec, args.lo)
        t_hi = time_query(spark, spec, args.hi)
        exp = math.log(t_hi / t_lo) / math.log(r_hi / r_lo)
        out.append(
            {
                "query": name,
                "table": table,
                "rows_lo": r_lo,
                "rows_hi": r_hi,
                "sec_lo": round(t_lo, 2),
                "sec_hi": round(t_hi, 2),
                "exponent": round(exp, 2),
            }
        )
        print(
            f"{name}: {table} {r_lo}->{r_hi} rows, "
            f"{t_lo:.2f}s -> {t_hi:.2f}s, exponent {exp:.2f}"
        )
    print(json.dumps({"scale_slopes": out}))


if __name__ == "__main__":
    main()
