"""Invariants for the privacy-audit / profiling family
(plans/driver_queries_profiling.py)."""

from __future__ import annotations

import duckdb

from legal_data_ingestion_rag_pipeline_spark.plans.registry import registry

SF = "/root/testdata/sf0.001"


def _run(spark, name):
    return registry()[name].spark(spark, SF).collect()


def test_k_anonymity_is_monotone_in_k(spark):
    rows = _run(spark, "k_anonymity_audit")
    assert [r["k"] for r in rows] == [2, 5, 10, 25]
    prev_c = prev_r = -1
    for r in rows:
        # raising k can only expose more classes/rows
        assert r["n_classes_below"] >= prev_c
        assert r["n_rows_below"] >= prev_r
        assert 0 <= r["n_classes_below"] <= r["n_classes"]
        assert 0 <= r["pct_rows_micro"] <= 1_000_000
        prev_c, prev_r = r["n_classes_below"], r["n_rows_below"]
    # every class below k has size < k, so rows_below < k * classes_below
    for r in rows:
        assert r["n_rows_below"] < r["k"] * max(r["n_classes_below"], 1) or (
            r["n_classes_below"] == 0 and r["n_rows_below"] == 0
        )


def test_l_diversity_partitions_all_classes(spark):
    rows = _run(spark, "l_diversity_audit")
    con = duckdb.connect()
    n_classes, n_rows = con.execute(
        f"""SELECT count(*), sum(n) FROM (
              SELECT c.c_mktsegment, c.c_nationkey, count(*) AS n
              FROM '{SF}/orders.parquet' o
              JOIN '{SF}/customer.parquet' c ON o.o_custkey = c.c_custkey
              GROUP BY 1, 2)"""
    ).fetchone()
    assert sum(r["n_classes"] for r in rows) == n_classes
    assert sum(r["n_rows"] for r in rows) == n_rows
    for r in rows:
        assert 1 <= r["l"] <= 5  # sensitive domain is the 5 priorities


def test_quantile_normalization_is_monotone(spark):
    rows = _run(spark, "quantile_normalization_deciles")
    assert [r["d"] for r in rows] == list(range(1, 11))
    for lo, hi in zip(rows, rows[1:]):
        # a monotone map of a monotone probe stays monotone on both axes
        assert lo["a_rank"] < hi["a_rank"]
        assert lo["a_cents"] <= hi["a_cents"]
        assert lo["b_rank"] <= hi["b_rank"]
        assert lo["b_cents"] <= hi["b_cents"]
    # the top decile maps extremes to extremes
    con = duckdb.connect()
    mx_b = con.execute(
        f"""SELECT max(CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT))
            FROM '{SF}/customer.parquet'
            WHERE c_mktsegment = 'AUTOMOBILE'"""
    ).fetchone()[0]
    assert rows[-1]["b_cents"] == mx_b


def test_table_profile_matches_duckdb_facts(spark):
    rows = {r["col_name"]: r for r in _run(spark, "table_profile_orders")}
    assert set(rows) == {
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_orderpriority",
        "total_cents",
        "order_date",
    }
    con = duckdb.connect()
    n, n_keys = con.execute(
        f"SELECT count(*), count(DISTINCT o_orderkey)"
        f" FROM '{SF}/orders.parquet'"
    ).fetchone()
    for r in rows.values():
        assert r["n"] == n
        assert r["n_null"] == 0
        assert r["modal_n"] >= 1
        assert r["min_repr"] <= r["max_repr"]
    # a unique key column: every value distinct, modal count 1
    assert rows["o_orderkey"]["n_distinct"] == n_keys == n
    assert rows["o_orderkey"]["modal_n"] == 1
    assert rows["o_orderstatus"]["n_distinct"] <= 3
