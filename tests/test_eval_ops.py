"""Invariants for the model-evaluation family
(plans/driver_queries_eval.py)."""

from __future__ import annotations

import duckdb

from legal_data_ingestion_rag_pipeline_spark.plans.registry import registry

SF = "/root/testdata/sf0.001"


def _run(spark, name):
    return registry()[name].spark(spark, SF).collect()


def test_nmi_is_a_valid_normalized_score(spark):
    rows = _run(spark, "clustering_nmi_purity")
    assert len(rows) == 8
    con = duckdb.connect()
    n_vecs = con.execute(
        f"SELECT count(*) FROM '{SF}/embeddings.parquet'"
    ).fetchone()[0]
    assert sum(r["n_members"] for r in rows) == n_vecs
    nmi = rows[0]["nmi_micro"]
    purity_n = 0
    for r in rows:
        assert r["nmi_micro"] == nmi  # corpus-level constant
        assert 0 < r["top_label_n"] <= r["n_members"]
        # majority label holds at least 1/|labels| of the cluster
        assert r["top_label_n"] * 10 >= r["n_members"]
        purity_n += r["top_label_n"]
    # NMI in [0, 1] and entropies positive (snap slack of the summed
    # pieces is far below one micro-unit of headroom here)
    assert 0 <= nmi <= 1_000_000
    assert rows[0]["hc_micro"] > 0 and rows[0]["hl_micro"] > 0
    assert rows[0]["mi_micro"] >= 0
    # purity can never be below random assignment
    n_labels = con.execute(
        f"SELECT count(DISTINCT label) FROM '{SF}/embeddings.parquet'"
    ).fetchone()[0]
    assert purity_n * n_labels >= n_vecs


def test_rolling_regression_matches_python_on_one_window(spark):
    rows = _run(spark, "rolling_regression_28d")
    # constant dense design: every window has exactly 28 days and the
    # same positive denominator
    for r in rows[:200]:
        assert r["n"] == 28
        den = r["n"] * r["sxx"] - r["sx"] * r["sx"]
        assert den > 0
    # windows slide by one day per row within a segment
    seg0 = [r for r in rows if r["segment"] == rows[0]["segment"]]
    ds = [r["d"] for r in seg0]
    assert ds == list(range(ds[0], ds[0] + len(ds)))
    # python twin on an arbitrary row
    probe = seg0[100]
    con = duckdb.connect()
    daily = dict(
        (r[0], r[1])
        for r in con.execute(
            f"""SELECT CAST(CAST(o.o_orderdate AS DATE) - DATE '1995-01-01'
                            AS BIGINT),
                       sum(CAST(floor(o.o_totalprice * 100.0 + 0.5)
                                AS BIGINT))
                FROM '{SF}/orders.parquet' o
                JOIN '{SF}/customer.parquet' c
                  ON o.o_custkey = c.c_custkey
                WHERE c.c_mktsegment = ?
                GROUP BY 1""",
            [probe["segment"]],
        ).fetchall()
    )
    import math

    xs = list(range(probe["d"] - 27, probe["d"] + 1))
    ys = [daily.get(d, 0) for d in xs]
    n = 28
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    assert (probe["sx"], probe["sy"], probe["sxy"], probe["sxx"]) == (
        sx,
        sy,
        sxy,
        sxx,
    )
    expect = math.floor(
        (n * sxy - sx * sy) / (n * sxx - sx * sx) * 1e6 + 0.5
    )
    assert probe["slope_micro"] == expect
