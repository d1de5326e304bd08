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


def test_wasserstein_identity_and_zero_self_distance(spark):
    rows = _run(spark, "wasserstein_price_distance")
    assert len(rows) == 10
    w1 = rows[0]["w1_num"]
    contribs = [r["contrib"] for r in rows]
    assert contribs == sorted(contribs, reverse=True)
    con = duckdb.connect()
    # python twin of the full distance
    data = con.execute(
        f"""SELECT CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)
                   // 10000 AS bin, l_returnflag
            FROM '{SF}/lineitem.parquet'
            WHERE l_returnflag IN ('R', 'N')"""
    ).fetchall()
    from collections import Counter

    cr = Counter(b for b, f in data if f == "R")
    cn = Counter(b for b, f in data if f == "N")
    n_r, n_n = sum(cr.values()), sum(cn.values())
    lo = min(min(cr), min(cn))
    hi = max(max(cr), max(cn))
    cum_r = cum_n = 0
    total = 0
    per_bin = {}
    for b in range(lo, hi + 1):
        cum_r += cr.get(b, 0)
        cum_n += cn.get(b, 0)
        c = abs(cum_r * n_n - cum_n * n_r)
        per_bin[b] = (cum_r, cum_n, c)
        total += c
    assert w1 == total
    for r in rows:
        er, en, ec = per_bin[r["bin"]]
        assert (r["cum_r"], r["cum_n"], r["contrib"]) == (er, en, ec)
    import math

    assert rows[0]["w1_milli_bins"] == math.floor(
        total / (n_r * n_n) * 1000 + 0.5
    )


def test_position_attribution_conserves_credit(spark):
    rows = _run(spark, "position_based_attribution")
    con = duckdb.connect()
    # total credit = sum over converters of (1e6 minus the documented
    # floor leak 200000 - (k-2)*(200000 DIV (k-2)) for k >= 3)
    ks = [
        k
        for (k,) in con.execute(
            f"""WITH conv AS (SELECT user_id, min(ts) AS cts
                  FROM '{SF}/events.parquet' WHERE event_type = 'purchase'
                  GROUP BY user_id)
                SELECT count(*) AS k
                FROM '{SF}/events.parquet' e JOIN conv USING (user_id)
                WHERE e.ts < conv.cts AND e.event_type <> 'purchase'
                GROUP BY e.user_id"""
        ).fetchall()
    ]
    expect_total = 0
    for k in ks:
        if k <= 2:
            expect_total += 1_000_000
        else:
            expect_total += 800_000 + (k - 2) * (200_000 // (k - 2))
    assert sum(r["credit_micro_total"] for r in rows) == expect_total
    assert sum(r["n_touches"] for r in rows) == sum(ks)
    for r in rows:
        assert r["credit_micro_total"] > 0
        assert r["channel"] != "purchase"
