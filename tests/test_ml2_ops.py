"""Invariants + Python twins for the graph-text / factorization
family (plans/driver_queries_ml2.py)."""

from __future__ import annotations

import math

import duckdb

from legal_data_ingestion_rag_pipeline_spark.plans.registry import registry

SF = "/root/testdata/sf0.001"


def _run(spark, name):
    return registry()[name].spark(spark, SF).collect()


def test_textrank_ranks_are_positive_mass_units(spark):
    rows = _run(spark, "textrank_keywords")
    assert len(rows) == 20
    units = [r["rank_units"] for r in rows]
    assert units == sorted(units, reverse=True)
    # every rank is positive and no single word holds >50% of the mass
    for u in units:
        assert 0 < u < 500_000_000_000
    # top words are real corpus tokens
    con = duckdb.connect()
    vocab = {
        r[0]
        for r in con.execute(
            f"""SELECT DISTINCT t.w FROM (
                  SELECT unnest(string_split_regex(lower(coalesce(text, '')),
                                                   '\\s+')) AS w
                  FROM '{SF}/documents.parquet') t WHERE t.w <> ''"""
        ).fetchall()
    }
    for r in rows:
        assert r["word"] in vocab


def test_textrank_high_degree_words_outrank_rare_ones(spark):
    """PageRank on a co-occurrence graph must put the most connected
    words on top: the top-20 set should overlap heavily with the
    top-20 by distinct-neighbor degree."""
    rows = _run(spark, "textrank_keywords")
    con = duckdb.connect()
    deg_top = {
        r[0]
        for r in con.execute(
            f"""WITH t AS (SELECT doc_id,
                  list_filter(string_split_regex(lower(coalesce(text, '')),
                                                 '\\s+'),
                              x -> x <> '') AS w
                FROM '{SF}/documents.parquet'),
            big AS (SELECT t.w[CAST(g.i AS BIGINT)] AS a,
                           t.w[CAST(g.i AS BIGINT) + 1] AS b
                    FROM t, unnest(range(1, greatest(len(t.w), 1))) AS g(i)),
            e AS (SELECT DISTINCT a, b FROM (
                    SELECT a, b FROM big WHERE a <> b
                    UNION ALL SELECT b, a FROM big WHERE a <> b))
            SELECT a FROM e GROUP BY a
            ORDER BY count(*) DESC, a LIMIT 20"""
        ).fetchall()
    }
    got = {r["word"] for r in rows}
    assert len(got & deg_top) >= 15


def test_als_factors_match_python_solve(spark):
    rows = _run(spark, "als_user_factors_2d")
    con = duckdb.connect()
    ratings = con.execute(
        f"""SELECT o.o_custkey, l.l_partkey, count(*)
            FROM '{SF}/lineitem.parquet' l
            JOIN '{SF}/orders.parquet' o ON l.l_orderkey = o.o_orderkey
            GROUP BY 1, 2"""
    ).fetchall()
    by_u: dict[int, list] = {}
    for u, p, r in ratings:
        by_u.setdefault(u, []).append((p, r))
    lam = 10
    expect = {}
    for u, items in by_u.items():
        a11 = a12 = a22 = b1 = b2 = 0
        for p, r in items:
            f1, f2 = 1 + p % 7, 1 + p % 11
            a11 += f1 * f1
            a12 += f1 * f2
            a22 += f2 * f2
            b1 += r * f1
            b2 += r * f2
        det = (a11 + lam) * (a22 + lam) - a12 * a12
        x1 = math.floor(((a22 + lam) * b1 - a12 * b2) / det * 1e6 + 0.5)
        x2 = math.floor(((a11 + lam) * b2 - a12 * b1) / det * 1e6 + 0.5)
        expect[u] = (len(items), a11, a12, a22, b1, b2, x1, x2)
    assert len(rows) == len(expect)
    for r in rows:
        assert expect[r["u"]] == (
            r["n_items"],
            r["a11"],
            r["a12"],
            r["a22"],
            r["b1"],
            r["b2"],
            r["x1_micro"],
            r["x2_micro"],
        )


def test_als_solution_satisfies_normal_equations(spark):
    """(A + lam I) x ~= b within micro-snap tolerance, and the ridge
    keeps the solve strictly diagonally dominated (det > 0)."""
    rows = _run(spark, "als_user_factors_2d")
    lam = 10
    for r in rows[:100]:
        det = (r["a11"] + lam) * (r["a22"] + lam) - r["a12"] ** 2
        assert det > 0
        x1, x2 = r["x1_micro"] / 1e6, r["x2_micro"] / 1e6
        r1 = (r["a11"] + lam) * x1 + r["a12"] * x2
        r2 = r["a12"] * x1 + (r["a22"] + lam) * x2
        # residual bounded by snap quantum times matrix norm
        tol = (r["a11"] + r["a12"] + r["a22"] + 2 * lam) * 1e-6 + 1e-9
        assert abs(r1 - r["b1"]) <= tol
        assert abs(r2 - r["b2"]) <= tol


def test_information_gain_is_nonnegative_and_bounded(spark):
    rows = _run(spark, "information_gain_ranking")
    assert {r["feature"] for r in rows} == {
        "segment",
        "nation",
        "status",
        "month",
    }
    hy = rows[0]["hy_micro"]
    for r in rows:
        assert r["hy_micro"] == hy  # H(Y) is feature-independent
        # 0 <= IG <= H(Y), allowing 1 micro-unit snap slack per piece
        # (each value contributes two snapped pieces)
        slack = 2 * r["n_values"] + 2
        assert -slack <= r["ig_micro"] <= hy + slack
        assert r["cond_micro"] >= 0
    igs = [r["ig_micro"] for r in rows]
    assert igs == sorted(igs, reverse=True)


def test_information_gain_constant_feature_is_zero(spark):
    """A feature with a single value cannot reduce entropy: its
    conditional entropy equals H(Y) up to snap slack.  Verified via a
    Python twin on the binary-entropy identity."""
    import duckdb

    rows = {r["feature"]: r for r in _run(spark, "information_gain_ranking")}
    con = duckdb.connect()
    n, p = con.execute(
        f"""SELECT count(*),
                   sum(CASE WHEN o_orderpriority = '1-URGENT'
                            THEN 1 ELSE 0 END)
            FROM '{SF}/orders.parquet'"""
    ).fetchone()
    hy = math.floor((p / n) * -math.log(p / n) * 1e6 + 0.5) + math.floor(
        ((n - p) / n) * -math.log((n - p) / n) * 1e6 + 0.5
    )
    assert rows["segment"]["hy_micro"] == hy


def test_holt_matches_python_truncating_walk(spark):
    rows = _run(spark, "holt_linear_daily")
    import duckdb

    con = duckdb.connect()
    daily = dict(
        ((r[0], r[1]), r[2])
        for r in con.execute(
            f"""SELECT c.c_mktsegment,
                   CAST(CAST(o.o_orderdate AS DATE) - DATE '1995-01-01'
                        AS BIGINT),
                   sum(CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT))
            FROM '{SF}/orders.parquet' o
            JOIN '{SF}/customer.parquet' c ON o.o_custkey = c.c_custkey
            GROUP BY 1, 2"""
        ).fetchall()
    )
    days = sorted({d for (_, d) in daily})
    lo, hi = days[0], days[-1]
    segs = sorted({s for (s, _) in daily})

    def trunc_half(a: int) -> int:
        q = abs(a) // 2
        return q if a >= 0 else -q

    expect = []
    for s in segs:
        lv, tr = None, 0
        for d in range(lo, hi + 1):
            x = daily.get((s, d), 0)
            if lv is None:
                lv, tr = x, 0
            else:
                nl = trunc_half(x + lv + tr)
                tr = trunc_half(tr + (nl - lv))
                lv = nl
            expect.append((s, d, x, lv, tr))
    got = [
        (r["segment"], r["d"], r["x"], r["level"], r["trend"]) for r in rows
    ]
    assert got == expect
