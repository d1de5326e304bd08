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
