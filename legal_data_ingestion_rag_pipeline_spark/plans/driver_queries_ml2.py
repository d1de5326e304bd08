"""Driver queries: graph-text and factorization training operators
(round 8, second ML batch) — exactly two families, each implemented
and registered in this module:

- textrank_keywords   — TextRank keyword extraction: the word
  co-occurrence graph (adjacent-token pairs, undirected) fed through
  the exact fixed-point PageRank operator (operators/graph.pagerank,
  2 iterations, BIGINT rank units), top-20 words.  The classic
  unsupervised keyword extractor, here as a pure composition of the
  repo's tokenizer parity layer and its iterative-graph machinery.
- als_user_factors_2d — one exactly-solved ALS half-step of implicit
  matrix factorization with d=2 latent factors: item factors are a
  deterministic integer init, each user's normal equations (the 2x2
  Gram and 2-vector RHS) accumulate as exact BIGINT groupBy sums,
  and the ridge-regularized 2x2 solve is CLOSED FORM inside codegen
  (Cramer's rule, micro-snapped once per coordinate).  The
  declarative core of the ALS recommender: per-key d^2 sums + a
  constant-size solve, never a driver-side matrix library.

Conventions as everywhere: exact BIGINT counts/fixed-point units,
each division-to-double micro-snapped once from exact integers,
total-order tie-breaks on every ranking.

No reference-file citation applies: /root/reference stops at
retrieval; these extend the training-side family of
plans/driver_queries_ml.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions import portable as PT
from ..operators import graph
from ..session import load_table
from .registry import register

D = PT.DUCKDB
S = PT.SPARK

_PR_SCALE = graph.PAGERANK_SCALE


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# textrank_keywords
# --------------------------------------------------------------------------

def _textrank_oracle() -> str:
    toks = PT.tokens("coalesce(text, '')", D)
    return f"""
    WITH t AS (SELECT doc_id, {toks} AS w FROM documents),
    big AS (
      SELECT t.w[CAST(g.i AS BIGINT)] AS a,
             t.w[CAST(g.i AS BIGINT) + 1] AS b
      FROM t, unnest(range(1, greatest(len(t.w), 1))) AS g(i)
    ),
    raw AS (SELECT DISTINCT a AS src, b AS dst FROM big WHERE a <> b),
    e AS (SELECT src, dst FROM raw UNION SELECT dst, src FROM raw),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    nn AS (SELECT count(*) AS n FROM nodes),
    deg AS (SELECT src, count(*) AS out_deg FROM e GROUP BY src),
    r0 AS (SELECT node, ({_PR_SCALE} // n) AS rank_units FROM nodes, nn),
    c1 AS (SELECT e.dst AS node, sum(r.rank_units // d.out_deg) AS cin
           FROM e JOIN r0 r ON r.node = e.src JOIN deg d ON d.src = e.src
           GROUP BY e.dst),
    d1 AS (SELECT coalesce(sum(r.rank_units), 0) AS dang
           FROM r0 r LEFT JOIN deg d ON d.src = r.node WHERE d.src IS NULL),
    r1 AS (SELECT nodes.node,
                  ((15 * ({_PR_SCALE} // n)) // 100)
                  + ((85 * (coalesce(c1.cin, 0) + (d1.dang // n))) // 100)
                    AS rank_units
           FROM nodes CROSS JOIN nn CROSS JOIN d1
           LEFT JOIN c1 ON c1.node = nodes.node),
    c2 AS (SELECT e.dst AS node, sum(r.rank_units // d.out_deg) AS cin
           FROM e JOIN r1 r ON r.node = e.src JOIN deg d ON d.src = e.src
           GROUP BY e.dst),
    d2 AS (SELECT coalesce(sum(r.rank_units), 0) AS dang
           FROM r1 r LEFT JOIN deg d ON d.src = r.node WHERE d.src IS NULL),
    r2 AS (SELECT nodes.node,
                  ((15 * ({_PR_SCALE} // n)) // 100)
                  + ((85 * (coalesce(c2.cin, 0) + (d2.dang // n))) // 100)
                    AS rank_units
           FROM nodes CROSS JOIN nn CROSS JOIN d2
           LEFT JOIN c2 ON c2.node = nodes.node)
    SELECT node AS word, CAST(rank_units AS BIGINT) AS rank_units
    FROM r2 ORDER BY rank_units DESC, word LIMIT 20
    """


@register(
    "textrank_keywords",
    oracle=_textrank_oracle(),
    doc="TextRank keyword extraction over the documents corpus: "
    "adjacent-token co-occurrence edges (window 2, undirected, "
    "self-loops dropped) feed the exact fixed-point PageRank "
    "(operators/graph.pagerank, 2 iterations, BIGINT units of 1e-12 "
    "mass — the pagerank_trade_network machinery verbatim), top-20 "
    "words under a (rank DESC, word) total order. Scale: the edge "
    "build is one pass over the token stream; the graph itself is "
    "VOCABULARY-bounded (nodes = distinct words, edges = distinct "
    "bigrams), so the iterations run on a table orders of magnitude "
    "smaller than the corpus — the property that makes TextRank "
    "viable at 100 TB where per-document graphs would not be.",
)
def textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select(
        F.coalesce(F.col("text"), F.lit("")).alias("text")
    )
    toks = PT.tokens("text", S)
    big = docs.select(
        F.posexplode(F.expr(toks)).alias("i", "a"),
        F.expr(toks).alias("w"),
    ).select(
        "a", F.expr("get(w, i + 1)").alias("b")  # 0-based, NULL past the end
    )
    edges = big.filter(
        F.col("b").isNotNull() & (F.col("a") != F.col("b"))
    ).select("a", "b")
    und = edges.union(edges.select(F.col("b"), F.col("a")))
    pr = graph.pagerank(
        und.select(F.col("a").alias("src"), F.col("b").alias("dst")),
        iterations=2,
    )
    return (
        pr.select(F.col("node").alias("word"), "rank_units")
        .orderBy(F.col("rank_units").desc(), "word")
        .limit(20)
    )


# --------------------------------------------------------------------------
# als_user_factors_2d
# --------------------------------------------------------------------------

_ALS_LAMBDA = 10

@register(
    "als_user_factors_2d",
    oracle=f"""
    WITH r AS (
      SELECT o.o_custkey AS u, l.l_partkey AS p,
             CAST(count(*) AS BIGINT) AS r_ui
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_custkey, l.l_partkey
    ),
    f AS (SELECT DISTINCT p, 1 + (p % 7) AS f1, 1 + (p % 11) AS f2 FROM r),
    g AS (
      SELECT r.u, CAST(count(*) AS BIGINT) AS n_items,
             CAST(sum(f.f1 * f.f1) AS BIGINT) AS a11,
             CAST(sum(f.f1 * f.f2) AS BIGINT) AS a12,
             CAST(sum(f.f2 * f.f2) AS BIGINT) AS a22,
             CAST(sum(r.r_ui * f.f1) AS BIGINT) AS b1,
             CAST(sum(r.r_ui * f.f2) AS BIGINT) AS b2
      FROM r JOIN f ON f.p = r.p GROUP BY r.u
    )
    SELECT u, n_items, a11, a12, a22, b1, b2,
           CAST(floor(
             CAST((a22 + {_ALS_LAMBDA}) * b1 - a12 * b2 AS DOUBLE)
             / ((a11 + {_ALS_LAMBDA}) * (a22 + {_ALS_LAMBDA}) - a12 * a12)
             * 1000000.0 + 0.5) AS BIGINT) AS x1_micro,
           CAST(floor(
             CAST((a11 + {_ALS_LAMBDA}) * b2 - a12 * b1 AS DOUBLE)
             / ((a11 + {_ALS_LAMBDA}) * (a22 + {_ALS_LAMBDA}) - a12 * a12)
             * 1000000.0 + 0.5) AS BIGINT) AS x2_micro
    FROM g ORDER BY u
    """,
    doc="one exactly-solved ALS half-step of implicit-feedback matrix "
    "factorization (d=2, ridge lambda=10): item factors are a "
    "deterministic integer init (1 + p mod 7, 1 + p mod 11), each "
    "user's 2x2 Gram matrix and RHS accumulate as exact BIGINT "
    "groupBy sums over their purchase counts, and the regularized "
    "solve is Cramer's rule INSIDE codegen — the d x d solve is "
    "closed-form, so the whole half-step is one join + one groupBy, "
    "no Python, no driver linear algebra. The determinant is "
    "positive by ridge construction; each coordinate divides once "
    "to double and snaps to micro-units (the chi-squared "
    "convention). At scale this is exactly how distributed ALS "
    "iterates: per-key d^2 sums dominate, the solve is free.",
)
def als_user_factors_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    r = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("o_custkey").alias("u"), F.col("l_partkey").alias("p")
        )
        .agg(F.count("*").cast("bigint").alias("r_ui"))
    )
    f = r.select("p").distinct().select(
        "p",
        (F.lit(1) + F.col("p") % 7).alias("f1"),
        (F.lit(1) + F.col("p") % 11).alias("f2"),
    )
    g = (
        r.join(f, "p")
        .groupBy("u")
        .agg(
            F.count("*").cast("bigint").alias("n_items"),
            F.sum(F.col("f1") * F.col("f1")).cast("bigint").alias("a11"),
            F.sum(F.col("f1") * F.col("f2")).cast("bigint").alias("a12"),
            F.sum(F.col("f2") * F.col("f2")).cast("bigint").alias("a22"),
            F.sum(F.col("r_ui") * F.col("f1")).cast("bigint").alias("b1"),
            F.sum(F.col("r_ui") * F.col("f2")).cast("bigint").alias("b2"),
        )
    )
    lam = _ALS_LAMBDA
    det = f"((a11 + {lam}) * (a22 + {lam}) - a12 * a12)"
    return g.select(
        "u",
        "n_items",
        "a11",
        "a12",
        "a22",
        "b1",
        "b2",
        F.expr(
            f"CAST(floor(CAST((a22 + {lam}) * b1 - a12 * b2 AS DOUBLE)"
            f" / {det} * 1000000.0 + 0.5) AS BIGINT)"
        ).alias("x1_micro"),
        F.expr(
            f"CAST(floor(CAST((a11 + {lam}) * b2 - a12 * b1 AS DOUBLE)"
            f" / {det} * 1000000.0 + 0.5) AS BIGINT)"
        ).alias("x2_micro"),
    ).orderBy("u")
