"""Driver queries: graph-text and factorization training operators
(round 8, second ML batch) — exactly four families, each implemented
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
- information_gain_ranking — categorical feature selection: the
  information gain of four candidate features against the URGENT
  label from ONE stacked pass (the categorical complement of
  stump_split_search's numeric split search), every entropy piece
  micro-snapped from exact integer counts.
- holt_linear_daily  — Holt double exponential smoothing (level +
  linear trend, alpha=beta=1/2) over each segment's dense daily
  revenue series in exact truncating-integer arithmetic
  (operators/recurrence.holt_linear); the oracle replays the
  two-state walk with a recursive CTE.

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


# --------------------------------------------------------------------------
# information_gain_ranking
# --------------------------------------------------------------------------

_IG_PIECE = (
    "CASE WHEN {c} > 0 THEN CAST(floor((CAST({c} AS DOUBLE) / {den_w})"
    " * (-ln(CAST({c} AS DOUBLE) / {den_p})) * 1000000.0 + 0.5) AS BIGINT)"
    " ELSE 0 END"
)


def _ig_oracle() -> str:
    piece = _IG_PIECE
    return f"""
    WITH j AS (
      SELECT c.c_mktsegment AS segment,
             CAST(c.c_nationkey AS VARCHAR) AS nation,
             o.o_orderstatus AS status,
             CAST(month(CAST(o.o_orderdate AS DATE)) AS VARCHAR) AS mth,
             CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    stacked AS (
      SELECT 'segment' AS feature, segment AS val, y FROM j
      UNION ALL SELECT 'nation', nation, y FROM j
      UNION ALL SELECT 'status', status, y FROM j
      UNION ALL SELECT 'month', mth, y FROM j
    ),
    pv AS (SELECT feature, val, CAST(count(*) AS BIGINT) AS n_v,
                  CAST(sum(y) AS BIGINT) AS pos_v
           FROM stacked GROUP BY feature, val),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(y) AS BIGINT) AS p FROM j),
    hy AS (
      SELECT ({piece.format(c="p", den_w="n", den_p="n")})
           + ({piece.format(c="(n - p)", den_w="n", den_p="n")}) AS hy_micro
      FROM tot
    ),
    cond AS (
      SELECT pv.feature, CAST(count(*) AS BIGINT) AS n_values,
             CAST(sum(({piece.format(c="pv.pos_v", den_w="tot.n",
                                     den_p="pv.n_v")})
                    + ({piece.format(c="(pv.n_v - pv.pos_v)", den_w="tot.n",
                                     den_p="pv.n_v")})) AS BIGINT)
               AS cond_micro
      FROM pv, tot GROUP BY pv.feature
    )
    SELECT cond.feature, cond.n_values, hy.hy_micro, cond.cond_micro,
           hy.hy_micro - cond.cond_micro AS ig_micro
    FROM cond, hy
    ORDER BY ig_micro DESC, cond.feature
    """


@register(
    "information_gain_ranking",
    oracle=_ig_oracle(),
    doc="categorical feature selection by information gain against "
    "the URGENT-priority label: market segment, nation, order "
    "status, and order month ranked by H(Y) - H(Y|X), the "
    "categorical complement of stump_split_search's numeric split "
    "search. ONE stacked pass (Spark stack(), no per-feature "
    "rescan) builds every (feature, value) contingency row; each "
    "entropy piece -w*ln(p) applies ln once to a ratio of exact "
    "BIGINT counts and snaps to micro-units BEFORE the per-feature "
    "sum (the entropy_priority_by_segment convention), so the "
    "ranking is an exact BIGINT comparison. The value tables are "
    "feature-domain-bounded; only the stack scan is fact-scale.",
)
def information_gain_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.col("o_orderstatus").alias("status"),
        F.expr("CAST(month(CAST(o_orderdate AS DATE)) AS STRING)").alias(
            "mth"
        ),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("y"),
    )
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.col("c_nationkey").cast("string").alias("nation"),
    )
    j = o.join(c, o.o_custkey == c.c_custkey)
    stacked = j.select(
        F.expr(
            "stack(4, 'segment', segment, 'nation', nation,"
            " 'status', status, 'month', mth) AS (feature, val)"
        ),
        "y",
    )
    pv = stacked.groupBy("feature", "val").agg(
        F.count("*").cast("bigint").alias("n_v"),
        F.sum("y").cast("bigint").alias("pos_v"),
    )
    tot = j.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("p"),
    )
    piece = _IG_PIECE
    hy = tot.select(
        F.expr(
            f"({piece.format(c='p', den_w='n', den_p='n')})"
            f" + ({piece.format(c='(n - p)', den_w='n', den_p='n')})"
        ).alias("hy_micro")
    )
    cond = (
        pv.crossJoin(F.broadcast(tot))
        .groupBy("feature")
        .agg(
            F.count("*").cast("bigint").alias("n_values"),
            F.sum(
                F.expr(
                    f"({piece.format(c='pos_v', den_w='n', den_p='n_v')})"
                    f" + ({piece.format(c='(n_v - pos_v)', den_w='n', den_p='n_v')})"
                )
            )
            .cast("bigint")
            .alias("cond_micro"),
        )
    )
    return (
        cond.crossJoin(F.broadcast(hy))
        .select(
            "feature",
            "n_values",
            "hy_micro",
            "cond_micro",
            (F.col("hy_micro") - F.col("cond_micro")).alias("ig_micro"),
        )
        .orderBy(F.col("ig_micro").desc(), "feature")
    )


# --------------------------------------------------------------------------
# holt_linear_daily
# --------------------------------------------------------------------------

@register(
    "holt_linear_daily",
    bench=True,
    oracle="""
    WITH RECURSIVE j AS (
      SELECT c.c_mktsegment AS segment,
             CAST(CAST(o.o_orderdate AS DATE) - DATE '1995-01-01' AS BIGINT)
               AS d,
             CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    bounds AS (SELECT min(d) AS mn, max(d) AS mx FROM j),
    days AS (SELECT CAST(g.x AS BIGINT) AS d
             FROM bounds, unnest(range(mn, mx + 1)) AS g(x)),
    segs AS (SELECT DISTINCT segment FROM j),
    daily AS (SELECT segment, d, CAST(sum(cents) AS BIGINT) AS x
              FROM j GROUP BY segment, d),
    grid AS (
      SELECT s.segment, dy.d, CAST(coalesce(daily.x, 0) AS BIGINT) AS x
      FROM segs s CROSS JOIN days dy
      LEFT JOIN daily ON daily.segment = s.segment AND daily.d = dy.d
    ),
    r AS (
      SELECT g.segment, g.d, g.x, g.x AS level, CAST(0 AS BIGINT) AS trend
      FROM grid g, bounds WHERE g.d = bounds.mn
      UNION ALL
      SELECT g.segment, g.d, g.x,
             (g.x + r.level + r.trend) // 2,
             (r.trend + ((g.x + r.level + r.trend) // 2 - r.level)) // 2
      FROM r JOIN grid g ON g.segment = r.segment AND g.d = r.d + 1
    )
    SELECT segment, d, x, level, trend FROM r ORDER BY segment, d
    """,
    doc="Holt double exponential smoothing (level + linear trend, "
    "alpha=beta=1/2) of each segment's dense daily revenue-cents "
    "series: calendar-spine gap fill, then the exact two-state "
    "truncating-integer walk (operators/recurrence.holt_linear — "
    "truncation matches SQL DIV in BOTH engines; Python floor "
    "division would diverge on the negative trend values). The "
    "oracle replays the identical recurrence with a recursive CTE, "
    "so both engines step the coupled (level, trend) state "
    "bit-identically for ~2400 days x 5 segments. The forecasting "
    "counterpart of ewma_event_type_daily's single-state smoother: "
    "trend feedback is what makes it irreducibly sequential.",
)
def holt_linear_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import recurrence

    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr(
            "CAST(datediff(CAST(o_orderdate AS DATE), DATE '1995-01-01')"
            " AS BIGINT)"
        ).alias("d"),
        F.expr("CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)").alias(
            "cents"
        ),
    )
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("segment")
    )
    j = o.join(c, o.o_custkey == c.c_custkey).select(
        "segment", "d", "cents"
    )
    bounds = j.agg(F.min("d").alias("mn"), F.max("d").alias("mx"))
    days = bounds.select(F.explode(F.expr("sequence(mn, mx)")).alias("d"))
    segs = j.select("segment").distinct()
    daily = j.groupBy("segment", "d").agg(
        F.sum("cents").cast("bigint").alias("x")
    )
    grid = (
        segs.crossJoin(days)
        .join(daily, ["segment", "d"], "left")
        .select(
            "segment",
            F.col("d").cast("bigint").alias("d"),
            F.coalesce(F.col("x"), F.lit(0)).cast("bigint").alias("x"),
        )
    )
    return recurrence.holt_linear(grid, "segment", "d", "x").orderBy(
        "segment", "d"
    )


# ---------------------------------------------------------------------------
# pca_gram_projection (round 10): the spectral family — exact-integer
# Gram, driver-side power iteration, hash-exact projections
# (operators/pca.py).
# ---------------------------------------------------------------------------

def _pca_oracle(sf_dir: str) -> str:
    """Callable twin: pyarrow Gram (same exact integers as the Spark
    DECIMAL(38,0) sums), the SAME pure power_components on them
    (bit-identical float trajectory), components inlined as literals,
    projection replayed as an exact DuckDB integer dot."""
    from ..operators import pca

    gram = pca.gram_from_parquet(f"{sf_dir}/embeddings.parquet")
    comps, shares = pca.power_components(gram, n_components=2)

    def dot(comp: list[int]) -> str:
        arr = "[" + ", ".join(f"CAST({c} AS BIGINT)" for c in comp) + "]"
        return (
            f"CAST(list_aggregate(list_transform(list_zip(_q, {arr}), "
            f"p -> p[1] * p[2]), 'sum') // {pca.QSCALE} AS BIGINT)"
        )

    return f"""
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding, x ->
               CAST(floor(CAST(x AS DOUBLE) * {pca.QSCALE}.0 + 0.5)
                    AS BIGINT)) AS _q
      FROM embeddings
    )
    SELECT vec_id,
           {dot(comps[0])} AS pc1_micro,
           {dot(comps[1])} AS pc2_micro,
           CAST({shares[0]} AS BIGINT) AS evr1_micro,
           CAST({shares[1]} AS BIGINT) AS evr2_micro
    FROM q ORDER BY vec_id
    """


@register(
    "pca_gram_projection",
    oracle=_pca_oracle,
    doc="PCA of the embedding table — the spectral analytics family "
    "(operators/pca.py): embeddings quantize to exact integer micro "
    "units, the 64x64 Gram accumulates as DECIMAL(38,0) sums of "
    "BIGINT products (order-independent under ANY partitioning — a "
    "float Gram is not; DECIMAL keeps it exact past int64 at 100 TB "
    "row counts), the top-2 eigenvectors come from driver-side "
    "power iteration with Hotelling deflation (fixed 50 iters, "
    "deterministic e_1 start, largest-coordinate sign fix) on the "
    "exact integer Gram, components snap to micro ONCE, and the "
    "corpus projection is a pure exact-BIGINT dot per row — the "
    "classical tall-skinny decomposition (corpus work = one "
    "aggregation + one map) made hash-exact.  Explained-variance "
    "shares ride as constant micro columns.  Oracle: callable — the "
    "pyarrow twin accumulates the SAME integers, runs the SAME "
    "power iteration (bit-identical float trajectory), and replays "
    "the projection as a DuckDB integer dot against component "
    "literals.  Scale note: the d(d+1)/2-per-row explode swaps for "
    "a per-partition numpy partial Gram (Python-int accumulators) "
    "at petabyte scale; the aggregation contract is identical.",
)
def pca_gram_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import pca

    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    gram = pca.gram_exact(e)
    comps, shares = pca.power_components(gram, n_components=2)
    return (
        pca.project(e, comps)
        .withColumn("evr1_micro", F.lit(shares[0]).cast("bigint"))
        .withColumn("evr2_micro", F.lit(shares[1]).cast("bigint"))
        .orderBy("vec_id")
    )
