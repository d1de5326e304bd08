"""Driver queries, round 12 — five new families, each implemented and
registered in this module:

- knn_shapley_values — exact KNN-Shapley data valuation (Jia et al.
  2019) of every training embedding against a held-out validation
  pool (operators/valuation.py): the closed-form Shapley recursion
  for the K-NN utility unrolled into one ranking window plus one
  suffix-sum window per validation point, every term pico-snapped so
  the totals are exact BIGINTs.  The data-attribution primitive a
  curation pipeline uses to find helpful vs harmful examples.
- harmonic_centrality_copurchase — landmark-restricted harmonic
  centrality over the co-purchase graph: ONE multi-source BSP sweep
  (operators/graph.multi_source_bfs, the round-11 machinery) labels
  hop distances from k landmarks, then centrality(v) = sum of
  FLOOR(1e6/dist + 0.5) — the Potamias et al. 2009 landmark-sketch
  estimate of closeness/harmonic centrality as graph features.
- t_closeness_audit — the third leg of the privacy triad
  (k-anonymity and l-diversity are already registered): per
  quasi-identifier class, the Earth Mover's Distance between the
  class's ordered sensitive-attribute distribution and the global
  one (Li et al. 2007), computed from exact integer cumulative
  counts with ONE micro-snap at the end.
- bm25f_fielded_search — simple BM25F (Zaragoza et al. 2004) over a
  head/body field split of documents (operators/fts.bm25f_topk):
  per-field length-normalized tfs weight-combine BEFORE one shared
  saturation; per-field postings prune to the query terms before any
  shuffle.
- neyman_allocation_sample — optimal stratified sample allocation
  (Neyman 1934): per-stratum sigma from EXACT integer moment sums
  (n*sum(x^2) - sum(x)^2), allocation shares snapped to integer
  sigma-units so the share division is one double op, then a
  deterministic hash-ranked draw of each stratum's quota.

Conventions as everywhere: exact BIGINT counts/fixed-point units,
each division-to-double micro-snapped once from exact integers,
total-order tie-breaks on every ranking.

No reference-file citation applies: /root/reference stops at
retrieval; these extend the curation / graph / privacy / search /
sampling families (SURVEY.md beyond-reference operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions import portable as PT
from ..operators import fts, valuation
from ..session import load_table
from .registry import register

D = PT.DUCKDB
S = PT.SPARK


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# knn_shapley_values
# ---------------------------------------------------------------------------

_KS_K = 5
_KS_N_TEST = 10
_KS_TOP = 20

_KS_ORACLE = f"""
    WITH test AS (
      SELECT vec_id AS tid, embedding AS tv, CAST(label AS BIGINT) AS tl
      FROM embeddings WHERE vec_id < {_KS_N_TEST}
    ),
    train AS (
      SELECT vec_id AS rid, embedding AS rv, CAST(label AS BIGINT) AS rl
      FROM embeddings WHERE vec_id >= {_KS_N_TEST}
    ),
    pairs AS (
      SELECT tid, rid, rl,
             CASE WHEN rl = tl THEN 1 ELSE 0 END AS u,
             {PT.sq_l2_q6('rv', 'tv', D)} AS d2
      FROM train, test
    ),
    ranked AS (
      SELECT tid, rid, rl, u,
             row_number() OVER (PARTITION BY tid ORDER BY d2, rid) AS j,
             lead(u) OVER (PARTITION BY tid ORDER BY d2, rid) AS u_next,
             count(*) OVER (PARTITION BY tid) AS n
      FROM pairs
    ),
    terms AS (
      SELECT tid, rid, rl, j,
             CASE WHEN j < n THEN
               CAST(FLOOR((u - u_next) * LEAST({_KS_K}, j)
                    * 1000000000000.0 / ({_KS_K} * j) + 0.5) AS BIGINT)
             ELSE
               CAST(FLOOR(u * 1000000000000.0 / n + 0.5) AS BIGINT)
             END AS term
      FROM ranked
    ),
    sv AS (
      SELECT tid, rid, rl,
             SUM(term) OVER (PARTITION BY tid ORDER BY j DESC) AS s
      FROM terms
    )
    SELECT rid AS train_id, rl AS label,
           CAST(SUM(s) AS BIGINT) AS total_shapley_p12
    FROM sv GROUP BY rid, rl
    ORDER BY total_shapley_p12 DESC, train_id LIMIT {_KS_TOP}
    """


@register(
    "knn_shapley_values",
    oracle=_KS_ORACLE,
    bench=True,
    doc="exact KNN-Shapley data valuation (operators/valuation.py; "
    "Jia et al. 2019): every training embedding's Shapley value for "
    f"the {_KS_K}-NN utility on a {_KS_N_TEST}-point validation "
    "pool, totals exact BIGINT pico-units, top-20 most valuable "
    "points.  Validation pool broadcast, distances map-side via the "
    "exact micro-quantized squared-L2 (portable.sq_l2_q6), ONE "
    "shuffle on test_id serving the rank / lead / count / "
    "suffix-sum windows, per-training-point total a uniform-key "
    "groupBy, top-k TakeOrderedAndProject.  At corpus scale the "
    "valued pool bounds via an ANN candidate prefilter or the "
    "band-parallel two-phase rank (operators/ranks.py) — see the "
    "operator docstring.",
)
def knn_shapley_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    sv = valuation.knn_shapley(
        emb.filter(F.col("vec_id") >= _KS_N_TEST),
        emb.filter(F.col("vec_id") < _KS_N_TEST),
        k=_KS_K,
    )
    return (
        sv.groupBy(
            F.col("train_id"), F.col("train_label").alias("label")
        )
        .agg(F.sum("shapley_p12").cast("bigint").alias("total_shapley_p12"))
        .orderBy(F.desc("total_shapley_p12"), F.asc("train_id"))
        .limit(_KS_TOP)
    )


# ---------------------------------------------------------------------------
# harmonic_centrality_copurchase
# ---------------------------------------------------------------------------

_HC_SOURCES = (0, 1, 2, 3, 4)
_HC_DEPTH = 3
_HC_TOP = 20

_HC_ORACLE = f"""
    WITH RECURSIVE
    e0 AS (
      SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS lo,
                      greatest(a.l_partkey, b.l_partkey) AS hi
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    e AS (SELECT lo AS s, hi AS d FROM e0 UNION ALL SELECT hi, lo FROM e0),
    bfs AS (
      SELECT CAST(lm AS BIGINT) AS landmark, CAST(lm AS BIGINT) AS v,
             0 AS dist
      FROM (VALUES {", ".join(f"({s})" for s in _HC_SOURCES)}) AS t(lm)
      UNION
      SELECT bfs.landmark, e.d AS v, bfs.dist + 1 AS dist
      FROM bfs JOIN e ON e.s = bfs.v
      WHERE bfs.dist < {_HC_DEPTH}
    ),
    lab AS (SELECT landmark, v, min(dist) AS dist FROM bfs
            GROUP BY landmark, v)
    SELECT v AS part_id,
           CAST(count(*) AS BIGINT) AS n_landmarks,
           CAST(SUM(CAST(FLOOR(1000000.0 / dist + 0.5) AS BIGINT))
                AS BIGINT) AS harmonic_micro
    FROM lab WHERE dist > 0
    GROUP BY v
    ORDER BY harmonic_micro DESC, part_id LIMIT {_HC_TOP}
    """


@register(
    "harmonic_centrality_copurchase",
    oracle=_HC_ORACLE,
    bench=True,
    doc="landmark-restricted harmonic centrality over the co-purchase "
    f"graph: hop distances from parts {_HC_SOURCES} in ONE "
    "multi-source BSP sweep (graph.multi_source_bfs — the round-11 "
    "landmark machinery reused as a centrality feature extractor, "
    "Potamias et al. 2009), centrality(v) = sum over reached "
    "landmarks of FLOOR(1e6/dist + 0.5) — exact BIGINT, no float "
    "accumulation.  k landmarks cost one pass of k-wide frontiers "
    "(uniform vertex-key shuffles, localCheckpoint per level); the "
    "aggregation is one uniform-key groupBy and the top-k plans as "
    "TakeOrderedAndProject.  Oracle: recursive CTE seeded with all "
    "landmarks under the same hop cap, min(dist) per (landmark, v).",
)
def harmonic_centrality_copurchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators import graph

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = graph.copurchase_pairs(li).distinct()
    lab = graph.multi_source_bfs(
        edges, list(_HC_SOURCES), a="lo", b="hi", max_depth=_HC_DEPTH
    )
    return (
        lab.filter(F.col("dist") > 0)
        .groupBy(F.col("v").alias("part_id"))
        .agg(
            F.count("*").cast("bigint").alias("n_landmarks"),
            F.sum(
                F.expr(
                    "CAST(FLOOR(1000000.0 / dist + 0.5) AS BIGINT)"
                )
            )
            .cast("bigint")
            .alias("harmonic_micro"),
        )
        .orderBy(F.desc("harmonic_micro"), F.asc("part_id"))
        .limit(_HC_TOP)
    )


# ---------------------------------------------------------------------------
# t_closeness_audit
# ---------------------------------------------------------------------------

_TC_BANDS = 5  # ordered acctbal bands; EMD normalizer is B-1

_TC_BAND_SQL = (
    "LEAST(GREATEST(CAST(FLOOR((CAST(c_acctbal AS DOUBLE) + 1000.0)"
    " / 2200.0) AS INT), 0), 4)"
)

_TC_ORACLE = f"""
    WITH base AS (
      SELECT c_mktsegment AS seg, c_nationkey AS nat,
             {_TC_BAND_SQL} AS band
      FROM customer
    ),
    grp AS (SELECT seg, nat, band, count(*) AS cnt
            FROM base GROUP BY seg, nat, band),
    grps AS (SELECT seg, nat, CAST(sum(cnt) AS BIGINT) AS n_g
             FROM grp GROUP BY seg, nat),
    gband AS (SELECT band, count(*) AS gcnt FROM base GROUP BY band),
    gtot AS (SELECT CAST(count(*) AS BIGINT) AS n_t FROM base),
    domain AS (SELECT band FROM (VALUES (0), (1), (2), (3), (4)) AS t(band)),
    dense AS (
      SELECT g.seg, g.nat, d.band,
             COALESCE(x.cnt, 0) AS cnt, COALESCE(gl.gcnt, 0) AS gcnt
      FROM grps g CROSS JOIN domain d
      LEFT JOIN grp x ON x.seg = g.seg AND x.nat = g.nat AND x.band = d.band
      LEFT JOIN gband gl ON gl.band = d.band
    ),
    cums AS (
      SELECT seg, nat, band,
             SUM(cnt) OVER (PARTITION BY seg, nat ORDER BY band) AS cum_g,
             SUM(gcnt) OVER (PARTITION BY seg, nat ORDER BY band) AS cum_t
      FROM dense
    ),
    diffs AS (
      SELECT c.seg, c.nat,
             SUM(ABS(c.cum_g * t.n_t - c.cum_t * g.n_g)) AS sum_abs,
             ANY_VALUE(g.n_g) AS n_g, ANY_VALUE(t.n_t) AS n_t
      FROM cums c
      JOIN grps g ON g.seg = c.seg AND g.nat = c.nat
      CROSS JOIN gtot t
      GROUP BY c.seg, c.nat
    )
    SELECT seg AS c_mktsegment, CAST(nat AS BIGINT) AS c_nationkey,
           CAST(n_g AS BIGINT) AS n_rows,
           CAST(FLOOR(CAST(sum_abs AS DOUBLE) * 1000000.0
                / (CAST(n_g AS DOUBLE) * CAST(n_t AS DOUBLE)
                   * {_TC_BANDS - 1}) + 0.5) AS BIGINT) AS emd_micro
    FROM diffs
    ORDER BY c_mktsegment, c_nationkey
    """


@register(
    "t_closeness_audit",
    oracle=_TC_ORACLE,
    doc="t-closeness audit (Li et al. 2007) — the third leg of the "
    "privacy triad beside the registered k_anonymity_audit and "
    "l_diversity_audit: per (mktsegment, nationkey) quasi-identifier "
    "class, the ordered-attribute Earth Mover's Distance between the "
    "class's acctbal-band distribution and the global one, from "
    "EXACT integer cumulative counts — EMD = sum |cum_g*n_t - "
    "cum_t*n_g| / (n_g*n_t*(B-1)), ONE micro-snap at the end.  Bands "
    "are STATIC value ranges (map-side, no global sort); the band "
    "domain is a 5-row literal cross join so empty bands still "
    "contribute to the cumulative sums; group counts are one "
    "uniform-key shuffle; windows span <= 5 rows per class.  At "
    "lake scale the BIGINT cum products move to DECIMAL(38,0) — "
    "same plan.",
)
def t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    base = cust.select(
        F.col("c_mktsegment").alias("seg"),
        F.col("c_nationkey").alias("nat"),
        F.expr(_TC_BAND_SQL).alias("band"),
    )
    grp = base.groupBy("seg", "nat", "band").agg(
        F.count("*").alias("cnt")
    )
    grps = grp.groupBy("seg", "nat").agg(
        F.sum("cnt").cast("bigint").alias("n_g")
    )
    glob = base.groupBy("band").agg(F.count("*").alias("gcnt"))
    n_t = base.agg(F.count("*").cast("bigint").alias("n_t"))
    domain = spark.range(_TC_BANDS).select(
        F.col("id").cast("int").alias("band")
    )
    dense = (
        grps.crossJoin(F.broadcast(domain))
        .join(grp, ["seg", "nat", "band"], "left")
        .join(F.broadcast(glob), "band", "left")
        .select(
            "seg",
            "nat",
            "band",
            "n_g",
            F.coalesce("cnt", F.lit(0)).alias("cnt"),
            F.coalesce("gcnt", F.lit(0)).alias("gcnt"),
        )
    )
    w = (
        Window.partitionBy("seg", "nat")
        .orderBy("band")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cums = dense.select(
        "seg",
        "nat",
        "n_g",
        F.sum("cnt").over(w).alias("cum_g"),
        F.sum("gcnt").over(w).alias("cum_t"),
    )
    diffs = (
        cums.crossJoin(F.broadcast(n_t))
        .groupBy("seg", "nat")
        .agg(
            F.sum(
                F.abs(
                    F.col("cum_g") * F.col("n_t")
                    - F.col("cum_t") * F.col("n_g")
                )
            ).alias("sum_abs"),
            F.first("n_g").alias("n_g"),
            F.first("n_t").alias("n_t"),
        )
    )
    return diffs.select(
        F.col("seg").alias("c_mktsegment"),
        F.col("nat").cast("bigint").alias("c_nationkey"),
        F.col("n_g").cast("bigint").alias("n_rows"),
        F.expr(
            f"CAST(FLOOR(CAST(sum_abs AS DOUBLE) * 1000000.0"
            f" / (CAST(n_g AS DOUBLE) * CAST(n_t AS DOUBLE)"
            f" * {_TC_BANDS - 1}) + 0.5) AS BIGINT)"
        ).alias("emd_micro"),
    ).orderBy("c_mktsegment", "c_nationkey")


# ---------------------------------------------------------------------------
# bm25f_fielded_search
# ---------------------------------------------------------------------------

_BF_TERMS = ("vector", "merge", "window")
_BF_K = 10
_BF_HEAD_LEN = 100
# (name, sql_expr, weight, b_f): head is boosted and length-normalizes
# harder, the classic title/body asymmetry
_BF_FIELDS = (
    ("head", f"substring(text, 1, {_BF_HEAD_LEN})", 2.0, 0.75),
    ("body", f"substring(text, {_BF_HEAD_LEN + 1})", 1.0, 0.50),
)


def _bm25f_oracle() -> str:
    terms_in = ", ".join(f"'{t}'" for t in _BF_TERMS)
    field_sql = []
    for fname, expr, w, bf in _BF_FIELDS:
        toks = PT.tokens(expr, D)
        field_sql.append(
            f"""
    {fname}_base AS (
      SELECT doc_id, {toks} AS toks FROM documents
    ),
    {fname}_stat AS (
      SELECT CAST(avg(len(toks)) AS DOUBLE) AS avgdl_{fname}
      FROM {fname}_base
    ),
    {fname}_hits AS (
      SELECT doc_id, dl, term, count(*) AS tf FROM (
        SELECT doc_id, len(toks) AS dl, unnest(toks) AS term
        FROM {fname}_base
      ) WHERE term IN ({terms_in})
      GROUP BY doc_id, dl, term
    ),
    {fname}_wtf AS (
      SELECT h.doc_id, h.term,
             {w} * CAST(h.tf AS DOUBLE)
             / (1.0 - {bf} + {bf} * CAST(h.dl AS DOUBLE) / s.avgdl_{fname})
             AS wtf_f
      FROM {fname}_hits h CROSS JOIN {fname}_stat s
    )"""
        )
    return f"""
    WITH {",".join(field_sql)},
    n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
    combined AS (
      SELECT doc_id, term, SUM(wtf_f) AS wtf FROM (
        SELECT * FROM head_wtf UNION ALL SELECT * FROM body_wtf
      ) GROUP BY doc_id, term
    ),
    dfs AS (SELECT term, count(DISTINCT doc_id) AS df
            FROM combined GROUP BY term),
    scored AS (
      SELECT c.doc_id,
             CAST(FLOOR(
               ln(1.0 + (n.n_docs - CAST(d.df AS DOUBLE) + 0.5)
                        / (CAST(d.df AS DOUBLE) + 0.5))
               * c.wtf / (1.2 + c.wtf)
               * 1000000.0 + 0.5) AS BIGINT) AS micro
      FROM combined c JOIN dfs d ON c.term = d.term CROSS JOIN n
    )
    SELECT doc_id, count(*) AS n_terms_hit,
           CAST(SUM(micro) AS DOUBLE) / 1000000.0 AS score
    FROM scored GROUP BY doc_id
    ORDER BY score DESC, doc_id LIMIT {_BF_K}
    """


@register(
    "bm25f_fielded_search",
    oracle=_bm25f_oracle(),
    doc="simple BM25F fielded search (operators/fts.bm25f_topk; "
    "Zaragoza et al. 2004) over a head/body zone split of documents: "
    "per-field length-normalized tfs weight-combine (head boosted "
    "2x) BEFORE one shared k1 saturation — NOT a sum of independent "
    "per-field BM25 scores.  Per-field postings prune to the query "
    "terms before any shuffle; field stats are tiny broadcast aggs; "
    "the two-field combination is a 2-double sum (IEEE "
    "order-independent); per-term partials micro-snap before the "
    "exact per-doc BIGINT sum; top-k TakeOrderedAndProject.  Gives "
    "operators/fts.postings its query coverage (the inverted-index "
    "materializer the ad-hoc search paths inline).",
)
def bm25f_fielded_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return fts.bm25f_topk(
        docs, "doc_id", list(_BF_FIELDS), list(_BF_TERMS), k=_BF_K
    )


# ---------------------------------------------------------------------------
# neyman_allocation_sample
# ---------------------------------------------------------------------------

_NA_SAMPLE = 100

_NA_ORACLE = f"""
    WITH cents AS (
      SELECT c_custkey, c_mktsegment AS seg,
             CAST(FLOOR(CAST(c_acctbal AS DOUBLE) * 100.0 + 0.5)
                  AS BIGINT) AS x
      FROM customer
    ),
    mom AS (
      SELECT seg, CAST(count(*) AS BIGINT) AS n_h,
             SUM(x) AS s1, SUM(x * x) AS s2
      FROM cents GROUP BY seg
    ),
    sig AS (
      SELECT seg, n_h,
             CAST(FLOOR(sqrt(CAST(n_h * s2 - s1 * s1 AS DOUBLE)) + 0.5)
                  AS BIGINT) AS sigma_units
      FROM mom
    ),
    tot AS (SELECT SUM(sigma_units) AS tot_units FROM sig),
    alloc AS (
      SELECT s.seg, s.n_h, s.sigma_units,
             CAST(FLOOR(CAST(s.sigma_units AS DOUBLE) * {_NA_SAMPLE}.0
                  / CAST(t.tot_units AS DOUBLE) + 0.5) AS BIGINT) AS n_alloc
      FROM sig s CROSS JOIN tot t
    ),
    ranked AS (
      SELECT seg, c_custkey,
             row_number() OVER (
               PARTITION BY seg
               ORDER BY {PT.poly_hash("CAST(c_custkey AS VARCHAR)", D)},
                        c_custkey) AS rk
      FROM cents
    ),
    sel AS (
      SELECT r.seg, SUM(r.c_custkey) AS sel_sum, count(*) AS n_sel
      FROM ranked r JOIN alloc a ON a.seg = r.seg
      WHERE r.rk <= a.n_alloc
      GROUP BY r.seg
    )
    SELECT a.seg AS c_mktsegment, a.n_h AS n_rows,
           a.sigma_units, a.n_alloc,
           CAST(COALESCE(s.n_sel, 0) AS BIGINT) AS n_selected,
           CAST(COALESCE(s.sel_sum, 0) AS BIGINT) AS sel_custkey_sum
    FROM alloc a LEFT JOIN sel s ON s.seg = a.seg
    ORDER BY c_mktsegment
    """


@register(
    "neyman_allocation_sample",
    oracle=_NA_ORACLE,
    doc="Neyman-optimal stratified sample allocation (Neyman 1934) "
    "over customer strata: per-stratum sigma from EXACT integer "
    "moment sums (n*sum(x^2) - sum(x)^2 over acctbal cents, BIGINT "
    "at this scale, DECIMAL(38,0) at lake scale), each stratum's "
    "N_h*sigma_h snapped once to integer sigma-units so the "
    "allocation share is ONE double division of exact integers, "
    "quota n_h = FLOOR(share * 100 + 0.5).  The draw is a "
    "deterministic hash rank (portable poly-hash of the key) per "
    "stratum — reproducible across engines and runs, no RNG state.  "
    "Plan: one uniform-key moment shuffle, a 5-row broadcast "
    "allocation, per-stratum bounded rank windows (band-parallel "
    "two-phase rank at lake scale), checksum output.",
)
def neyman_allocation_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    cents = cust.select(
        "c_custkey",
        F.col("c_mktsegment").alias("seg"),
        F.expr(
            "CAST(FLOOR(CAST(c_acctbal AS DOUBLE) * 100.0 + 0.5) AS BIGINT)"
        ).alias("x"),
    )
    mom = cents.groupBy("seg").agg(
        F.count("*").cast("bigint").alias("n_h"),
        F.sum("x").alias("s1"),
        F.sum(F.col("x") * F.col("x")).alias("s2"),
    )
    sig = mom.select(
        "seg",
        "n_h",
        F.expr(
            "CAST(FLOOR(sqrt(CAST(n_h * s2 - s1 * s1 AS DOUBLE)) + 0.5)"
            " AS BIGINT)"
        ).alias("sigma_units"),
    )
    tot = sig.agg(F.sum("sigma_units").alias("tot_units"))
    alloc = sig.crossJoin(F.broadcast(tot)).select(
        "seg",
        "n_h",
        "sigma_units",
        F.expr(
            f"CAST(FLOOR(CAST(sigma_units AS DOUBLE) * {_NA_SAMPLE}.0"
            f" / CAST(tot_units AS DOUBLE) + 0.5) AS BIGINT)"
        ).alias("n_alloc"),
    )
    rk = F.row_number().over(
        Window.partitionBy("seg").orderBy(
            F.expr(PT.poly_hash("CAST(c_custkey AS STRING)", S)),
            F.col("c_custkey"),
        )
    )
    ranked = cents.select("seg", "c_custkey", rk.alias("rk"))
    sel = (
        ranked.join(F.broadcast(alloc.select("seg", "n_alloc")), "seg")
        .filter(F.col("rk") <= F.col("n_alloc"))
        .groupBy("seg")
        .agg(
            F.sum("c_custkey").alias("sel_sum"),
            F.count("*").alias("n_sel"),
        )
    )
    return (
        alloc.join(sel, "seg", "left")
        .select(
            F.col("seg").alias("c_mktsegment"),
            F.col("n_h").alias("n_rows"),
            "sigma_units",
            "n_alloc",
            F.coalesce("n_sel", F.lit(0)).cast("bigint").alias("n_selected"),
            F.coalesce("sel_sum", F.lit(0))
            .cast("bigint")
            .alias("sel_custkey_sum"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# geometric_median_labels
# ---------------------------------------------------------------------------

def _gm_oracle() -> str:
    from ..operators import robust

    return robust.weiszfeld_oracle_sql(
        "SELECT CAST(label AS BIGINT) AS g, embedding AS x FROM embeddings",
        group_col="label",
        iters=2,
    )


@register(
    "geometric_median_labels",
    oracle=_gm_oracle(),
    doc="per-label geometric median of the embedding column "
    "(operators/robust.py; Weiszfeld 1937): two snapped Weiszfeld "
    "steps from the DECIMAL-exact component-mean init — the "
    "0.5-breakdown-point robust class prototype (label-noise "
    "auditing, Byzantine-tolerant aggregation; Blanchard et al. "
    "2017), companion to embedding_label_centroids (mean) and "
    "knn_shapley_values (per-point valuation).  Every per-row float "
    "round6-snapped, every cross-row sum DECIMAL(27,10)-exact, the "
    "L1 objective an exact BIGINT micro sum; medians serialized on "
    "the %.6f grid.  Per iteration: one corpus scan, a broadcast "
    "(groups x dim) median table, shuffles bounded by groups x dim "
    "partial sums — iterations cost scans, not state.  Oracle: the "
    "fully unrolled twin from the same SQL builders.",
)
def geometric_median_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import robust

    emb = _t(spark, sf_dir, "embeddings").select(
        F.col("label").cast("bigint").alias("label"), "embedding"
    )
    return robust.geometric_median_report(
        emb, "label", "embedding", iters=2
    ).orderBy("label")


# ---------------------------------------------------------------------------
# levenshtein_blocked_pairs
# ---------------------------------------------------------------------------

_LEV_CAP = 1000  # hot-block guard: blocks above this size are skipped

_LEV_ORACLE = f"""
    WITH p AS (
      SELECT p_partkey, p_name,
             split_part(p_name, ' ', 1) AS w1, p_size
      FROM part
    ),
    sized AS (
      SELECT *, count(*) OVER (PARTITION BY w1, p_size) AS bsz FROM p
    ),
    capped AS (SELECT * FROM sized WHERE bsz <= {_LEV_CAP}),
    pairs AS (
      SELECT levenshtein(a.p_name, b.p_name) AS lev,
             a.p_partkey AS ka, b.p_partkey AS kb
      FROM capped a JOIN capped b
        ON a.w1 = b.w1 AND a.p_size = b.p_size
       AND a.p_partkey < b.p_partkey
    )
    SELECT CAST(lev AS BIGINT) AS lev,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(ka + kb) AS BIGINT) AS ids_checksum
    FROM pairs GROUP BY lev ORDER BY lev
    """


@register(
    "levenshtein_blocked_pairs",
    oracle=_LEV_ORACLE,
    doc="blocked edit-distance entity resolution over part names: "
    "candidate pairs ONLY within (first-word, size) blocks — never "
    "all-pairs — with the hot-block cap the dedup/linkage family "
    "uses (operators/dedup.py convention; a block above "
    f"{_LEV_CAP} members is skipped, keeping worst-case pair count "
    "bounded), then exact Levenshtein on the full name (built-in "
    "both engines, identical unit-cost semantics).  Complements "
    "jaro_winkler_titles (scored similarity) and "
    "sorted_neighborhood_pairs (windowed candidates) with the "
    "classic edit-distance layer.  Output: per-distance pair "
    "histogram with an id checksum — pins the full pair set without "
    "shipping every row.  One composite-key shuffle for the "
    "self-join; the window block-size guard shares the same "
    "partitioning.",
)
def levenshtein_blocked_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").select(
        "p_partkey",
        "p_name",
        F.split(F.col("p_name"), " ").getItem(0).alias("w1"),
        "p_size",
    )
    sized = part.withColumn(
        "bsz", F.count("*").over(Window.partitionBy("w1", "p_size"))
    )
    capped = sized.filter(F.col("bsz") <= _LEV_CAP)
    a = capped.alias("a")
    b = capped.alias("b")
    pairs = a.join(
        b,
        (F.col("a.w1") == F.col("b.w1"))
        & (F.col("a.p_size") == F.col("b.p_size"))
        & (F.col("a.p_partkey") < F.col("b.p_partkey")),
    ).select(
        F.levenshtein(F.col("a.p_name"), F.col("b.p_name")).alias("lev"),
        (F.col("a.p_partkey") + F.col("b.p_partkey")).alias("ksum"),
    )
    return (
        pairs.groupBy(F.col("lev").cast("bigint").alias("lev"))
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.sum("ksum").cast("bigint").alias("ids_checksum"),
        )
        .orderBy("lev")
    )


# ---------------------------------------------------------------------------
# betweenness_sampled_copurchase
# ---------------------------------------------------------------------------

_BW_SOURCES = (0, 1, 2)
_BW_DEPTH = 3
_BW_TOP = 20

_BW_EDGES_SQL = """
    SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS lo,
                    greatest(a.l_partkey, b.l_partkey) AS hi
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
"""


def _bw_oracle(sf_dir: str) -> str:
    """Python-twin oracle: Brandes forward/backward passes replayed
    with the identical BIGINT sigma sums and per-edge micro
    floor-divisions, emitted as VALUES (the iterative-fixpoint
    convention)."""
    import duckdb

    from ..operators.graph import betweenness_sampled_py

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{sf_dir}/lineitem.parquet')"
    )
    edges = {
        (int(lo), int(hi))
        for lo, hi in con.execute(_BW_EDGES_SQL).fetchall()
    }
    con.close()
    bw = betweenness_sampled_py(edges, list(_BW_SOURCES), _BW_DEPTH)
    top = sorted(bw.items(), key=lambda t: (-t[1], t[0]))[:_BW_TOP]
    top = [(v, c) for v, c in top if c > 0] or []
    if not top:
        return (
            "SELECT CAST(NULL AS BIGINT) AS part_id, "
            "CAST(NULL AS BIGINT) AS betweenness_micro WHERE FALSE"
        )
    rows = ", ".join(f"({v}, {c})" for v, c in top)
    return (
        f"SELECT CAST(part_id AS BIGINT) AS part_id, "
        f"CAST(betweenness_micro AS BIGINT) AS betweenness_micro "
        f"FROM (VALUES {rows}) AS t(part_id, betweenness_micro) "
        f"ORDER BY betweenness_micro DESC, part_id"
    )


@register(
    "betweenness_sampled_copurchase",
    oracle=_bw_oracle,
    doc="landmark-sampled hop-bounded betweenness centrality over the "
    "co-purchase graph (graph.betweenness_sampled; Brandes 2001 "
    "dependency accumulation, Brandes & Pich 2007 pivot sampling): "
    f"Brandes' forward sigma-counting BFS from pivots {_BW_SOURCES} "
    "in ONE multi-landmark BSP sweep, then the backward dependency "
    "pass unwinding levels deepest-first — delta(v) = sum over "
    "successors of (sigma_v * (1e6 + delta_w)) DIV sigma_w, a single "
    "BIGINT floor-division per cone edge, so the whole accumulation "
    "is exact-integer and execution-order independent.  Completes "
    "the centrality suite (pagerank / HITS / harmonic / "
    "betweenness).  Per level both passes shuffle on the uniform "
    "(landmark, vertex) key with localCheckpoint lineage; the "
    "backward pass touches only the settled BFS cone.  Oracle: "
    "bit-equal Python twin as VALUES.",
)
def betweenness_sampled_copurchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators import graph

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = graph.copurchase_pairs(li).distinct()
    bw = graph.betweenness_sampled(
        edges, list(_BW_SOURCES), a="lo", b="hi", max_depth=_BW_DEPTH
    )
    return (
        bw.filter(F.col("betweenness_micro") > 0)
        .select(F.col("v").alias("part_id"), "betweenness_micro")
        .orderBy(F.desc("betweenness_micro"), F.asc("part_id"))
        .limit(_BW_TOP)
    )


# ---------------------------------------------------------------------------
# kmv_theta_set_difference
# ---------------------------------------------------------------------------

_KMV_K = 128
_KMV_A = "1-URGENT"
_KMV_B = "5-LOW"


def _kmv_oracle_sql() -> str:
    from ..operators.sketches import kmv_hash_sql

    h = kmv_hash_sql("CAST(o_custkey AS VARCHAR)", D)
    return f"""
    WITH a_keys AS (SELECT DISTINCT o_custkey FROM orders
                    WHERE o_orderpriority = '{_KMV_A}'),
    b_keys AS (SELECT DISTINCT o_custkey FROM orders
               WHERE o_orderpriority = '{_KMV_B}'),
    sa AS (SELECT DISTINCT {h} AS h FROM a_keys ORDER BY h LIMIT {_KMV_K}),
    sb AS (SELECT DISTINCT {h} AS h FROM b_keys ORDER BY h LIMIT {_KMV_K}),
    u AS (SELECT h FROM (SELECT h FROM sa UNION SELECT h FROM sb)
          ORDER BY h LIMIT {_KMV_K}),
    flags AS (
      SELECT u.h,
             CASE WHEN sa.h IS NULL THEN 0 ELSE 1 END AS in_a,
             CASE WHEN sb.h IS NULL THEN 0 ELSE 1 END AS in_b
      FROM u LEFT JOIN sa ON sa.h = u.h LEFT JOIN sb ON sb.h = u.h
    ),
    est AS (
      SELECT CAST({_KMV_K} AS BIGINT) AS k,
             CAST(count(*) AS BIGINT) AS n_held,
             CAST(max(h) AS BIGINT) AS h_k,
             CAST(sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_both,
             CAST(sum(CASE WHEN in_a = 1 AND in_b = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_a_only
      FROM flags
    ),
    exact AS (
      SELECT CAST((SELECT count(*) FROM (SELECT o_custkey FROM a_keys
                    UNION SELECT o_custkey FROM b_keys)) AS BIGINT)
               AS exact_union,
             CAST((SELECT count(*) FROM a_keys
                   WHERE o_custkey NOT IN (SELECT o_custkey FROM b_keys))
                  AS BIGINT) AS exact_a_only
    )
    SELECT k, h_k,
           CAST(CASE WHEN n_held < {_KMV_K} THEN n_held
                ELSE FLOOR(({_KMV_K} - 1) * {PT.P}.0 / h_k + 0.5)
                END AS BIGINT) AS est_union,
           exact_union,
           CAST(FLOOR(n_both * 1000000.0 / n_held + 0.5) AS BIGINT)
             AS jaccard_micro,
           CAST(CASE WHEN n_held < {_KMV_K} THEN n_a_only
                ELSE FLOOR(CAST(FLOOR(({_KMV_K} - 1) * {PT.P}.0 / h_k + 0.5)
                     AS DOUBLE) * n_a_only / {_KMV_K} + 0.5)
                END AS BIGINT) AS est_a_only,
           exact_a_only
    FROM est CROSS JOIN exact
    """


@register(
    "kmv_theta_set_difference",
    oracle=_kmv_oracle_sql(),
    doc="KMV / bottom-k 'theta' sketch set algebra "
    "(operators/sketches.kmv_sketch; Bar-Yossef et al. 2002, Beyer "
    "et al. 2007): the order-statistics sketch member — unlike HLL "
    "registers (union-only; hll_intersection_estimate derives "
    "intersections by inclusion-exclusion), a bottom-k sketch is a "
    "uniform sample of the hashed key space, so it estimates ANY set "
    "expression directly, including the DIFFERENCE urgent-only "
    "customers minus low-priority customers that HLL cannot express. "
    "Exact portable poly-hashes, per-set distinct + global "
    "TakeOrderedAndProject top-k (the sketch build never sorts the "
    "corpus), 128-row broadcast joins for membership flags, each "
    "estimate ONE snapped double division of exact integers; exact "
    "counts ride along as the calibration columns (the cms_merge "
    "convention).",
)
def kmv_theta_set_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import sketches

    orders = _t(spark, sf_dir, "orders")
    a_keys = orders.filter(
        F.col("o_orderpriority") == _KMV_A
    ).select("o_custkey")
    b_keys = orders.filter(
        F.col("o_orderpriority") == _KMV_B
    ).select("o_custkey")
    sa = sketches.kmv_sketch(a_keys, "o_custkey", _KMV_K)
    sb = sketches.kmv_sketch(b_keys, "o_custkey", _KMV_K)
    est = sketches.kmv_set_stats(sa, sb, _KMV_K)
    exact_union = (
        a_keys.unionByName(b_keys)
        .distinct()
        .agg(F.count("*").cast("bigint").alias("exact_union"))
    )
    exact_a_only = (
        a_keys.distinct()
        .join(b_keys.distinct(), "o_custkey", "left_anti")
        .agg(F.count("*").cast("bigint").alias("exact_a_only"))
    )
    return (
        est.crossJoin(F.broadcast(exact_union))
        .crossJoin(F.broadcast(exact_a_only))
        .select(
            "k",
            "h_k",
            "est_union",
            "exact_union",
            "jaccard_micro",
            "est_a_only",
            "exact_a_only",
        )
    )


# ---------------------------------------------------------------------------
# unimax_budget_allocation
# ---------------------------------------------------------------------------

_UM_BUDGET = 50_000
_UM_EPOCHS = 2  # per-source epoch cap


def _um_oracle_sql() -> str:
    toks = PT.tokens("text", D)
    return f"""
    WITH m AS (
      SELECT source, CAST(sum(len({toks})) AS BIGINT) AS mass
      FROM documents GROUP BY 1
    ),
    capd AS (SELECT source, mass,
                    CAST({_UM_EPOCHS} * mass AS BIGINT) AS cap FROM m),
    ranked AS (
      SELECT source, mass, cap,
             row_number() OVER (ORDER BY cap, source) AS rk,
             SUM(cap) OVER (ORDER BY cap, source
                            ROWS UNBOUNDED PRECEDING) AS cum,
             COUNT(*) OVER () AS n
      FROM capd
    ),
    feas AS (
      SELECT *, (cum + (n - rk) * cap <= {_UM_BUDGET}) AS feasible
      FROM ranked
    ),
    js AS (
      SELECT COALESCE(MAX(CASE WHEN feasible THEN rk END), 0) AS jstar,
             COALESCE(MAX(CASE WHEN feasible THEN cum END), 0) AS cumj,
             ANY_VALUE(n) AS n
      FROM feas
    ),
    un AS (
      SELECT f.source,
             row_number() OVER (ORDER BY f.source) AS urnk
      FROM feas f CROSS JOIN js WHERE f.rk > js.jstar
    )
    SELECT f.source, f.mass, f.cap AS cap_tokens,
           CAST(CASE WHEN f.rk <= js.jstar THEN f.cap
                ELSE ({_UM_BUDGET} - js.cumj) // (js.n - js.jstar)
                     + CASE WHEN un.urnk <=
                         ({_UM_BUDGET} - js.cumj) % (js.n - js.jstar)
                       THEN 1 ELSE 0 END
                END AS BIGINT) AS alloc_tokens,
           CAST((CASE WHEN f.rk <= js.jstar THEN f.cap
                 ELSE ({_UM_BUDGET} - js.cumj) // (js.n - js.jstar)
                      + CASE WHEN un.urnk <=
                          ({_UM_BUDGET} - js.cumj) % (js.n - js.jstar)
                        THEN 1 ELSE 0 END
                 END * 1000) // f.mass AS BIGINT) AS epochs_milli
    FROM feas f CROSS JOIN js
    LEFT JOIN un ON un.source = f.source
    ORDER BY f.source
    """


@register(
    "unimax_budget_allocation",
    oracle=_um_oracle_sql(),
    doc="UniMax mixture allocation (Chung et al. 2023, 'UniMax: "
    "Fairer and More Effective Language Sampling'): spread a "
    f"{_UM_BUDGET}-token training budget as uniformly as possible "
    f"across sources, capping each at {_UM_EPOCHS} epochs of its "
    "available tokens — the repetition-bounding rule that replaces "
    "temperature sampling for tail languages.  The sequential "
    "redistribution is rewritten as an exact integer WATER-FILL: "
    "sort caps ascending, the capped prefix is the maximal j with "
    "cum_j + (N-j)*cap_j <= B (feasibility is monotone, so one "
    "window + one max), everyone else gets the integer water level "
    "(B - cum_j) DIV (N - j) with the remainder distributed by "
    "source order — sum(alloc) == min(B, sum(cap)) EXACTLY.  "
    "Completes the mixture suite (token budgets / temperature "
    "largest-remainder / DSIR / DoReMi).  One corpus tokenize "
    "rollup; every window runs over the bounded domain table, never "
    "the corpus.  The three budget regimes (all-capped / mixed / "
    "all-water) are each real at one of sf0.001/0.01/0.1.",
)
def unimax_budget_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("source", "text")
    m = docs.select(
        "source",
        F.size(F.expr(PT.tokens("text", S))).cast("bigint").alias("nt"),
    ).groupBy("source").agg(F.sum("nt").cast("bigint").alias("mass"))
    capd = m.withColumn(
        "cap", (F.lit(_UM_EPOCHS) * F.col("mass")).cast("bigint")
    )
    w = Window.orderBy("cap", "source")
    ranked = capd.select(
        "source",
        "mass",
        "cap",
        F.row_number().over(w).alias("rk"),
        F.sum("cap")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum"),
        F.count("*").over(Window.partitionBy()).alias("n"),
    )
    feas = ranked.withColumn(
        "feasible",
        (F.col("cum") + (F.col("n") - F.col("rk")) * F.col("cap"))
        <= F.lit(_UM_BUDGET),
    )
    js = feas.agg(
        F.coalesce(
            F.max(F.when(F.col("feasible"), F.col("rk"))), F.lit(0)
        ).alias("jstar"),
        F.coalesce(
            F.max(F.when(F.col("feasible"), F.col("cum"))), F.lit(0)
        ).alias("cumj"),
        F.max("n").alias("nn"),
    )
    with_js = feas.crossJoin(F.broadcast(js))
    un = with_js.filter(F.col("rk") > F.col("jstar")).select(
        "source",
        F.row_number().over(Window.orderBy("source")).alias("urnk"),
    )
    water = (
        f"({_UM_BUDGET} - cumj) DIV (nn - jstar)"
        f" + CASE WHEN urnk <= ({_UM_BUDGET} - cumj) % (nn - jstar)"
        f" THEN 1 ELSE 0 END"
    )
    alloc = F.expr(
        f"CAST(CASE WHEN rk <= jstar THEN cap ELSE {water} END AS BIGINT)"
    )
    return (
        with_js.join(un, "source", "left")
        .withColumn("alloc_tokens", alloc)
        .select(
            "source",
            "mass",
            F.col("cap").alias("cap_tokens"),
            "alloc_tokens",
            F.expr("CAST((alloc_tokens * 1000) DIV mass AS BIGINT)").alias(
                "epochs_milli"
            ),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# gopher_quality_filter
# ---------------------------------------------------------------------------

_GQ_STOP = ("the", "and", "of", "to", "in", "is", "a", "that", "it", "on")
_GQ_MIN_TOK = 50
_GQ_MAX_TOK = 100_000
_GQ_REP_MICRO = 180_000  # top-bigram token fraction cap (18%)


def _gq_oracle_sql() -> str:
    toks = PT.tokens("text", D)
    quoted = ", ".join(f"'{w}'" for w in _GQ_STOP)
    stop_cnt = PT.size_(
        PT.filter_("toks", f"t -> t IN ({quoted})", D), D
    )
    alpha_cnt = PT.size_(
        PT.filter_("toks", "t -> substr(t, 1, 1) BETWEEN 'a' AND 'z'", D),
        D,
    )
    # total token chars = length of the joined tokens (list_reduce
    # with a BIGINT init over a VARCHAR list fails DuckDB's binder)
    chars = f"length({PT.array_join('toks', '', D)})"
    bigrams = PT.word_ngrams("toks", 2, D)
    return f"""
    WITH t AS (SELECT doc_id, source, {toks} AS toks FROM documents),
    sig AS (
      SELECT doc_id, source,
             CAST(len(toks) AS BIGINT) AS n_tok,
             CAST({chars} AS BIGINT) AS n_chars,
             CAST({alpha_cnt} AS BIGINT) AS n_alpha,
             CAST({stop_cnt} AS BIGINT) AS n_stop
      FROM t
    ),
    btop AS (
      SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top_count FROM (
        SELECT doc_id, g, count(*) AS c FROM (
          SELECT doc_id, unnest({bigrams}) AS g FROM t
        ) GROUP BY doc_id, g
      ) GROUP BY doc_id
    ),
    rules AS (
      SELECT s.source,
        CASE WHEN s.n_tok BETWEEN {_GQ_MIN_TOK} AND {_GQ_MAX_TOK}
             THEN 1 ELSE 0 END AS r_len,
        CASE WHEN 3 * s.n_tok <= s.n_chars AND s.n_chars <= 10 * s.n_tok
             THEN 1 ELSE 0 END AS r_wordlen,
        CASE WHEN 5 * s.n_alpha >= 4 * s.n_tok THEN 1 ELSE 0 END AS r_alpha,
        CASE WHEN s.n_stop >= 2 THEN 1 ELSE 0 END AS r_stop,
        CASE WHEN COALESCE(b.top_count, 0) * 2 * 1000000
                  <= {_GQ_REP_MICRO} * GREATEST(s.n_tok, 1)
             THEN 1 ELSE 0 END AS r_rep
      FROM sig s LEFT JOIN btop b ON b.doc_id = s.doc_id
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(1 - r_len) AS BIGINT) AS fail_len,
           CAST(sum(1 - r_wordlen) AS BIGINT) AS fail_wordlen,
           CAST(sum(1 - r_alpha) AS BIGINT) AS fail_alpha,
           CAST(sum(1 - r_stop) AS BIGINT) AS fail_stop,
           CAST(sum(1 - r_rep) AS BIGINT) AS fail_rep,
           CAST(sum(r_len * r_wordlen * r_alpha * r_stop * r_rep)
                AS BIGINT) AS n_pass,
           CAST(FLOOR(sum(r_len * r_wordlen * r_alpha * r_stop * r_rep)
                * 1000000.0 / count(*) + 0.5) AS BIGINT) AS pass_rate_micro
    FROM rules GROUP BY source ORDER BY source
    """


@register(
    "gopher_quality_filter",
    oracle=_gq_oracle_sql(),
    doc="the Gopher rule-based quality filter (Rae et al. 2021, "
    "adapted to the signals computable on this corpus): per document "
    f"— token count in [{_GQ_MIN_TOK}, {_GQ_MAX_TOK}], mean word "
    "length in [3, 10] (evaluated as INTEGER cross-multiplications, "
    "no division), >= 80% alphabetic-initial words (5*alpha >= "
    "4*n), >= 2 English stopwords, and top-bigram token fraction "
    "<= 18% (the repetition leg, same machinery as "
    "gopher_repetition_signals) — aggregated to a per-source "
    "scorecard with per-rule failure counts and an exact micro pass "
    "rate.  The standard pre-classifier curation stage, composing "
    "the textstats token/length/stopword legs with the n-gram "
    "repetition leg in one pass + one uniform doc-key bigram "
    "shuffle.  Every rule is exact-integer; the only float is the "
    "final snapped pass rate.",
)
def gopher_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..session import barrier

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    t = barrier(
        docs.select(
            "doc_id", "source", F.expr(PT.tokens("text", S)).alias("toks")
        )
    ).localCheckpoint(eager=True)
    quoted = ", ".join(f"'{w}'" for w in _GQ_STOP)
    sig = t.select(
        "doc_id",
        "source",
        F.size("toks").cast("bigint").alias("n_tok"),
        F.length(F.expr(PT.array_join("toks", "", S)))
        .cast("bigint")
        .alias("n_chars"),
        F.size(
            F.expr(
                "filter(toks, t -> substr(t, 1, 1) BETWEEN 'a' AND 'z')"
            )
        )
        .cast("bigint")
        .alias("n_alpha"),
        F.size(F.expr(f"filter(toks, t -> t IN ({quoted}))"))
        .cast("bigint")
        .alias("n_stop"),
    )
    btop = (
        t.select(
            "doc_id",
            F.explode(F.expr(PT.word_ngrams("toks", 2, S))).alias("g"),
        )
        .groupBy("doc_id", "g")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").cast("bigint").alias("top_count"))
    )
    rules = sig.join(btop, "doc_id", "left").select(
        "source",
        F.when(
            F.col("n_tok").between(_GQ_MIN_TOK, _GQ_MAX_TOK), 1
        ).otherwise(0).alias("r_len"),
        F.when(
            (3 * F.col("n_tok") <= F.col("n_chars"))
            & (F.col("n_chars") <= 10 * F.col("n_tok")),
            1,
        ).otherwise(0).alias("r_wordlen"),
        F.when(5 * F.col("n_alpha") >= 4 * F.col("n_tok"), 1)
        .otherwise(0)
        .alias("r_alpha"),
        F.when(F.col("n_stop") >= 2, 1).otherwise(0).alias("r_stop"),
        F.when(
            F.coalesce("top_count", F.lit(0)) * 2 * 1_000_000
            <= _GQ_REP_MICRO * F.greatest(F.col("n_tok"), F.lit(1)),
            1,
        ).otherwise(0).alias("r_rep"),
    )
    passed = (
        F.col("r_len")
        * F.col("r_wordlen")
        * F.col("r_alpha")
        * F.col("r_stop")
        * F.col("r_rep")
    )
    return (
        rules.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(1 - F.col("r_len")).cast("bigint").alias("fail_len"),
            F.sum(1 - F.col("r_wordlen"))
            .cast("bigint")
            .alias("fail_wordlen"),
            F.sum(1 - F.col("r_alpha")).cast("bigint").alias("fail_alpha"),
            F.sum(1 - F.col("r_stop")).cast("bigint").alias("fail_stop"),
            F.sum(1 - F.col("r_rep")).cast("bigint").alias("fail_rep"),
            F.sum(passed).cast("bigint").alias("n_pass"),
            F.expr(
                "CAST(FLOOR(sum(r_len * r_wordlen * r_alpha * r_stop"
                " * r_rep) * 1000000.0 / count(*) + 0.5) AS BIGINT)"
            ).alias("pass_rate_micro"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# diameter_double_sweep
# ---------------------------------------------------------------------------

_DS_SEED = 0
_DS_CAP = 12


def _ds_bfs_py(adj, src, cap):
    dist = {src: 0}
    frontier = [src]
    d = 0
    while frontier and d < cap:
        d += 1
        nxt = []
        for v in frontier:
            for w in adj.get(v, ()):
                if w not in dist:
                    dist[w] = d
                    nxt.append(w)
        frontier = nxt
    return dist


def _ds_oracle(sf_dir: str) -> str:
    """Python-twin oracle: the two BFS sweeps replayed exactly (same
    seed, same (dist DESC, v ASC) endpoint rule)."""
    import collections

    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{sf_dir}/lineitem.parquet')"
    )
    edges = con.execute(_BW_EDGES_SQL).fetchall()
    con.close()
    adj = collections.defaultdict(set)
    for lo, hi in edges:
        adj[int(lo)].add(int(hi))
        adj[int(hi)].add(int(lo))
    d1 = _ds_bfs_py(adj, _DS_SEED, _DS_CAP)
    u = min((v for v in d1), key=lambda v: (-d1[v], v))
    d2 = _ds_bfs_py(adj, u, _DS_CAP)
    w = min((v for v in d2), key=lambda v: (-d2[v], v))
    return (
        f"SELECT CAST({_DS_SEED} AS BIGINT) AS seed, "
        f"CAST({u} AS BIGINT) AS far_vertex, "
        f"CAST({w} AS BIGINT) AS opposite_vertex, "
        f"CAST({d2[w]} AS BIGINT) AS diameter_lb, "
        f"CAST({len(d2)} AS BIGINT) AS n_reached"
    )


@register(
    "diameter_double_sweep",
    oracle=_ds_oracle,
    doc="graph diameter LOWER BOUND by the classic double sweep "
    "(Magnien, Latapy & Habib 2009): BFS from a fixed seed, take the "
    "farthest vertex (dist DESC, id ASC — a total rule), BFS again "
    "from it; the second eccentricity lower-bounds the diameter and "
    "is exact on trees / near-exact on real graphs — the O(2 BFS) "
    "answer to a question whose exact form is all-pairs.  Reuses "
    "graph.multi_source_bfs for both sweeps (checkpoint-per-level "
    "BSP, uniform vertex keys); the only driver-side data is the "
    "single endpoint scalar between sweeps (the threshold-guarded "
    "scalar convention).  Oracle: Python twin of the two sweeps.",
)
def diameter_double_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import graph

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = graph.copurchase_pairs(li).distinct().localCheckpoint(eager=True)
    s1 = graph.multi_source_bfs(
        edges, [_DS_SEED], a="lo", b="hi", max_depth=_DS_CAP
    )
    far = s1.orderBy(F.desc("dist"), F.asc("v")).select("v").first()
    u = int(far.v)
    s2 = graph.multi_source_bfs(
        edges, [u], a="lo", b="hi", max_depth=_DS_CAP
    )
    return s2.agg(
        F.lit(_DS_SEED).cast("bigint").alias("seed"),
        F.lit(u).cast("bigint").alias("far_vertex"),
        F.expr(
            "min_by(v, struct(-dist AS d, v AS tie))"
        ).cast("bigint").alias("opposite_vertex"),
        F.max("dist").cast("bigint").alias("diameter_lb"),
        F.count("*").cast("bigint").alias("n_reached"),
    )


# ---------------------------------------------------------------------------
# misra_gries_heavy_hitters
# ---------------------------------------------------------------------------

_MG_K = 32
_MG_SHARDS = 8


def _py_tokens_mg(text: str) -> list[str]:
    import re

    return [t for t in re.split(PT.PY_WS, (text or "").lower()) if t != ""]


def _py_poly(s: str) -> int:
    h = PT.POLY_INIT
    for ch in s:
        h = (h * PT.POLY_MULT + ord(ch)) % PT.P
    return h


def _mg_oracle(sf_dir: str) -> str:
    """Python-twin oracle: the word-sharded MG passes and the k-prune
    merge replayed exactly, exact counts joined, emitted as VALUES."""
    import duckdb

    from ..operators.sketches import misra_gries_merge_py, misra_gries_py

    con = duckdb.connect()
    rows = con.execute(
        "SELECT doc_id, text FROM "
        f"read_parquet('{sf_dir}/documents.parquet') ORDER BY doc_id"
    ).fetchall()
    con.close()
    shards: dict[int, list[str]] = {}
    exact: dict[str, int] = {}
    for doc_id, text in rows:
        for tok in _py_tokens_mg(text):
            shards.setdefault(_py_poly(tok) % _MG_SHARDS, []).append(tok)
            exact[tok] = exact.get(tok, 0) + 1
    counters: list[tuple[str, int]] = []
    for sh in sorted(shards):
        counters.extend(misra_gries_py(shards[sh], _MG_K).items())
    merged = misra_gries_merge_py(counters, _MG_K)
    out = sorted(
        ((item, cnt, exact[item]) for item, cnt in merged.items()),
        key=lambda t: (-t[2], t[0]),
    )
    if not out:
        return (
            "SELECT CAST(NULL AS VARCHAR) AS item, "
            "CAST(NULL AS BIGINT) AS mg_count, "
            "CAST(NULL AS BIGINT) AS true_count WHERE FALSE"
        )
    vals = ", ".join(
        f"('{i.replace(chr(39), chr(39) * 2)}', {c}, {t})"
        for i, c, t in out
    )
    return (
        f"SELECT item, CAST(mg_count AS BIGINT) AS mg_count, "
        f"CAST(true_count AS BIGINT) AS true_count "
        f"FROM (VALUES {vals}) AS t(item, mg_count, true_count) "
        f"ORDER BY true_count DESC, item"
    )


@register(
    "misra_gries_heavy_hitters",
    oracle=_mg_oracle,
    doc="Misra-Gries heavy hitters over corpus words "
    "(sketches.misra_gries_shards; Misra & Gries 1982, mergeability "
    "Agarwal et al. 2012): the DETERMINISTIC-guarantee frequency "
    "summary — every word with frequency > n_shard/(k+1) survives "
    "its shard, no confidence parameter (the guarantee class CMS "
    "cannot give).  Words shard by key hash so shard summaries cover "
    "DISJOINT items (trivially mergeable); within a shard the stream "
    "replays in (doc_id, pos) order because MG counters are "
    "order-sensitive (the packing determinism convention); the "
    f"{_MG_SHARDS}x{_MG_K}-counter union (KBs, bounded by "
    "construction) merges driver-side with the (k+1)-th-value prune. "
    "Exact counts ride along as calibration (the cms_heavy_hitters "
    "convention).  One grouped Arrow pass, O(k) state per shard.",
)
def misra_gries_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import sketches

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.expr(PT.tokens("text", S))).alias("pos", "item"),
    )
    summaries = sketches.misra_gries_shards(
        toks, "item", ["doc_id", "pos"], k=_MG_K, n_shards=_MG_SHARDS
    )
    counters = [
        (r.item, int(r.cnt)) for r in summaries.collect()
    ]  # bounded: <= shards * k rows
    merged = sketches.misra_gries_merge_py(counters, _MG_K)
    if not merged:
        return spark.createDataFrame(
            [], "item: string, mg_count: bigint, true_count: bigint"
        )
    lit = spark.createDataFrame(
        sorted(merged.items()), "item: string, mg_count: bigint"
    )
    exact = toks.groupBy("item").agg(
        F.count("*").cast("bigint").alias("true_count")
    )
    return (
        lit.join(exact, "item")
        .select("item", F.col("mg_count").cast("bigint"), "true_count")
        .orderBy(F.desc("true_count"), F.asc("item"))
    )


# ---------------------------------------------------------------------------
# kmv_incremental_store
# ---------------------------------------------------------------------------

_KMV_STORE_K = 128
_KMV_STORE_SEQ = iter(range(1_000_000))


def _kmv_store_oracle() -> str:
    from ..operators.sketches import kmv_hash_sql

    h = kmv_hash_sql("CAST(l_partkey AS VARCHAR)", D)
    return f"""
    WITH hs AS (
      SELECT DISTINCT {h} AS h FROM lineitem WHERE l_partkey IS NOT NULL
    ),
    bk AS (
      SELECT h FROM hs ORDER BY h LIMIT {_KMV_STORE_K}
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_held,
             CAST(max(h) AS BIGINT) AS h_k
      FROM bk
    )
    SELECT n_held, h_k,
           CAST(CASE WHEN n_held < {_KMV_STORE_K} THEN n_held
                ELSE FLOOR(({_KMV_STORE_K} - 1) * {PT.P}.0 / h_k + 0.5)
                END AS BIGINT) AS est_distinct,
           (SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) FROM lineitem
            WHERE l_partkey IS NOT NULL) AS true_distinct
    FROM agg
    """


@register(
    "kmv_incremental_store",
    oracle=_kmv_store_oracle(),
    doc="incremental distinct counting through the STANDING KMV store "
    "(sketches.write_kmv_sketch / kmv_estimate_from_store): the "
    "historical corpus (l_shipdate < 1996-01-01) writes its bottom-k "
    "batch once, the new batch appends its own, and the read-time "
    "fold (distinct union -> bottom-k) equals the single-pass full "
    "build because KMV merge is bottom-k of the union — associative "
    "and commutative, the property that makes the sketch a STORE "
    "primitive at 100 TB (per-batch state is <= k rows; appending IS "
    "the update).  Gated against the full-recompute oracle, exactly "
    "the hll_incremental_store convention extended to the "
    "order-statistics sketch; exact truth rides along.",
)
def kmv_incremental_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import tempfile

    from ..operators import sketches

    li = _t(spark, sf_dir, "lineitem")
    keys = li.filter(F.col("l_partkey").isNotNull()).select(
        F.expr("CAST(l_partkey AS STRING)").alias("k"), "l_shipdate"
    )
    tag = (
        f"{hashlib.sha256(sf_dir.encode()).hexdigest()[:12]}"
        f"_{os.getpid()}_{next(_KMV_STORE_SEQ)}"
    )
    store = os.path.join(tempfile.gettempdir(), f"spark_graft_kmv_{tag}")
    cut = "1996-01-01"
    sketches.write_kmv_sketch(
        keys.filter(F.col("l_shipdate") < cut), "k", store,
        k=_KMV_STORE_K, mode="overwrite",
    )
    sketches.write_kmv_sketch(
        keys.filter(F.col("l_shipdate") >= cut), "k", store,
        k=_KMV_STORE_K, mode="append",
    )
    est = sketches.kmv_estimate_from_store(spark, store, k=_KMV_STORE_K)
    truth = li.filter(F.col("l_partkey").isNotNull()).agg(
        F.countDistinct("l_partkey").cast("bigint").alias("true_distinct")
    )
    return est.crossJoin(F.broadcast(truth))


# ---------------------------------------------------------------------------
# pipeline_provenance_roots
# ---------------------------------------------------------------------------

def _prov_row_hash(dialect: str) -> str:
    """Order-independent row fingerprint: SQUARE of the reduced
    (poly(text)*31 + doc_id) mod P — summed per stage, the root pins
    exact row membership without shipping rows.  The square is what
    makes the sum detect CROSS-ROW swaps: a linear fingerprint's sum
    separates into sum(text terms) + sum(id terms), so exchanging ids
    between two rows preserves it; the quadratic's a*id cross term
    does not."""
    # coalesce: a NULL text must still fingerprint (an audit that
    # silently drops NULL rows from the root defeats its purpose)
    h = PT.poly_hash("coalesce(text, '')", dialect)
    base = f"((({h}) * {PT.POLY_MULT} + doc_id) % {PT.P})"
    return f"((({base}) * ({base})) % {PT.P})"


def _prov_oracle() -> str:
    toks = PT.tokens("text", D)
    rh = _prov_row_hash(D)
    return f"""
    WITH s0 AS (SELECT doc_id, source, text FROM documents),
    s1 AS (SELECT * FROM s0 WHERE len({toks}) >= 50),
    s2 AS (
      SELECT doc_id, source, text FROM (
        SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id)
               AS rn
        FROM s1
      ) WHERE rn = 1
    ),
    s3 AS (
      SELECT doc_id, source, text FROM (
        SELECT *, row_number() OVER (
          PARTITION BY source ORDER BY length(text) DESC, doc_id) AS rn
        FROM s2
      ) WHERE rn <= 5
    )
    SELECT 0 AS stage, 'raw' AS stage_name,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum({rh}) AS BIGINT) AS root FROM s0
    UNION ALL
    SELECT 1, 'length_filter', CAST(count(*) AS BIGINT),
           CAST(sum({rh}) AS BIGINT) FROM s1
    UNION ALL
    SELECT 2, 'exact_dedup', CAST(count(*) AS BIGINT),
           CAST(sum({rh}) AS BIGINT) FROM s2
    UNION ALL
    SELECT 3, 'per_source_top5', CAST(count(*) AS BIGINT),
           CAST(sum({rh}) AS BIGINT) FROM s3
    ORDER BY stage
    """


@register(
    "pipeline_provenance_roots",
    oracle=_prov_oracle(),
    doc="stage-wise provenance roots for a curation pipeline — the "
    "data-integrity primitive a 100 TB deployment audits with: after "
    "each stage (raw -> length filter -> exact dedup keep-min-id -> "
    "per-source top-5), the stage's root is the SUM of "
    "order-independent row fingerprints (poly(text)*31 + doc_id "
    "mod P), so any dropped / duplicated / mutated row flips the "
    "root while commutativity makes the sum identical under any "
    "partitioning — the merkle-style audit without a tree (at lake "
    "scale the sum runs mod P in DECIMAL to bound width; here exact "
    "BIGINT).  Recompute-and-compare of roots between runs detects "
    "silent pipeline drift; n_rows alone cannot (a swap preserves "
    "counts).  One pass per stage, map-side fingerprints, 1-row "
    "aggregates.",
)
def pipeline_provenance_roots(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    rh = F.expr(_prov_row_hash(S))
    s0 = docs
    s1 = s0.filter(F.size(F.expr(PT.tokens("text", S))) >= 50)
    w_dedup = Window.partitionBy("text").orderBy("doc_id")
    s2 = (
        s1.withColumn("rn", F.row_number().over(w_dedup))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    w_top = Window.partitionBy("source").orderBy(
        F.length("text").desc(), F.asc("doc_id")
    )
    s3 = (
        s2.withColumn("rn", F.row_number().over(w_top))
        .filter(F.col("rn") <= 5)
        .drop("rn")
    )

    def stage_row(df: DataFrame, stage: int, name: str) -> DataFrame:
        return df.agg(
            F.lit(stage).cast("bigint").alias("stage"),
            F.lit(name).alias("stage_name"),
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum(rh).cast("bigint").alias("root"),
        )

    return (
        stage_row(s0, 0, "raw")
        .unionByName(stage_row(s1, 1, "length_filter"))
        .unionByName(stage_row(s2, 2, "exact_dedup"))
        .unionByName(stage_row(s3, 3, "per_source_top5"))
        .orderBy("stage")
    )


# ---------------------------------------------------------------------------
# knn_shapley_pooled — the documented 100 TB scale path made real:
# value only the M nearest candidates per validation point.
# ---------------------------------------------------------------------------

_KSP_M = 100  # candidate pool per validation point

_KSP_ORACLE = f"""
    WITH test AS (
      SELECT vec_id AS tid, embedding AS tv, CAST(label AS BIGINT) AS tl
      FROM embeddings WHERE vec_id < {_KS_N_TEST}
    ),
    train AS (
      SELECT vec_id AS rid, embedding AS rv, CAST(label AS BIGINT) AS rl
      FROM embeddings WHERE vec_id >= {_KS_N_TEST}
    ),
    pairs AS (
      SELECT tid, rid, rl,
             CASE WHEN rl = tl THEN 1 ELSE 0 END AS u,
             {PT.sq_l2_q6('rv', 'tv', D)} AS d2
      FROM train, test
    ),
    pool AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY tid ORDER BY d2, rid)
               AS j
        FROM pairs
      ) WHERE j <= {_KSP_M}
    ),
    ranked AS (
      SELECT tid, rid, rl, u, j,
             lead(u) OVER (PARTITION BY tid ORDER BY j) AS u_next,
             count(*) OVER (PARTITION BY tid) AS n
      FROM pool
    ),
    terms AS (
      SELECT tid, rid, rl, j,
             CASE WHEN j < n THEN
               CAST(FLOOR((u - u_next) * LEAST({_KS_K}, j)
                    * 1000000000000.0 / ({_KS_K} * j) + 0.5) AS BIGINT)
             ELSE
               CAST(FLOOR(u * 1000000000000.0 / n + 0.5) AS BIGINT)
             END AS term
      FROM ranked
    ),
    sv AS (
      SELECT tid, rid, rl,
             SUM(term) OVER (PARTITION BY tid ORDER BY j DESC) AS s
      FROM terms
    )
    SELECT rid AS train_id, rl AS label,
           CAST(SUM(s) AS BIGINT) AS total_shapley_p12,
           CAST(count(*) AS BIGINT) AS n_pools
    FROM sv GROUP BY rid, rl
    ORDER BY total_shapley_p12 DESC, train_id LIMIT {_KS_TOP}
    """


@register(
    "knn_shapley_pooled",
    oracle=_KSP_ORACLE,
    doc="the CANDIDATE-POOLED KNN-Shapley — the scale path the full "
    "operator's docstring commits to, made real and gated: each "
    f"validation point values only its {_KSP_M} nearest candidates "
    "(exactly the pool an IVF/LSH prefilter returns at corpus "
    "scale), and the closed-form recursion runs within the pool — "
    "pool-restricted Shapley (the Jia et al. 2019 estimator applied "
    "to the retrieved neighborhood; for the K-NN utility the far "
    "tail's per-point value decays as min(K,j)/j, which is why the "
    "truncation is the standard practice).  Same rank + suffix-sum "
    "windows, but the window frames are now M-row BOUNDED BY "
    "CONSTRUCTION — at 100 TB the per-test partitions hold M rows "
    "regardless of corpus size, the property the unpooled form only "
    "gets from the band-parallel rank rewrite.  n_pools (pools a "
    "candidate appears in) rides along.",
)
def knn_shapley_pooled(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    sv = valuation.knn_shapley(
        emb.filter(F.col("vec_id") >= _KS_N_TEST),
        emb.filter(F.col("vec_id") < _KS_N_TEST),
        k=_KS_K,
        pool=_KSP_M,
    )
    return (
        sv.groupBy(
            F.col("train_id"), F.col("train_label").alias("label")
        )
        .agg(
            F.sum("shapley_p12").cast("bigint").alias("total_shapley_p12"),
            F.count("*").cast("bigint").alias("n_pools"),
        )
        .orderBy(F.desc("total_shapley_p12"), F.asc("train_id"))
        .limit(_KS_TOP)
    )


# ---------------------------------------------------------------------------
# ann_ivf_incremental_add — incremental index maintenance: append a new
# batch to the stored IVF x binary tier without retraining or rebuild.
# ---------------------------------------------------------------------------

_IVF_ADD_SEQ = iter(range(1_000_000))


def _ivf_add_oracle(sf_dir: str) -> str:
    from .driver_queries_similarity import _IVFB_ORACLE

    return _IVFB_ORACLE


@register(
    "ann_ivf_incremental_add",
    oracle=_ivf_add_oracle,
    doc="incremental ADD to the stored ANN index (ann.write_binary_tier "
    "mode='append'): the historical corpus (vec_id < 400) writes its "
    "cell-partitioned packed-sign tier once, the new batch (>= 400) "
    "assigns against the SAME FROZEN centroids and appends its own "
    "tier rows — no retrain, no rebuild, the operational path an "
    "embedding store takes on every ingest.  Because assignment is "
    "per-vector deterministic under fixed centroids, the appended "
    "store is byte-faithful to a full rebuild, so searching it must "
    "equal the from-scratch in-plan IVF x binary top-k — which is "
    "exactly the oracle (the same SQL that gates "
    "ann_ivf_binary_stored).  Completes the store family's write / "
    "read / CDC / compact / incremental-add verbs for the ANN tier.",
)
def ann_ivf_incremental_add(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import tempfile

    from ..operators import ann

    e = _t(spark, sf_dir, "embeddings")
    centroids = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("c_vec")
    )
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    tag = (
        f"{hashlib.sha256(sf_dir.encode()).hexdigest()[:12]}"
        f"_{os.getpid()}_{next(_IVF_ADD_SEQ)}"
    )
    store = os.path.join(
        tempfile.gettempdir(), f"spark_graft_btier_add_{tag}", "emb_b64"
    )
    cut = 400
    hist = ann.ivf_assign(e.filter(F.col("vec_id") < cut), centroids)
    ann.write_binary_tier(hist, store, dim=64, mode="overwrite")
    new = ann.ivf_assign(e.filter(F.col("vec_id") >= cut), centroids)
    ann.write_binary_tier(new, store, dim=64, mode="append")
    tier = ann.read_binary_tier(spark, store)
    return ann.ivf_binary_topk_from_tier(
        tier,
        e.select("vec_id", "embedding"),
        centroids,
        queries,
        dim=64,
        k=10,
        probes=2,
        pool=30,
    )


# ---------------------------------------------------------------------------
# embedding_outlier_scores — the actionable output of the robust
# machinery: per-label top outliers by distance to the geometric median.
# ---------------------------------------------------------------------------

_OUT_TOP = 3


def _outlier_oracle() -> str:
    from ..operators import robust

    gm = robust.weiszfeld_oracle_sql(
        "SELECT CAST(label AS BIGINT) AS g, embedding AS x"
        " FROM embeddings",
        group_col="label",
        iters=2,
    )
    d6 = robust.dist6_sql("p.x", "m.gm", D)
    return f"""
    WITH medians AS (
      SELECT label AS g, median_csv FROM ({gm})
    ),
    pts AS (SELECT CAST(label AS BIGINT) AS g, vec_id, embedding AS x
            FROM embeddings),
    gmv AS (
      SELECT g, {PT.transform(
          "string_split(median_csv, ',')",
          "s -> CAST(s AS DOUBLE)",
          D,
      )} AS gm
      FROM medians
    ),
    scored AS (
      SELECT p.g AS label, p.vec_id,
             CAST(FLOOR(({d6}) * 1000000.0 + 0.5) AS BIGINT) AS dist_micro
      FROM pts p JOIN gmv m ON p.g = m.g
    ),
    ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY label ORDER BY dist_micro DESC, vec_id) AS rk
      FROM scored
    )
    SELECT label, CAST(vec_id AS BIGINT) AS vec_id, dist_micro,
           CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= {_OUT_TOP}
    ORDER BY label, rk
    """


@register(
    "embedding_outlier_scores",
    oracle=_outlier_oracle(),
    doc="per-label embedding outlier candidates — the ACTIONABLE "
    "output the robust machinery exists for: each point's snapped "
    "distance to its label's Weiszfeld geometric median "
    "(operators/robust.py), top-3 farthest per label with a total "
    "tie rule — the label-noise review queue (a mislabeled vector "
    "is far from its class's 0.5-breakdown prototype even when it "
    "drags the mean).  Complements knn_shapley_values (global "
    "helpful/harmful valuation) with the per-class geometric view.  "
    "Medians broadcast; distances map-side; the per-label rank "
    "window runs over class-sized frames (two-phase banded rank at "
    "lake scale).  Oracle: the unrolled Weiszfeld twin's medians "
    "re-parsed from the %.6f grid (exactly what the Spark side "
    "serializes, so both engines rank identical snapped distances).",
)
def embedding_outlier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import robust

    emb = _t(spark, sf_dir, "embeddings").select(
        F.col("label").cast("bigint").alias("label"), "vec_id", "embedding"
    )
    med = robust.geometric_median(emb, "label", "embedding", iters=2)
    # re-snap through the %.6f serialization grid so the ranked
    # distances are bit-identical to the oracle's re-parsed medians
    med6 = med.select(
        "label",
        F.expr(
            f"transform(split({PT.vec_csv6('gm', S)}, ','),"
            f" s -> CAST(s AS DOUBLE))"
        ).alias("gm"),
    )
    d6 = robust.dist6_sql("embedding", "gm", S)
    scored = emb.join(F.broadcast(med6), "label").select(
        "label",
        "vec_id",
        F.expr(
            f"CAST(FLOOR(({d6}) * 1000000.0 + 0.5) AS BIGINT)"
        ).alias("dist_micro"),
    )
    w = Window.partitionBy("label").orderBy(
        F.desc("dist_micro"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= _OUT_TOP)
        .select("label", F.col("vec_id").cast("bigint"), "dist_micro", "rk")
        .orderBy("label", "rk")
    )


# ---------------------------------------------------------------------------
# ann_rbo_eval — rank-biased overlap of the IVF ranking vs brute force.
# ---------------------------------------------------------------------------

_RBO_K = 10
_RBO_P = 0.9


def _rbo_oracle() -> str:
    from .driver_queries_similarity import _IVF_TOPK_ORACLE
    from ..operators.ranks import rbo_weights_p12

    dots = PT.dot_double("e.embedding", "q.q_vec", D)
    weights_vals = ", ".join(
        f"({d}, {w})" for d, w in rbo_weights_p12(_RBO_K, _RBO_P)
    )
    return f"""
    WITH a AS (
      SELECT q_id, vec_id, rank FROM (
        SELECT q.q_id, e.vec_id,
               row_number() OVER (PARTITION BY q.q_id
                                  ORDER BY {dots} DESC, e.vec_id) AS rank
        FROM embeddings e,
             (SELECT vec_id AS q_id, embedding AS q_vec
              FROM embeddings WHERE vec_id < 5) q
      ) WHERE rank <= {_RBO_K}
    ),
    b AS (SELECT q_id, vec_id, rank FROM ({_IVF_TOPK_ORACLE})),
    matched AS (
      SELECT a.q_id AS q, GREATEST(a.rank, b.rank) AS dmin
      FROM a JOIN b ON a.q_id = b.q_id AND a.vec_id = b.vec_id
    ),
    w AS (SELECT * FROM (VALUES {weights_vals}) AS t(d, w_p12)),
    contrib AS (
      SELECT q, d, w_p12, CAST(count(*) AS BIGINT) AS ov
      FROM matched JOIN w ON dmin <= d
      GROUP BY q, d, w_p12
    )
    SELECT q AS q_id,
           CAST(MAX(CASE WHEN d = {_RBO_K} THEN ov END) AS BIGINT)
             AS n_common,
           CAST(SUM(CAST(FLOOR(w_p12 * ov / d + 0.5) AS BIGINT))
                AS BIGINT) AS rbo_p12
    FROM contrib GROUP BY q ORDER BY q_id
    """


@register(
    "ann_rbo_eval",
    oracle=_rbo_oracle(),
    doc="rank-biased overlap of the probes=2 IVF ranking against the "
    "exact brute-force ranking (operators/ranks.rbo_truncated; "
    "Webber, Moffat & Zobel 2010): the top-WEIGHTED rank-similarity "
    "metric — recall@k only counts set overlap, RBO also scores "
    "WHERE the common items sit, which is what an ANN quality "
    "dashboard actually tracks across index rebuilds.  Depth weights "
    "(1-p)p^(d-1) pico-snap ONCE in Python and embed as literals on "
    "both engines (no transcendental in either plan); overlap counts "
    "are exact integers; per-depth terms FLOOR-snap so the score is "
    "an exact BIGINT.  Both rankings are the already-gated machinery "
    "(ann.brute_force_topk, ann.ivf_topk); the comparator's frames "
    "are k-row bounded per query.",
)
def ann_rbo_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import ann
    from ..operators.ranks import rbo_truncated

    e = _t(spark, sf_dir, "embeddings")
    centroids = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("c_vec"),
    )
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    a = ann.brute_force_topk(e, queries, k=_RBO_K)
    assigned = ann.ivf_assign(e, centroids)
    b = ann.ivf_topk(assigned, centroids, queries, k=_RBO_K, probes=2)
    return rbo_truncated(a, b, k=_RBO_K, p=_RBO_P).orderBy("q_id")
