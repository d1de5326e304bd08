"""Driver queries, round 13 — new families, each implemented and
registered in this module:

- corr_matrix_lineitem — full pairwise Pearson correlation matrix
  over the four lineitem measures in ONE aggregation pass: all 14
  sufficient moments (4 sums, 4 squares, 6 cross-products) aggregate
  as exact DECIMAL(18,4) partial sums (order-independent, map-side
  combinable), then each of the 6 unpivoted (col_a, col_b) rows is a
  single snapped double formula.  The data-profiling primitive that
  turns a 100 TB table into a d x d feature-dependence card without
  ever shuffling more than one row of moments per partition.

- ridge_regression_cramer — L2-regularized (ridge) regression of
  extendedprice on (quantity, discount) with intercept, solved in
  closed form: the 3x3 regularized normal equations are built from
  the SAME exact decimal moment sums and solved by Cramer's rule —
  four 3x3 determinants evaluated once on identical scalars on both
  engines, each coefficient snapped once.  The scalable form of
  in-engine linear-model fitting: sufficient statistics shuffle O(d^2)
  values regardless of row count.

- bh_fdr_price_cells — multiple-testing control: one z-statistic per
  (brand, type) cell (cell mean retailprice vs the global mean, exact
  integer-decimal moments), then the Benjamini-Hochberg step-up over
  the DECLARED 150-cell family at q = 0.05.  The inverse-normal
  critical values z(q*i/(2m)) are computed ONCE in Python (Acklam's
  rational approximation) and folded into BOTH dialects as the same
  micro-integer literal table — the _DECAY_MICRO convention that
  keeps libm out of the hash gate entirely: the procedure compares
  exact BIGINT micro-z against BIGINT micro-critical values.

- c4_heuristic_line_filter — C4-style heuristic line filtering
  (Raffel et al. 2020 §2.2) mapped onto the corpus's deterministic
  4-token-window segmentation (operators/linededup.
  segment_token_windows — the same segmenter the CCNet boilerplate
  pass uses, so the two line-level recipes compose): a segment
  survives if it is full-width, contains a function word, and has no
  3x-repeated token; a document survives if >= 3 segments and >= half
  its segments survive.  Per-doc accounting + the reassembled clean
  text are both pinned by the hash.

- simrank_copurchase — two SimRank iterations (Jeh & Widom 2002) on
  the part <- order bipartite graph, every term micro-snapped so the
  totals are exact BIGINTs: s1(o1,o2) for order pairs is one integer
  division per pair, s2(a,b) for candidate part pairs (support >= 2)
  sums those exact integers plus the |Ia n Ib| diagonal before ONE
  final integer division.  "Similar parts buy similar orders buy
  similar parts" — the recursive link-prediction complement to the
  one-hop Adamic-Adar family.

- mst_copurchase_backbone — maximum-support spanning forest via the
  NEW distributed Boruvka operator (operators/graph.boruvka_msf),
  unique under the strict (w, lo, hi) total order and gated against
  a sequential Kruskal twin; the single-linkage dendrogram edge set.

- mondrian_k_anonymize — Mondrian multidimensional k-anonymization
  (LeFevre et al. 2006): fixed-cycle median splits gated on both
  halves keeping >= k rows, releasing generalized QI boxes.  The
  TRANSFORMATION leg of the privacy family beside the three audits.

- mlp_quality_inference — a 64x8x1 ReLU MLP quality scorer evaluated
  as ONE generated columnar expression (weights are exact binary
  fractions folded into both dialects as identical literals): neural
  inference riding whole-stage codegen instead of a UDF — the
  distilled-classifier-over-the-corpus pattern at engine speed.

- fts_maxscore_pruned_search — BM25 top-k under MaxScore pruning
  (operators/fts.maxscore_topk): seed-pass theta bound + driver-side
  essential/non-essential term split, so only documents matching an
  essential term enter the aggregation shuffle, while the oracle is
  the EXHAUSTIVE BM25 — the gate proves safe-up-to-rank pruning.

- streaming_misra_gries_hitters — Misra-Gries heavy hitters as a
  custom stateful streaming operator (streaming.pipeline.
  stateful_misra_gries): the order-DEPENDENT automaton replayed in
  ascending event_id order per batch, oracle = a pure-Python twin
  over the same global order.

- ldp_randomized_response — k-ary generalized randomized response
  (eps = ln(3(k-1)) local DP) with exact rational design
  probabilities and the matching unbiased frequency estimator; the
  deterministic polynomial event hash plays the coin, so the
  mechanism is replayable and hash-gateable.

- plsa_topics_em — two full pLSA EM iterations (Hofmann 1999) in
  exact micro-unit integer arithmetic (uniform theta0, hash-seeded
  phi0, every responsibility and parameter an integer
  floor-division) — latent topic factorization with a bit-exact
  gate and a bit-exact Python twin.

Conventions as everywhere: exact BIGINT / DECIMAL moments, each
division-to-double micro-snapped once from exact integers, total-order
tie-breaks on every ranking, literal tables instead of libm.

No reference-file citation applies: /root/reference stops at
retrieval; these extend the profiling / ML / stats / curation / graph
families (SURVEY.md beyond-reference operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions import portable as PT
from ..operators import linededup
from ..session import load_table
from .registry import register

D = PT.DUCKDB
S = PT.SPARK


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _snap(expr: str, digits: float = 1e6) -> str:
    """round6 convention: quantize the ONE double result of an exact-
    moment formula so 1-ULP libm/cast differences can't flip the hash."""
    return f"CAST(FLOOR((({expr}) * {digits:.1f}) + 0.5) AS DOUBLE) / {digits:.1f}"


# ---------------------------------------------------------------------------
# corr_matrix_lineitem
# ---------------------------------------------------------------------------

_CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")

#: per-row double products are exact (quantity <= 50, price < ~110k
#: with <= 2 decimals, discount/tax < 1 with <= 2 decimals: every
#: product is an integer in 1e-4 units far below 2^53), so the
#: DECIMAL(18,4) cast is lossless and the widened decimal SUM
#: (DECIMAL(28,4) on Spark, DECIMAL(38,4) on DuckDB) is
#: order-independent with ~1e10 digits of headroom at petabyte row
#: counts — the regression_price_vs_quantity recipe generalized to
#: the full moment matrix.
def _corr_sums_sql() -> str:
    parts = ["count(*) AS n"]
    for c in _CORR_COLS:
        parts.append(f"sum(CAST({c} AS DECIMAL(18,4))) AS s_{c}")
        parts.append(
            f"sum(CAST(CAST({c} AS DOUBLE) * CAST({c} AS DOUBLE) "
            f"AS DECIMAL(18,4))) AS ss_{c}"
        )
    for i, a in enumerate(_CORR_COLS):
        for b in _CORR_COLS[i + 1:]:
            parts.append(
                f"sum(CAST(CAST({a} AS DOUBLE) * CAST({b} AS DOUBLE) "
                f"AS DECIMAL(18,4))) AS sx_{a}_{b}"
            )
    return ", ".join(parts)


def _corr_pair_sql(a: str, b: str) -> str:
    """Pearson r for one pair from the shared moment row — identical
    arithmetic in both dialects (casts, *, -, /, sqrt are all
    IEEE-correctly-rounded), snapped once."""
    n = "CAST(n AS DOUBLE)"
    sa, sb = f"CAST(s_{a} AS DOUBLE)", f"CAST(s_{b} AS DOUBLE)"
    ssa, ssb = f"CAST(ss_{a} AS DOUBLE)", f"CAST(ss_{b} AS DOUBLE)"
    sab = f"CAST(sx_{a}_{b} AS DOUBLE)"
    num = f"({n} * {sab} - {sa} * {sb})"
    den = f"sqrt(({n} * {ssa} - {sa} * {sa}) * ({n} * {ssb} - {sb} * {sb}))"
    return _snap(f"{num} / {den}")


def _corr_projection_sql() -> str:
    arms = []
    for i, a in enumerate(_CORR_COLS):
        for b in _CORR_COLS[i + 1:]:
            arms.append(
                f"SELECT '{a}' AS col_a, '{b}' AS col_b, "
                f"CAST(n AS BIGINT) AS n, {_corr_pair_sql(a, b)} AS corr "
                f"FROM sums"
            )
    return " UNION ALL ".join(arms)


_CORR_ORACLE = f"""
    WITH sums AS (SELECT {_corr_sums_sql()} FROM lineitem),
    pairs AS ({_corr_projection_sql()})
    SELECT * FROM pairs ORDER BY col_a, col_b
"""


@register(
    "corr_matrix_lineitem",
    oracle=_CORR_ORACLE,
    doc="pairwise Pearson correlation matrix over the four lineitem "
    "measures from ONE moment-aggregation pass: 15 decimal-exact "
    "sufficient statistics (map-side combinable, one shuffle of one "
    "short row), unpivoted into 6 (col_a, col_b, corr) rows each "
    "computed and snapped once from identical scalars. The built-in "
    "float corr() aggregate is order-dependent and can never "
    "hash-gate; the moment form is both reproducible and the only "
    "shape that holds at 100 TB — the d^2 moments are O(1) bytes per "
    "partition no matter the row count.",
)
def corr_matrix_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("_corr_lineitem")
    # ONE aggregation over the fact table; the 6 output rows unpivot
    # from the single moment row via stack() — the oracle's UNION ALL
    # over a 1-row CTE is the same relation, but a UNION of view
    # references would rescan the fact table 6x on the Spark side
    arms = []
    for i, a in enumerate(_CORR_COLS):
        for b in _CORR_COLS[i + 1:]:
            arms.append(f"'{a}', '{b}', {_corr_pair_sql(a, b)}")
    return spark.sql(
        f"WITH sums AS (SELECT {_corr_sums_sql()} FROM _corr_lineitem) "
        f"SELECT col_a, col_b, CAST(n AS BIGINT) AS n, corr FROM sums "
        f"LATERAL VIEW stack(6, {', '.join(arms)}) AS col_a, col_b, corr "
        "ORDER BY col_a, col_b"
    )


# ---------------------------------------------------------------------------
# ridge_regression_cramer
# ---------------------------------------------------------------------------

_RIDGE_LAMBDA = 1000  # L2 strength in squared-feature units


def _ridge_sums_sql() -> str:
    """Moments for y = extendedprice on x1 = quantity, x2 = discount
    (+ intercept). Same lossless DECIMAL(18,4) per-row products."""
    return """
      count(*) AS n,
      sum(CAST(l_quantity AS DECIMAL(18,4))) AS s1,
      sum(CAST(l_discount AS DECIMAL(18,4))) AS s2,
      sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS sy,
      sum(CAST(CAST(l_quantity AS DOUBLE) * CAST(l_quantity AS DOUBLE)
               AS DECIMAL(18,4))) AS s11,
      sum(CAST(CAST(l_quantity AS DOUBLE) * CAST(l_discount AS DOUBLE)
               AS DECIMAL(18,4))) AS s12,
      sum(CAST(CAST(l_discount AS DOUBLE) * CAST(l_discount AS DOUBLE)
               AS DECIMAL(18,4))) AS s22,
      sum(CAST(CAST(l_quantity AS DOUBLE) * CAST(l_extendedprice AS DOUBLE)
               AS DECIMAL(18,4))) AS s1y,
      sum(CAST(CAST(l_discount AS DOUBLE) * CAST(l_extendedprice AS DOUBLE)
               AS DECIMAL(18,4))) AS s2y
    """


def _ridge_projection_sql() -> str:
    """Cramer's-rule solve of (X'X + lambda*diag(0,1,1)) beta = X'y.

    The intercept row/col is unpenalized (standard ridge practice).
    a..f name the symmetric matrix entries, r0..r2 the RHS; every
    determinant is one arithmetic expression over the SAME doubles on
    both engines, each coefficient snapped once.
    """
    lam = float(_RIDGE_LAMBDA)
    n = "CAST(n AS DOUBLE)"
    defs = {
        "a": n,
        "b": "CAST(s1 AS DOUBLE)",
        "c": "CAST(s2 AS DOUBLE)",
        "d": f"(CAST(s11 AS DOUBLE) + {lam:.1f})",
        "e": "CAST(s12 AS DOUBLE)",
        "f": f"(CAST(s22 AS DOUBLE) + {lam:.1f})",
        "r0": "CAST(sy AS DOUBLE)",
        "r1": "CAST(s1y AS DOUBLE)",
        "r2": "CAST(s2y AS DOUBLE)",
    }

    def det(m00, m01, m02, m10, m11, m12, m20, m21, m22):
        # 3x3 determinant, fully parenthesized, same evaluation order
        # in both engines
        return (
            f"({m00} * ({m11} * {m22} - {m12} * {m21}) "
            f"- {m01} * ({m10} * {m22} - {m12} * {m20}) "
            f"+ {m02} * ({m10} * {m21} - {m11} * {m20}))"
        )

    a, b, c, d, e, f_, r0, r1, r2 = (
        defs["a"], defs["b"], defs["c"], defs["d"], defs["e"], defs["f"],
        defs["r0"], defs["r1"], defs["r2"],
    )
    det_a = det(a, b, c, b, d, e, c, e, f_)
    det_0 = det(r0, b, c, r1, d, e, r2, e, f_)
    det_1 = det(a, r0, c, b, r1, e, c, r2, f_)
    det_2 = det(a, b, r0, b, d, r1, c, e, r2)
    return (
        f"SELECT CAST(n AS BIGINT) AS n, "
        f"{_snap(f'{det_0} / {det_a}')} AS beta0, "
        f"{_snap(f'{det_1} / {det_a}')} AS beta1, "
        f"{_snap(f'{det_2} / {det_a}')} AS beta2 "
        f"FROM sums"
    )


_RIDGE_ORACLE = f"""
    WITH sums AS (SELECT {_ridge_sums_sql()} FROM lineitem)
    {_ridge_projection_sql()}
"""


@register(
    "ridge_regression_cramer",
    oracle=_RIDGE_ORACLE,
    doc=f"ridge regression (lambda = {_RIDGE_LAMBDA}, intercept "
    "unpenalized) of extendedprice on quantity and discount, solved "
    "in closed form by Cramer's rule over the 3x3 regularized normal "
    "equations: nine decimal-exact moment sums (ONE map-side-combined "
    "shuffle of one short row at any scale), four 3x3 determinants "
    "evaluated once on identical scalars, each coefficient snapped "
    "once. The sufficient-statistics formulation is what makes "
    "in-engine model fitting scale: a 100 TB fit shuffles exactly as "
    "many bytes as a 100 MB one.",
)
def ridge_regression_cramer(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("_ridge_lineitem")
    spark.sql(
        f"SELECT {_ridge_sums_sql()} FROM _ridge_lineitem"
    ).createOrReplaceTempView("_r13_ridge_sums")
    return spark.sql(
        "WITH sums AS (SELECT * FROM _r13_ridge_sums) "
        + _ridge_projection_sql()
    )


# ---------------------------------------------------------------------------
# bh_fdr_price_cells
# ---------------------------------------------------------------------------

_BH_M = 150  # declared family: 25 brands x 6 types
_BH_Q = 0.05
_BH_MIN_N = 5


def _inv_norm_cdf(p: float) -> float:
    """Acklam's rational approximation to the standard-normal
    quantile (|rel err| < 1.15e-9) — pure Python, evaluated once at
    module import to build the literal critical-value table."""
    import math

    a = [-3.969683028665376e+01, 2.209460984245205e+02,
         -2.759285104469687e+02, 1.383577518672690e+02,
         -3.066479806614716e+01, 2.506628277459239e+00]
    b = [-5.447609879822406e+01, 1.615858368580409e+02,
         -1.556989798598866e+02, 6.680131188771972e+01,
         -1.328068155288572e+01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01,
         -2.400758277161838e+00, -2.549732539343734e+00,
         4.374664141464968e+00, 2.938163982698783e+00]
    d = [7.784695709041462e-03, 3.224671290700398e-01,
         2.445134137142996e+00, 3.754408661907416e+00]
    plow, phigh = 0.02425, 1 - 0.02425
    if p < plow:
        q = math.sqrt(-2 * math.log(p))
        return (((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q
                + c[5]) / ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1)
    if p > phigh:
        q = math.sqrt(-2 * math.log(1 - p))
        return -((((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q
                 + c[5]) / ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1))
    q = p - 0.5
    r = q * q
    return ((((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r
            + a[5]) * q /
            (((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1))


#: micro-integer two-sided critical values |z| >= crit for
#: p <= q*i/m, i = 1.._BH_M: crit_i = Phi^-1(1 - q*i/(2m)).  Computed
#: ONCE here and folded into BOTH dialects as the same literal array —
#: no inverse CDF (and no erf/exp libm path) ever runs inside either
#: engine, so the BH comparison is pure BIGINT arithmetic.
_BH_CRIT_MICRO = [
    int(_inv_norm_cdf(1.0 - _BH_Q * i / (2.0 * _BH_M)) * 1_000_000 + 0.5)
    for i in range(1, _BH_M + 1)
]


def _bh_crit_table(dialect: str) -> str:
    lits = ", ".join(str(v) for v in _BH_CRIT_MICRO)
    if dialect == D:
        return (
            f"SELECT CAST(g.i + 1 AS BIGINT) AS rk, "
            f"CAST(([{lits}])[g.i + 1] AS BIGINT) AS crit_micro "
            f"FROM unnest(range({_BH_M})) AS g(i)"
        )
    return (
        f"SELECT CAST(pos + 1 AS BIGINT) AS rk, "
        f"CAST(crit_micro AS BIGINT) AS crit_micro "
        f"FROM (SELECT posexplode(array({lits})) AS (pos, crit_micro))"
    )


def _bh_body_sql(dialect: str) -> str:
    """Shared query body: per-cell z from exact moments, rank by
    (|z| desc, brand, type), BH step-up against the literal table."""
    n = "CAST(n AS DOUBLE)"
    sx, sxx = "CAST(sx AS DOUBLE)", "CAST(sxx AS DOUBLE)"
    nc, sc = "CAST(n_c AS DOUBLE)", "CAST(s_c AS DOUBLE)"
    # z = (mean_c - mean_g) * n * sqrt(n_c) / sqrt(n*Sxx - Sx^2)
    z = (
        f"(({sc} / {nc} - {sx} / {n}) * {n} * sqrt({nc})"
        f" / sqrt({n} * {sxx} - {sx} * {sx}))"
    )
    z_micro = f"CAST(FLOOR(({z}) * 1000000.0 + 0.5) AS BIGINT)"
    return f"""
    cells AS (
      SELECT p_brand, p_type, count(*) AS n_c,
             sum(CAST(p_retailprice AS DECIMAL(18,4))) AS s_c
      FROM part GROUP BY p_brand, p_type
      HAVING count(*) >= {_BH_MIN_N}
    ),
    gmoms AS (
      SELECT count(*) AS n,
             sum(CAST(p_retailprice AS DECIMAL(18,4))) AS sx,
             sum(CAST(CAST(p_retailprice AS DOUBLE) *
                      CAST(p_retailprice AS DOUBLE)
                      AS DECIMAL(18,4))) AS sxx
      FROM part
    ),
    zed AS (
      SELECT p_brand, p_type, CAST(n_c AS BIGINT) AS n_c,
             {z_micro} AS z_micro
      FROM cells CROSS JOIN gmoms
    ),
    ranked AS (
      SELECT p_brand, p_type, n_c, z_micro,
             row_number() OVER (
               ORDER BY abs(z_micro) DESC, p_brand, p_type) AS rk
      FROM zed
    ),
    flagged AS (
      SELECT r.*, c.crit_micro,
             CASE WHEN abs(r.z_micro) >= c.crit_micro
                  THEN r.rk END AS hit_rk
      FROM ranked r JOIN crit c ON c.rk = r.rk
    ),
    cut AS (SELECT max(hit_rk) AS i_max FROM flagged)
    SELECT p_brand, p_type, n_c, z_micro, CAST(rk AS BIGINT) AS rk,
           coalesce(rk <= i_max, FALSE) AS discovery
    FROM flagged CROSS JOIN cut
    ORDER BY rk
    """


_BH_ORACLE = f"WITH crit AS ({_bh_crit_table(D)}), {_bh_body_sql(D)}"


@register(
    "bh_fdr_price_cells",
    oracle=_BH_ORACLE,
    doc=f"Benjamini-Hochberg FDR control (q = {_BH_Q}) over the "
    f"declared {_BH_M}-cell brand x type family: per-cell one-sample "
    "z of mean retailprice vs the global mean from decimal-exact "
    "moments (one short-row shuffle), |z| ranked with a total-order "
    "tie-break, then the step-up cut i_max = max(i: |z|_(i) >= "
    "z(q*i/2m)) rejects ranks 1..i_max. The inverse-normal critical "
    "values are a Python-computed micro-integer literal table in BOTH "
    "dialects (the _DECAY_MICRO convention), so the whole procedure "
    "is exact BIGINT compares — no erf/exp/inverse-CDF libm anywhere. "
    "Scale: the hypothesis table is |cells| rows regardless of fact "
    "count; the single global window over ~150 rows is free.",
)
def bh_fdr_price_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    part.createOrReplaceTempView("_r13_part")
    return spark.sql(
        f"WITH part AS (SELECT * FROM _r13_part), "
        f"crit AS ({_bh_crit_table(S)}), {_bh_body_sql(S)}"
    )


# ---------------------------------------------------------------------------
# c4_heuristic_line_filter
# ---------------------------------------------------------------------------

_C4_W = 4
_C4_FUNC_WORDS = ("a", "the")
_C4_MAX_REP = 3  # a token repeated this often kills the segment
_C4_MIN_KEPT = 3  # doc survives with >= this many kept segments...
# ...AND at least half its segments kept (2*n_kept >= n_segments)


def _c4_seg_flags_sql(toks: str, dialect: str) -> str:
    """Boolean keep-expression for one segment, shared by both
    dialects: full-width AND has a function word AND no token repeated
    >= _C4_MAX_REP times (the O(w^2) nested scan is constant work at
    w = 4)."""
    full = f"{PT.size_(toks, dialect)} = {_C4_W}"
    func = " OR ".join(
        PT.array_contains(toks, f"'{w}'", dialect) for w in _C4_FUNC_WORDS
    )
    counts = PT.transform(
        toks, f"t -> {PT.size_(PT.filter_(toks, 'x -> x = t', dialect), dialect)}",
        dialect,
    )
    norep = f"{PT.array_max(counts, dialect)} < {_C4_MAX_REP}"
    return f"(({full}) AND ({func}) AND ({norep}))"


_C4_ORACLE = f"""
WITH t AS (
  SELECT doc_id, string_split(coalesce(text, ''), ' ') AS toks FROM documents
),
segs AS (
  SELECT doc_id, CAST(g.i AS BIGINT) AS seg_pos,
         array_to_string(
           list_slice(toks, CAST(g.i * {_C4_W} + 1 AS BIGINT),
                      CAST(g.i * {_C4_W} + {_C4_W} AS BIGINT)), ' ') AS seg
  FROM t, unnest(range(CAST(ceil(len(toks) / {_C4_W}.0) AS BIGINT))) AS g(i)
),
flags AS (
  SELECT doc_id, seg_pos, seg,
         {_c4_seg_flags_sql("string_split(seg, ' ')", 'duckdb')} AS kept
  FROM segs
),
docs_ AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_segments,
         CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         coalesce(string_agg(CASE WHEN kept THEN seg END,
                             ' ' ORDER BY seg_pos), '') AS clean_text
  FROM flags GROUP BY doc_id
)
SELECT doc_id, n_segments, n_kept,
       (n_kept >= {_C4_MIN_KEPT} AND 2 * n_kept >= n_segments) AS keep_doc,
       clean_text
FROM docs_ ORDER BY doc_id
"""


@register(
    "c4_heuristic_line_filter",
    oracle=_C4_ORACLE,
    doc="C4-style heuristic line filtering (Raffel et al. 2020 s2.2) "
    "on the deterministic 4-token-window segmentation "
    "(linededup.segment_token_windows — the same segmenter the CCNet "
    "boilerplate pass uses, so the two line-level recipes compose in "
    "one curation pipeline): a segment survives if full-width, "
    "containing a function word, and free of 3x-repeated tokens; a "
    f"document survives with >= {_C4_MIN_KEPT} kept segments and >= "
    "half kept. Scale: map-side explode + per-segment O(w^2) "
    "constant-width expression work, ONE doc_id reassembly shuffle, "
    "no windows, no UDFs — the heuristic complement to the "
    "cross-document frequency recipe (boilerplate_segment_removal).",
)
def c4_heuristic_line_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    segs = linededup.segment_token_windows(docs, w=_C4_W)
    flagged = segs.withColumn(
        "kept", F.expr(_c4_seg_flags_sql("split(seg, ' ')", S))
    )
    kept_sorted = F.filter(
        F.array_sort(F.collect_list(F.struct("seg_pos", "seg", "kept"))),
        lambda s: s["kept"],
    )
    agg = flagged.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_segments"),
        F.sum(F.when(F.col("kept"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_kept"),
        F.array_join(
            F.transform(kept_sorted, lambda s: s["seg"]), " "
        ).alias("clean_text"),
    )
    return agg.select(
        "doc_id",
        "n_segments",
        "n_kept",
        (
            (F.col("n_kept") >= _C4_MIN_KEPT)
            & (2 * F.col("n_kept") >= F.col("n_segments"))
        ).alias("keep_doc"),
        "clean_text",
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# simrank_copurchase
# ---------------------------------------------------------------------------

_SR_C8 = 8  # decay C = 0.8 as the exact rational 8/10
_SR_TOP = 50
_SR_SUPPORT = 2  # candidate part pairs must share >= this many orders

#: s1 order-pair similarities carry 12 fixed-point digits; the s2
#: part-pair totals stay exact BIGINTs: 8 * common * 1e11 <= 4e13 per
#: term, summed over <= |Ia|*|Ib| order pairs (<= ~1e4 at any sane
#: order fan-in) * 1e12 <= 1e16, times 8 <= 8e16 — three decimal
#: orders below the BIGINT edge.
_SR_UNIT = 10**12


def _simrank_tail_sql(dialect: str) -> str:
    """The SimRank CTE chain DOWNSTREAM of po/oo/cand — shared between
    the oracle (where po/oo/cand are the self-join CTEs of
    _simrank_body_sql) and the Spark side (where they are DataFrame-
    built temp views; see simrank_copurchase).  Dialect only affects
    integer division."""
    s1u = PT.idiv(
        f"{_SR_C8} * oo.common * {_SR_UNIT // 10}", "os1.np * os2.np", dialect
    )
    s2u = PT.idiv(
        f"{_SR_C8} * ssum", "10 * pa.no * pb.no", dialect
    )
    return f"""
    osize AS (SELECT o, CAST(count(*) AS BIGINT) AS np FROM po GROUP BY o),
    psize AS (SELECT p, CAST(count(*) AS BIGINT) AS no FROM po GROUP BY p),
    expanded AS (
      -- canonical (lo_o, hi_o) keys are PRE-projected plain columns:
      -- the oo probe below must be a pure equi-join (expression keys
      -- + a <> residual push DuckDB into a blockwise NL join and
      -- defeat Spark's shuffle-hash pruning alike)
      SELECT c.a, c.b, ia.o AS o1, ib.o AS o2,
             least(ia.o, ib.o) AS lo_o, greatest(ia.o, ib.o) AS hi_o
      FROM cand c
      JOIN po ia ON ia.p = c.a
      JOIN po ib ON ib.p = c.b
    ),
    terms AS (
      -- the diagonal o1 = o2 has lo_o = hi_o, which never matches oo
      -- (strictly o1 < o2), so the CASE needs no join-side predicate
      SELECT e.a, e.b,
             CASE WHEN e.o1 = e.o2 THEN CAST({_SR_UNIT} AS BIGINT)
                  WHEN oo.common IS NULL THEN CAST(0 AS BIGINT)
                  ELSE CAST({s1u} AS BIGINT) END AS s1u
      FROM expanded e
      LEFT JOIN oo ON oo.o1 = e.lo_o AND oo.o2 = e.hi_o
      JOIN osize os1 ON os1.o = e.o1
      JOIN osize os2 ON os2.o = e.o2
    ),
    sums2 AS (
      SELECT a, b, sum(s1u) AS ssum FROM terms GROUP BY a, b
    ),
    scored AS (
      SELECT s.a, s.b, pa.no AS n_orders_a, pb.no AS n_orders_b,
             CAST({s2u} AS BIGINT) AS s2_p12
      FROM sums2 s JOIN psize pa ON pa.p = s.a JOIN psize pb ON pb.p = s.b
    )
    SELECT CAST(a AS BIGINT) AS part_a, CAST(b AS BIGINT) AS part_b,
           n_orders_a, n_orders_b, s2_p12
    FROM scored
    ORDER BY s2_p12 DESC, part_a, part_b
    LIMIT {_SR_TOP}
    """


def _simrank_body_sql(dialect: str) -> str:
    """Two SimRank iterations on the part <- order bipartite graph —
    the full CTE body (po + the two self-join CTEs + the shared tail).
    The ORACLE runs this verbatim; the Spark side builds po/oo/cand as
    DataFrames (per-order pair expansion instead of the self-joins)
    and runs only the tail (r14; same rows, hash-gate-proven)."""
    return f"""
    po AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    oo AS (
      SELECT x.o AS o1, y.o AS o2, CAST(count(*) AS BIGINT) AS common
      FROM po x JOIN po y ON x.p = y.p AND x.o < y.o
      GROUP BY x.o, y.o
    ),
    cand AS (
      SELECT x.p AS a, y.p AS b, CAST(count(*) AS BIGINT) AS common_orders
      FROM po x JOIN po y ON x.o = y.o AND x.p < y.p
      GROUP BY x.p, y.p
      HAVING count(*) >= {_SR_SUPPORT}
    ),
    {_simrank_tail_sql(dialect)}"""


_SIMRANK_ORACLE = f"WITH {_simrank_body_sql(D)}"


@register(
    "simrank_copurchase",
    oracle=_SIMRANK_ORACLE,
    doc="two SimRank iterations (Jeh & Widom 2002, C = 0.8) on the "
    "part <- order bipartite graph, exact to the last bit: iteration "
    "1 gives order-order similarity s1 = C*|common parts|/(np1*np2) "
    "as ONE integer floor-division per co-purchase order pair; "
    "iteration 2 sums those exact picounits (plus the exact "
    "|Ia n Ib| diagonal) over each candidate part pair's order "
    "product set before ONE final integer division — no double "
    "anywhere. Scale: candidates prune to support >= 2 BEFORE the "
    "order-product expansion, so the blowup is sum(na*nb) over "
    "already-similar pairs, not the catalog square; oo joins on "
    "canonicalized (least, greatest) keys; every shuffle is keyed "
    "and skew-bounded by order fan-in. The recursive link-prediction "
    "complement to one-hop Adamic-Adar.",
)
def simrank_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import graph

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # r14: po is consumed by FIVE plan legs (osize, psize, the two
    # expanded probes, and both pair expansions) — the CTE form
    # recomputed the projection+distinct per reference; one eager
    # checkpoint computes it once and gives every consumer honest
    # size estimates (the r13 change-10 cascade)
    po = (
        li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    po.createOrReplaceTempView("_r14_sr_po")
    # oo (order pairs sharing a part, count = |common parts|) and cand
    # (part pairs sharing >= 2 orders) are the two self-join CTEs of
    # the oracle body rewritten as per-group pair expansion
    # (graph.copurchase_pairs): collect_set per group + map-side pair
    # explode — one hash-agg exchange instead of exchange + two sorts
    # + merge join per CTE (guide §2.4/§3.1; the r13 change-10 shape
    # applied to the last SQL-string sites).  Row-identical: the
    # expansion enumerates exactly the lo < hi pairs the self-join
    # produced, and count(*) per pair is the same multiplicity.
    oo = (
        graph.copurchase_pairs(po, order_col="p", part_col="o", lo="o1", hi="o2")
        .groupBy("o1", "o2")
        .agg(F.count("*").cast("bigint").alias("common"))
    )
    oo.createOrReplaceTempView("_r14_sr_oo")
    cand = (
        graph.copurchase_pairs(po, order_col="o", part_col="p", lo="a", hi="b")
        .groupBy("a", "b")
        .agg(F.count("*").cast("bigint").alias("common_orders"))
        .filter(F.col("common_orders") >= _SR_SUPPORT)
    )
    cand.createOrReplaceTempView("_r14_sr_cand")
    return spark.sql(
        f"WITH po AS (SELECT * FROM _r14_sr_po), "
        f"oo AS (SELECT * FROM _r14_sr_oo), "
        f"cand AS (SELECT * FROM _r14_sr_cand), "
        f"{_simrank_tail_sql(S)}"
    )


# ---------------------------------------------------------------------------
# mst_copurchase_backbone
# ---------------------------------------------------------------------------

_MST_SUPPORT2_SQL = """
  SELECT least(x.p, y.p) AS lo, greatest(x.p, y.p) AS hi,
         CAST(count(*) AS BIGINT) AS c
  FROM (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem) x
  JOIN (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem) y
    ON x.o = y.o AND x.p < y.p
  GROUP BY 1, 2 HAVING count(*) >= 2
"""


def _mst_oracle(sf_dir: str) -> str:
    """Python-twin oracle: sequential Kruskal over the support-2
    co-purchase edges under the SAME strict total order (w = -support,
    lo, hi), emitted as VALUES — the kcore/bpe convention for
    iterative fixpoints.  Kruskal and Boruvka are different algorithms
    arriving at the same unique forest, which is exactly what the
    hash gate proves."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{sf_dir}/lineitem.parquet')"
    )
    edges = [
        (int(lo), int(hi), int(c))
        for lo, hi, c in con.execute(_MST_SUPPORT2_SQL).fetchall()
    ]
    con.close()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    chosen = []
    for lo, hi, c in sorted(edges, key=lambda e: (-e[2], e[0], e[1])):
        ra, rb = find(lo), find(hi)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
            chosen.append((lo, hi, c))
    if not chosen:
        return (
            "SELECT CAST(NULL AS BIGINT) AS part_lo, "
            "CAST(NULL AS BIGINT) AS part_hi, "
            "CAST(NULL AS BIGINT) AS support WHERE FALSE"
        )
    vals = ", ".join(f"({lo}, {hi}, {c})" for lo, hi, c in sorted(chosen))
    return (
        "SELECT CAST(part_lo AS BIGINT) AS part_lo, "
        "CAST(part_hi AS BIGINT) AS part_hi, "
        "CAST(support AS BIGINT) AS support "
        f"FROM (VALUES {vals}) AS t(part_lo, part_hi, support) "
        "ORDER BY part_lo, part_hi"
    )


@register(
    "mst_copurchase_backbone",
    oracle=_mst_oracle,
    doc="maximum-support spanning forest of the support-2 co-purchase "
    "graph via distributed Boruvka (graph.boruvka_msf, w = -support "
    "so min-forest = strongest backbone): per round every component "
    "picks its strongest incident edge (one min_by shuffle keyed by "
    "component id), the picked edges contract through the reused "
    "star-contraction machinery, intra-component edges drop "
    "PERMANENTLY, O(log V) rounds with localCheckpoint lineage "
    "control. The strict (w, lo, hi) total order makes the forest "
    "unique, so a sequential Kruskal twin (different algorithm, same "
    "order) hash-gates it exactly. The MSF is the single-linkage "
    "clustering dendrogram's edge set — cutting it at a support "
    "threshold IS hierarchical dedup clustering at 100 TB.",
)
def mst_copurchase_backbone(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import graph

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # Spark side builds the same support-2 weighted edges as the
    # oracle's _MST_SUPPORT2_SQL via per-order pair expansion
    # (graph.copurchase_pairs — no lineitem self-join; collect_set
    # subsumes the SQL's per-order DISTINCT): identical (lo, hi, c)
    # rows, hash-gate-proven
    edges = (
        graph.copurchase_pairs(li)
        .groupBy("lo", "hi")
        .agg(F.count("*").cast("bigint").alias("c"))
        .filter(F.col("c") >= 2)
        .select("lo", "hi", (-F.col("c")).alias("w"))
    )
    msf = graph.boruvka_msf(edges, a="lo", b="hi", w="w")
    return (
        msf.select(
            F.col("lo").cast("bigint").alias("part_lo"),
            F.col("hi").cast("bigint").alias("part_hi"),
            (-F.col("w")).cast("bigint").alias("support"),
        )
        .orderBy("part_lo", "part_hi")
    )


# ---------------------------------------------------------------------------
# mondrian_k_anonymize
# ---------------------------------------------------------------------------

_MON_K = 100
_MON_DEPTH = 3
_MON_DIMS = ("bal_c", "ck", "bal_c")  # strict-cycle dimension choice


def _mondrian_median(col: str, dialect: str) -> str:
    """Exact interpolated median — Spark percentile() and DuckDB
    quantile_cont() share the lower+(upper-lower)*frac rule; on
    integer cents the result is an exact integer-or-half double."""
    fn = "percentile" if dialect == S else "quantile_cont"
    return f"{fn}({col}, 0.5)"


def _mondrian_sql(dialect: str) -> str:
    lvls = []
    prev = "base"
    for i, dim in enumerate(_MON_DIMS):
        med = _mondrian_median(f"{prev}.{dim}", dialect)
        lvls.append(f"""
    med{i} AS (SELECT node, {med} AS med
               FROM {prev} GROUP BY node),
    side{i} AS (
      SELECT /*+ BROADCAST(m) */ p.node, p.bal_c, p.ck,
             CASE WHEN p.{dim} <= m.med THEN 0 ELSE 1 END AS side
      FROM {prev} p JOIN med{i} m ON m.node = p.node),
    cnt{i} AS (
      SELECT node,
             sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS nl,
             sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS nr
      FROM side{i} GROUP BY node),
    lvl{i} AS (
      SELECT /*+ BROADCAST(c) */
             CASE WHEN c.nl >= {_MON_K} AND c.nr >= {_MON_K}
                  THEN s.node * 2 + s.side ELSE s.node END AS node,
             s.bal_c, s.ck
      FROM side{i} s JOIN cnt{i} c ON c.node = s.node)""")
        prev = f"lvl{i}"
    body = ",".join(lvls)
    return f"""
    WITH base AS (
      SELECT CAST(1 AS BIGINT) AS node,
             CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_c,
             CAST(c_custkey AS BIGINT) AS ck
      FROM customer),{body}
    SELECT node, CAST(count(*) AS BIGINT) AS n,
           min(bal_c) AS bal_min, max(bal_c) AS bal_max,
           min(ck) AS ck_min, max(ck) AS ck_max
    FROM {prev} GROUP BY node ORDER BY node
    """


@register(
    "mondrian_k_anonymize",
    oracle=_mondrian_sql(D),
    doc=f"Mondrian multidimensional k-anonymization (LeFevre et al. "
    f"2006, k = {_MON_K}, strict {_MON_DEPTH}-level dimension cycle "
    "acctbal/custkey/acctbal): each node median-splits on the cycle "
    "dimension ONLY when both halves keep >= k rows, producing the "
    "generalized quasi-identifier boxes ([bal_min,bal_max] x "
    "[ck_min,ck_max], n) that replace raw QI values in a released "
    "table. The TRANSFORMATION leg of the privacy family — "
    "k_anonymity_audit / l_diversity_audit / t_closeness_audit "
    "measure a release, this produces one. All-integer output (exact "
    "cents, exact keys); the interpolated median is the one shared-"
    "semantics double and only steers partitioning. Scale: each "
    "level is one tiny median aggregate (node count <= 2^level rows, "
    "broadcast back) + one map-side side assignment — the fact table "
    "shuffles ZERO times; depth, not data, bounds the work.",
)
def mondrian_k_anonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    cust.createOrReplaceTempView("_r13_customer")
    return spark.sql(
        _mondrian_sql(S).replace("FROM customer", "FROM _r13_customer")
    )


# ---------------------------------------------------------------------------
# mlp_quality_inference
# ---------------------------------------------------------------------------

_MLP_IN = 64
_MLP_HID = 8
_MLP_TOP = 20


def _mlp_weights() -> tuple[list[list[float]], list[float], list[float], float]:
    """Deterministic literal weights: a seeded LCG draws integers in
    [-9, 9] scaled by 1/16 — every weight is an EXACT binary fraction,
    so the SQL literal parses to the identical double on both engines
    (the _DECAY_MICRO convention applied to a whole model)."""
    state = 0x5DEECE66D

    def nxt() -> float:
        nonlocal state
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        return ((state >> 33) % 19 - 9) / 16.0

    w1 = [[nxt() for _ in range(_MLP_IN)] for _ in range(_MLP_HID)]
    b1 = [nxt() for _ in range(_MLP_HID)]
    v = [nxt() for _ in range(_MLP_HID)]
    b2 = nxt()
    return w1, b1, v, b2


_MLP_W1, _MLP_B1, _MLP_V, _MLP_B2 = _mlp_weights()


def _mlp_score_sql(dialect: str) -> str:
    """score = b2 + sum_j v_j * relu(b1_j + sum_i w_ji * e_i), one
    explicit left-associated expression tree — identical shape on
    both engines, so every IEEE operation rounds identically and the
    final micro-snap is belt-and-braces.  Element access is the only
    dialect split (Spark 0-based [], DuckDB 1-based [])."""

    def elem(i: int) -> str:
        if dialect == S:
            return f"CAST(embedding[{i}] AS DOUBLE)"
        return f"CAST(embedding[{i + 1}] AS DOUBLE)"

    hid = []
    for j in range(_MLP_HID):
        dot = " + ".join(
            f"{_MLP_W1[j][i]!r} * {elem(i)}" for i in range(_MLP_IN)
        )
        hid.append(f"greatest(0.0, {_MLP_B1[j]!r} + ({dot}))")
    out = " + ".join(f"{_MLP_V[j]!r} * ({h})" for j, h in enumerate(hid))
    return f"({_MLP_B2!r} + ({out}))"


def _mlp_body_sql(dialect: str) -> str:
    score = _mlp_score_sql(dialect)
    return f"""
    SELECT CAST(vec_id AS BIGINT) AS vec_id,
           CAST(label AS BIGINT) AS label,
           CAST(FLOOR(({score}) * 1000000.0 + 0.5) AS BIGINT) AS score_micro
    FROM embeddings
    ORDER BY score_micro DESC, vec_id
    LIMIT {_MLP_TOP}
    """


@register(
    "mlp_quality_inference",
    oracle=_mlp_body_sql(D),
    doc=f"in-engine neural inference: a {_MLP_IN}x{_MLP_HID}x1 ReLU "
    "MLP quality scorer evaluated as ONE generated columnar "
    "expression per row — the distilled-classifier-over-the-corpus "
    "pattern (FineWeb-Edu / quality-filtering rerankers) run where "
    "the data lives instead of exporting 100 TB to a model server. "
    "Weights are exact binary fractions folded into BOTH dialects as "
    "identical literals; the expression tree is left-associated so "
    "every IEEE double op rounds identically, and the score is "
    "micro-snapped once. Scale: pure map-side expression work inside "
    "whole-stage codegen + one TakeOrdered top-k — zero shuffles "
    "before the k-row reduction; the model rides the query plan, not "
    "a UDF (no Python, no Arrow round-trip).",
)
def mlp_quality_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    emb.createOrReplaceTempView("_r13_embeddings")
    return spark.sql(
        _mlp_body_sql(S).replace("FROM embeddings", "FROM _r13_embeddings")
    )


# ---------------------------------------------------------------------------
# fts_maxscore_pruned_search
# ---------------------------------------------------------------------------

_WAND_TERMS = ("dup", "key", "fast", "line")
_WAND_K = 10

_WAND_ORACLE = f"""
    WITH base AS (
      SELECT doc_id, {PT.tokens('text', D)} AS toks FROM documents
    ),
    docs2 AS (SELECT doc_id, len(toks) AS dl, toks FROM base),
    stats AS (SELECT count(*) AS n_docs, CAST(avg(dl) AS DOUBLE) AS avgdl FROM docs2),
    hits AS (
      SELECT doc_id, dl, term, count(*) AS tf FROM (
        SELECT doc_id, dl, unnest(toks) AS term FROM docs2
      ) WHERE term IN ('dup', 'key', 'fast', 'line')
      GROUP BY doc_id, dl, term
    ),
    dfs AS (SELECT term, count(DISTINCT doc_id) AS df FROM hits GROUP BY term),
    scored AS (
      SELECT h.doc_id,
             CAST(floor(
               ln(1.0 + (CAST(s.n_docs AS DOUBLE) - CAST(d.df AS DOUBLE) + 0.5)
                        / (CAST(d.df AS DOUBLE) + 0.5))
               * CAST(h.tf AS DOUBLE) * 2.2
               / (CAST(h.tf AS DOUBLE)
                  + 1.2 * (0.25 + 0.75 * CAST(h.dl AS DOUBLE) / s.avgdl))
               * 1000000.0 + 0.5) AS BIGINT) AS micro
      FROM hits h JOIN dfs d ON h.term = d.term CROSS JOIN stats s
    )
    SELECT doc_id, count(*) AS n_terms_hit,
           CAST(sum(micro) AS DOUBLE) / 1000000.0 AS score
    FROM scored GROUP BY doc_id
    ORDER BY score DESC, doc_id LIMIT {_WAND_K}
    """


@register(
    "fts_maxscore_pruned_search",
    oracle=_WAND_ORACLE,
    doc="BM25 top-k under MaxScore pruning (fts.maxscore_topk; Turtle "
    "& Flood 1995, batch adaptation): per-term exact max "
    "contributions + a seed pass over the rare high-impact term give "
    "a k-th-score lower bound theta; terms whose ascending cumulative "
    "max-sum stays below theta are NON-ESSENTIAL, and only documents "
    "matching an essential term enter the per-doc aggregation "
    "shuffle. On this corpus the query's three common terms (df ~ "
    "380/500) all fall non-essential behind the rare 'dup' (df 25), "
    "so ~95% of matching documents never shuffle — while the oracle "
    "is the EXHAUSTIVE disjunctive BM25: the hash gate proves the "
    "pruned plan returns bit-identical top-k, the whole point of "
    "safe-up-to-rank pruning. The postings-side win generalizes: at "
    "100 TB the aggregation exchange is the cost, and MaxScore "
    "bounds who may enter it.",
)
def fts_maxscore_pruned_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import fts as fts_mod

    docs = _t(spark, sf_dir, "documents")
    return fts_mod.maxscore_topk(
        docs, "doc_id", "text", list(_WAND_TERMS), k=_WAND_K
    )


# ---------------------------------------------------------------------------
# streaming_misra_gries_hitters
# ---------------------------------------------------------------------------

_SMG_K = 8
_SMG_SINK = "streaming_mg_hitters_sink"


def _smg_oracle(sf_dir: str) -> str:
    """Python-twin oracle: replay each event_type's user stream in
    ascending event_id order through the identical MG automaton and
    emit the final counters as VALUES — the iterative-fixpoint
    convention, here for an ORDER-DEPENDENT automaton whose replay
    order the streaming operator pins explicitly."""
    import collections

    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        "SELECT event_type, event_id, CAST(user_id AS VARCHAR) FROM "
        f"read_parquet('{sf_dir}/events.parquet') ORDER BY event_id"
    ).fetchall()
    con.close()
    streams: dict[str, list[str]] = collections.defaultdict(list)
    for et, _eid, uid in rows:
        streams[et].append(uid)
    out = []
    for et in sorted(streams):
        ctr: dict[str, int] = {}
        for it in streams[et]:
            if it in ctr:
                ctr[it] += 1
            elif len(ctr) < _SMG_K:
                ctr[it] = 1
            else:
                dead = [x for x in ctr if ctr[x] == 1]
                for x in ctr:
                    ctr[x] -= 1
                for x in dead:
                    del ctr[x]
        for it in sorted(ctr):
            out.append((et, it, ctr[it]))
    if not out:
        return (
            "SELECT CAST(NULL AS VARCHAR) AS event_type, "
            "CAST(NULL AS VARCHAR) AS item, "
            "CAST(NULL AS BIGINT) AS counter WHERE FALSE"
        )
    vals = ", ".join(f"('{et}', '{it}', {c})" for et, it, c in out)
    return (
        "SELECT event_type, item, CAST(counter AS BIGINT) AS counter "
        f"FROM (VALUES {vals}) AS t(event_type, item, counter) "
        "ORDER BY event_type, item"
    )


@register(
    "streaming_misra_gries_hitters",
    oracle=_smg_oracle,
    doc="Misra-Gries heavy-hitter counters as a CUSTOM STATEFUL "
    "STREAMING operator (streaming.pipeline.stateful_misra_gries): "
    f"per event_type, GroupState carries <= {_SMG_K} (user, counter) "
    "pairs across micro-batches. MG is ORDER-SENSITIVE — the "
    "decrement automaton depends on arrival order — so the operator "
    "replays each batch in ascending event_id order and the oracle "
    "is a pure-Python twin of the same automaton over the same "
    "global order: the finite-replay equivalence extended from "
    "set-union sketches (KMV/CMS) to an order-dependent state "
    "machine. Final state recovered as the max-seq emit (the "
    "underfull-sketch lesson). O(k) state per key, counters carry "
    "the classic n/(k+1) undercount guarantee.",
)
def streaming_misra_gries_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.pipeline import stateful_misra_gries

    base = sf_dir.rstrip("/")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    schema = spark.read.parquet(f"{base}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(base)
    )
    keyed = stream.select(
        F.col("event_type").alias("key"),
        F.col("event_id").cast("bigint").alias("event_id"),
        F.col("user_id").cast("string").alias("item"),
    )
    out = stateful_misra_gries(keyed, k=_SMG_K)
    q = (
        out.writeStream.format("memory")
        .queryName(_SMG_SINK)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    final = (
        spark.table(_SMG_SINK)
        .groupBy(F.col("key").alias("event_type"))
        .agg(
            F.max_by("items", "seq").alias("items"),
            F.max_by("counts", "seq").alias("counts"),
        )
        .select(
            "event_type",
            F.explode(F.arrays_zip("items", "counts")).alias("z"),
        )
        .select(
            "event_type",
            F.col("z.items").alias("item"),
            F.col("z.counts").cast("bigint").alias("counter"),
        )
    )
    return final.orderBy("event_type", "item")


# ---------------------------------------------------------------------------
# ldp_randomized_response
# ---------------------------------------------------------------------------

#: generalized randomized response with EXACT rational design
#: probabilities: keep the true value w.p. p = 3/4, else report one of
#: the other k-1 values uniformly (q = (1-p)/(k-1) per decoy).  This
#: is eps-LDP with eps = ln(p(k-1)/(1-p)) = ln(12) at k = 5.
_LDP_KEEP_NUM = 3  # p = 3/4 as the exact rational 3/4
_LDP_KEEP_DEN = 4


def _ldp_body_sql(dialect: str) -> str:
    stype = "STRING" if dialect == S else "VARCHAR"
    h = PT.poly_hash(f"CAST(event_id AS {stype})", dialect)
    hdiv = PT.idiv("h", str(_LDP_KEEP_DEN), dialect)
    return f"""
    types AS (
      SELECT event_type AS v,
             CAST(row_number() OVER (ORDER BY event_type) - 1 AS BIGINT) AS idx
      FROM (SELECT DISTINCT event_type FROM events)
    ),
    kk AS (SELECT CAST(count(*) AS BIGINT) AS k FROM types),
    coins AS (
      SELECT t.idx AS true_idx, {h} AS h, k.k
      FROM events e JOIN types t ON t.v = e.event_type CROSS JOIN kk k
    ),
    reported AS (
      -- keep when h mod 4 < 3; else decoy j = (h div 4) mod (k-1),
      -- skipping the true index
      SELECT CASE WHEN h % {_LDP_KEEP_DEN} < {_LDP_KEEP_NUM} THEN true_idx
                  WHEN {hdiv} % (k - 1) < true_idx
                       THEN {hdiv} % (k - 1)
                  ELSE {hdiv} % (k - 1) + 1
             END AS rep_idx
      FROM (SELECT true_idx, CAST(h AS BIGINT) AS h, k,
                   CAST(NULL AS BIGINT) AS _pad FROM coins)
    ),
    rep_counts AS (
      SELECT rep_idx AS idx, CAST(count(*) AS BIGINT) AS c_rep
      FROM reported GROUP BY rep_idx
    ),
    true_counts AS (
      SELECT t.idx, CAST(count(*) AS BIGINT) AS c_true
      FROM events e JOIN types t ON t.v = e.event_type GROUP BY t.idx
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM events)
    SELECT t.v AS event_type, tc.c_true,
           coalesce(rc.c_rep, 0) AS c_reported,
           {{EST}} AS est_count
    FROM types t
    JOIN true_counts tc ON tc.idx = t.idx
    LEFT JOIN rep_counts rc ON rc.idx = t.idx
    CROSS JOIN tot CROSS JOIN kk
    ORDER BY event_type
    """


def _ldp_sql(dialect: str) -> str:
    # unbiased estimator: (c_rep - n*q) / (p - q) with p = 3/4,
    # q = 1/(4(k-1)) -> est = (4(k-1)*c_rep - n) / (3k - 4), all
    # integers until ONE double division, snapped once
    num = f"(CAST({_LDP_KEEP_DEN} AS DOUBLE) * (k - 1) * coalesce(rc.c_rep, 0) - n)"
    den = f"(CAST({_LDP_KEEP_NUM} AS DOUBLE) * k - {_LDP_KEEP_DEN})"
    est = _snap(f"{num} / {den}")
    return "WITH " + _ldp_body_sql(dialect).replace("{EST}", est)


@register(
    "ldp_randomized_response",
    oracle=_ldp_sql(D),
    doc="local differential privacy in-engine: k-ary generalized "
    "randomized response (Warner 1965 / Kairouz et al. 2016) with "
    "EXACT rational design probabilities (p = 3/4 keep, uniform "
    "decoy otherwise -> eps = ln(3(k-1)) LDP) and the matching "
    "unbiased frequency estimator (4(k-1)c_rep - n)/(3k - 4), "
    "snapped once from exact integer counts. The 'randomness' is the "
    "deterministic polynomial event hash, so the mechanism is "
    "replayable and hash-gateable while behaving statistically like "
    "a fair coin; true/reported/estimated counts sit side by side so "
    "the estimator's debiasing is visible in the gated output. "
    "Scale: one map-side coin per event, two count aggregates, a "
    "5-row dimension broadcast — the per-user report never carries "
    "the true value past the mechanism boundary, which is the whole "
    "privacy point at 100 TB.",
)
def ldp_randomized_response(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    ev.createOrReplaceTempView("_r13_events")
    return spark.sql(
        _ldp_sql(S).replace("FROM events", "FROM _r13_events")
    )


# ---------------------------------------------------------------------------
# plsa_topics_em
# ---------------------------------------------------------------------------

_PLSA_K = 3
_PLSA_U = 10**6


def _plsa_body_sql(dialect: str) -> str:
    """Two full pLSA EM iterations (Hofmann 1999) in exact micro-unit
    integer arithmetic.  theta0 is uniform; phi0 breaks topic symmetry
    with a per-(topic, word) polynomial-hash seed normalized per
    topic.  Every responsibility and every re-estimated parameter is
    an integer floor-division of exact integers — no double exists
    anywhere in either engine."""
    toks = PT.tokens("text", dialect)
    ph = PT.poly_hash("w", dialect)
    U = _PLSA_U

    def div(num: str, den: str) -> str:
        return PT.idiv(num, den, dialect)

    theta0 = div(str(U), str(_PLSA_K))
    return f"""
    counts AS (
      SELECT doc_id AS d, w, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT doc_id, {{UNNEST}} AS w FROM documents)
      WHERE w <> '' GROUP BY doc_id, w
    ),
    topics AS ({{TOPICS}}),
    vocab AS (SELECT DISTINCT w FROM counts),
    phi0_raw AS (
      SELECT t.z, v.w,
             1000 + (({ph}) * (t.z + 1)) % 9973 AS raw
      FROM vocab v CROSS JOIN topics t
    ),
    phi0 AS (
      SELECT z, w, CAST({div(f'raw * {U}', 'sum(raw) OVER (PARTITION BY z)')}
             AS BIGINT) AS phi_u
      FROM phi0_raw
    ),
    e1 AS (
      SELECT c.d, c.w, p.z, c.c,
             CAST({theta0} AS BIGINT) * p.phi_u AS num
      FROM counts c JOIN phi0 p ON p.w = c.w
    ),
    r1 AS (
      SELECT d, w, z, c,
             CAST({div(f'num * {U}', 'sum(num) OVER (PARTITION BY d, w)')}
             AS BIGINT) AS r_u
      FROM e1
    ),
    n1 AS (SELECT d, w, z, c * r_u AS n FROM r1),
    phi1 AS (
      SELECT z, w,
             CAST({div(f'sum(n) * {U}', 'sum(sum(n)) OVER (PARTITION BY z)')}
             AS BIGINT) AS phi_u
      FROM n1 GROUP BY z, w
    ),
    theta1 AS (
      SELECT d, z,
             CAST({div(f'sum(n) * {U}', 'sum(sum(n)) OVER (PARTITION BY d)')}
             AS BIGINT) AS theta_u
      FROM n1 GROUP BY d, z
    ),
    e2 AS (
      SELECT c.d, c.w, p.z, c.c, t.theta_u * p.phi_u AS num
      FROM counts c
      JOIN phi1 p ON p.w = c.w
      JOIN theta1 t ON t.d = c.d AND t.z = p.z
    ),
    r2 AS (
      SELECT d, w, z, c,
             CAST({div(f'num * {U}', 'sum(num) OVER (PARTITION BY d, w)')}
             AS BIGINT) AS r_u
      FROM e2
    ),
    n2 AS (SELECT d, w, z, c * r_u AS n FROM r2),
    phi2 AS (
      SELECT z, w,
             CAST({div(f'sum(n) * {U}', 'sum(sum(n)) OVER (PARTITION BY z)')}
             AS BIGINT) AS phi_u
      FROM n2 GROUP BY z, w
    )
    SELECT CAST(z AS BIGINT) AS topic, w AS word, phi_u AS phi_micro
    FROM phi2 ORDER BY topic, word
    """


def _plsa_sql(dialect: str) -> str:
    if dialect == D:
        topics = (
            f"SELECT CAST(g.i AS BIGINT) AS z "
            f"FROM unnest(range({_PLSA_K})) AS g(i)"
        )
        unnest = f"unnest({PT.tokens('text', D)})"
    else:
        topics = (
            f"SELECT CAST(z AS BIGINT) AS z "
            f"FROM (SELECT explode(sequence(0, {_PLSA_K - 1})) AS z)"
        )
        unnest = f"explode({PT.tokens('text', S)})"
    return "WITH " + _plsa_body_sql(dialect).replace(
        "{TOPICS}", topics
    ).replace("{UNNEST}", unnest)


@register(
    "plsa_topics_em",
    oracle=_plsa_sql(D),
    doc=f"probabilistic latent semantic analysis (Hofmann 1999): two "
    f"full EM iterations of a {_PLSA_K}-topic model over the "
    "document-term counts, ENTIRELY in exact micro-unit integer "
    "arithmetic — uniform theta0, hash-seeded symmetry-broken phi0, "
    "responsibilities and re-estimates all integer floor-divisions "
    "(window-normalized), so the gate pins every parameter to the "
    "last bit with zero libm. The topic-modeling primitive the "
    "corpus-curation suite lacked (ctfidf/textrank/tfidf are term "
    "scorers, not latent factorizations). Scale: EM on the (d, w, c) "
    "sufficient-statistic table — E-steps are joins keyed by w and "
    "(d, z), M-steps window sums over z / d partitions; the corpus "
    "itself is touched once to build counts, exactly how EM "
    "factorizations scale to 100 TB.",
)
def plsa_topics_em(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("_r13_documents")
    return spark.sql(
        _plsa_sql(S).replace("FROM documents", "FROM _r13_documents")
    )


# ---------------------------------------------------------------------------
# hyperanf_neighborhood
# ---------------------------------------------------------------------------

_ANF_B = 6  # m = 64 registers per vertex
_ANF_HOPS = 3


def _anf_oracle(sf_dir: str) -> str:
    """Python-twin oracle: replay the SAME register algorithm (poly
    hash + mid-square finalizer, bucket/rank split, per-hop
    register-wise max over neighbors) with dict arithmetic and emit
    VALUES — the iterative-fixpoint convention.  The twin replays the
    SKETCH, not exact ball sizes: determinism is the contract, the
    ANF accuracy guarantee is the algorithm's published property."""
    import collections

    import duckdb

    from ..functions import portable as PTmod
    from ..operators.sketches import HLL_HASH_BITS, hll_coefficient

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{sf_dir}/lineitem.parquet')"
    )
    edges = con.execute(_MST_SUPPORT2_SQL).fetchall()
    con.close()
    adj = collections.defaultdict(set)
    for lo, hi, _c in edges:
        adj[int(lo)].add(int(hi))
        adj[int(hi)].add(int(lo))
    m = 1 << _ANF_B
    shift = (HLL_HASH_BITS - _ANF_B) + 1
    aa, cc = PTmod._perm_constants(1)[0]
    P = PTmod.P

    def reg(v: int) -> tuple[int, int]:
        h0 = 7
        for ch in str(v):
            h0 = (h0 * 31 + ord(ch)) % P
        h = ((h0 * h0 % P) * aa + cc) % P
        w = h // m
        rank = shift if w == 0 else shift - w.bit_length()
        return h % m, rank

    state = {v: {reg(v)[0]: reg(v)[1]} for v in adj}
    coeff = hll_coefficient(_ANF_B)
    rows = []

    def record(hop: int) -> None:
        for v in sorted(state):
            s = sum(1 << (shift - mr) for mr in state[v].values())
            s += (m - len(state[v])) * (1 << shift)
            est = coeff / float(s)
            est = (
                __import__("math").floor(est * 1000000.0 + 0.5) / 1000000.0
            )
            rows.append((hop, v, s, est))

    record(0)
    for hop in range(1, _ANF_HOPS + 1):
        nxt = {}
        for v in adj:
            merged = dict(state[v])
            for u in adj[v]:
                for bkt, mr in state[u].items():
                    if merged.get(bkt, -1) < mr:
                        merged[bkt] = mr
            nxt[v] = merged
        state = nxt
        record(hop)
    vals = ", ".join(f"({h}, {v}, {s}, {e!r})" for h, v, s, e in rows)
    return (
        "SELECT CAST(hop AS BIGINT) AS hop, CAST(part AS BIGINT) AS part, "
        "CAST(s_scaled AS BIGINT) AS s_scaled, CAST(est AS DOUBLE) AS est "
        f"FROM (VALUES {vals}) AS t(hop, part, s_scaled, est) "
        "ORDER BY hop, part"
    )


@register(
    "hyperanf_neighborhood",
    oracle=_anf_oracle,
    doc="HyperANF (Boldi, Rosa & Vigna 2011) over the support-2 "
    "co-purchase graph (graph.hyperanf): every vertex carries a "
    f"64-register HLL of its h-hop ball, each BSP round is ONE "
    "register-wise max-merge over the adjacency (HLL union == ball "
    "union), 3 hops, localCheckpoint per round. THE way distance "
    "distributions / effective diameter are computed when per-vertex "
    "BFS (O(V*E)) is unthinkable: O(E*m) per hop, every shuffle "
    "keyed by vertex. The operator emits the EXACT BIGINT estimator "
    "denominator per (hop, vertex) — the float estimate is one "
    "shared-literal division snapped once (sketches.hll_coefficient, "
    "the scalar-HLL machinery reused verbatim), so the whole sweep "
    "hash-gates against a dict-arithmetic Python twin of the same "
    "register algebra.",
)
def hyperanf_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import portable as PTmod
    from ..operators import graph
    from ..operators.sketches import hll_coefficient

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # r14: same support-2 weighted edges as the oracle's
    # _MST_SUPPORT2_SQL, built via per-order pair expansion
    # (graph.copurchase_pairs) instead of the SQL lineitem self-join —
    # the identical (lo, hi, c>=2) rows the mst rewrite hash-proved;
    # one hash-agg exchange replaces exchange + two sorts + merge join
    # (guide §2.4/§3.1, r13 change 10 applied to the last Spark-side
    # SQL edge site)
    edges = (
        graph.copurchase_pairs(li)
        .groupBy("lo", "hi")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= 2)
        .select("lo", "hi")
    )
    sweep = graph.hyperanf(edges, a="lo", b="hi", hops=_ANF_HOPS, hll_b=_ANF_B)
    est = PTmod.round6(
        f"{hll_coefficient(_ANF_B)!r} / CAST(s_scaled AS DOUBLE)", S
    )
    return (
        sweep.select(
            "hop",
            F.col("v").cast("bigint").alias("part"),
            "s_scaled",
            F.expr(est).alias("est"),
        )
        .orderBy("hop", "part")
    )


# ---------------------------------------------------------------------------
# scc_subsequent_parts
# ---------------------------------------------------------------------------

#: directed "bought next" part graph: an edge u -> v when some
#: customer's order containing u is IMMEDIATELY followed (orderdate,
#: orderkey tiebreak) by an order containing v; support >= 2 distinct
#: consecutive-order pairs.  Identical SQL runs on both engines.
#: DELIBERATELY keeps self-loop rows (u = v): a `u <> v` predicate —
#: even written post-join — is pushed down into the items-items join
#: edge, where DuckDB's cardinality estimator prices the resulting
#: 600k x 600k nested-loop join as cheap and picks it (measured:
#: >20 min vs 0.4 s at sf0.1).  Both consumers drop self-loops
#: themselves (scc_coloring filters u != v; the Kosaraju twin skips
#: them), so no predicate ever connects the two items scans.
_SCC_EDGES_SQL = """
  WITH co AS (
    SELECT o_custkey AS c, o_orderkey AS k,
           ROW_NUMBER() OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS rn
    FROM orders
  ), pairs AS (
    SELECT a.k AS k1, b.k AS k2
    FROM co a JOIN co b ON a.c = b.c AND b.rn = a.rn + 1
  ), items AS (
    SELECT DISTINCT l_orderkey AS k, l_partkey AS p FROM lineitem
  ), e AS (
    SELECT i1.p AS u, i2.p AS v
    FROM pairs q
    JOIN items i1 ON i1.k = q.k1
    JOIN items i2 ON i2.k = q.k2
  )
  SELECT u, v FROM e GROUP BY u, v HAVING count(*) >= 2
"""


def _scc_oracle(sf_dir: str) -> str:
    """Python-twin oracle: iterative KOSARAJU (two DFS passes over
    the reversed postorder) over the same directed edge set, each
    component mapped to its max member id — a genuinely different
    algorithm arriving at the same unique labeling, which is exactly
    what the hash gate proves (the mst Kruskal-vs-Boruvka
    convention)."""
    import collections

    import duckdb

    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    edges = con.execute(_SCC_EDGES_SQL).fetchall()
    con.close()
    adj: dict[int, set] = collections.defaultdict(set)
    radj: dict[int, set] = collections.defaultdict(set)
    verts: set = set()
    for u, v in edges:
        u, v = int(u), int(v)
        if u == v:  # self-loops stay in the SQL; see _SCC_EDGES_SQL
            continue
        adj[u].add(v)
        radj[v].add(u)
        verts.update((u, v))
    order: list[int] = []
    seen: set = set()
    for s in sorted(verts):
        if s in seen:
            continue
        stack = [(s, iter(sorted(adj[s])))]
        seen.add(s)
        while stack:
            node, it = stack[-1]
            advanced = False
            for nxt in it:
                if nxt not in seen:
                    seen.add(nxt)
                    stack.append((nxt, iter(sorted(adj[nxt]))))
                    advanced = True
                    break
            if not advanced:
                order.append(node)
                stack.pop()
    comp: dict[int, int] = {}
    for s in reversed(order):
        if s in comp:
            continue
        comp[s] = s
        stack2 = [s]
        while stack2:
            x = stack2.pop()
            for y in radj[x]:
                if y not in comp:
                    comp[y] = s
                    stack2.append(y)
    members: dict[int, list] = collections.defaultdict(list)
    for v, root in comp.items():
        members[root].append(v)
    rows = []
    for vs in members.values():
        sid = max(vs)
        for v in vs:
            rows.append((v, sid, len(vs)))
    rows.sort()
    vals = ", ".join(f"({v}, {s}, {n})" for v, s, n in rows)
    return (
        "SELECT CAST(part AS BIGINT) AS part, "
        "CAST(scc_id AS BIGINT) AS scc_id, "
        "CAST(scc_size AS BIGINT) AS scc_size "
        f"FROM (VALUES {vals}) AS t(part, scc_id, scc_size) "
        "ORDER BY part"
    )


@register(
    "scc_subsequent_parts",
    oracle=_scc_oracle,
    doc="Strongly connected components of the DIRECTED "
    "subsequent-purchase part graph (an edge u -> v when a "
    "customer's order containing u is immediately followed by one "
    "containing v, support >= 2) via the NEW graph.scc_coloring "
    "operator: trim (peel in/out-degree-0 singletons — dissolves the "
    "DAG periphery), forward max-id coloring to a measured fixpoint, "
    "then ONE multi-root backward BFS restricted to each root's "
    "color class carves exactly the roots' SCCs (Orzan 2004 / Slota "
    "et al. 2014 — the shared-nothing SCC recipe; Tarjan's stack is "
    "inherently sequential). scc_id = max member id, the coloring's "
    "natural representative. Every join keys on vertex ids, every "
    "level localCheckpoints with early exit. Oracle: iterative "
    "Kosaraju — a different algorithm arriving at the same unique "
    "labeling. The mutually-reinforcing-demand clusters query: at "
    "100 TB the web/citation/transaction graphs this targets are "
    "exactly giant-SCC + DAG-periphery shaped, which is what "
    "trim + coloring exploits.",
)
def scc_subsequent_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import graph

    # r14: the Spark side builds the SAME edge rows as _SCC_EDGES_SQL
    # (the oracle keeps the SQL twin) without the orders self-join:
    # "b.rn = a.rn + 1 over (PARTITION BY custkey ORDER BY orderdate,
    # orderkey)" is by definition lead(orderkey) over that window —
    # orderkey is unique so the order is total and the pair multiset
    # is identical.  One window pass replaces exchange + two sorts +
    # merge join (guide §2.4: two operations keyed the same way share
    # one exchange — here the rn window and the consecutive-pair join
    # collapse into one window).
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    pairs = (
        o.select(
            F.col("o_orderkey").alias("k1"),
            F.lead("o_orderkey").over(w).alias("k2"),
        )
        .filter(F.col("k2").isNotNull())
    )
    # items feeds two concurrent join legs of the same first job —
    # eager per the r13 multi-leg rule
    items = (
        _t(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("p"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # self-loop rows (u = v) deliberately KEPT, exactly like the SQL
    # (see _SCC_EDGES_SQL's comment); scc_coloring drops them itself
    edges = (
        pairs.join(
            items.select(F.col("k").alias("k1"), F.col("p").alias("u")), "k1"
        )
        .join(
            items.select(F.col("k").alias("k2"), F.col("p").alias("v")), "k2"
        )
        .groupBy("u", "v")
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") >= 2)
        .select("u", "v")
    )
    labeled = graph.scc_coloring(edges, src="u", dst="v")
    sizes = labeled.groupBy("scc_id").agg(
        F.count("*").cast("bigint").alias("scc_size")
    )
    return (
        labeled.join(sizes, "scc_id")
        .select(
            F.col("v").cast("bigint").alias("part"),
            F.col("scc_id").cast("bigint").alias("scc_id"),
            "scc_size",
        )
        .orderBy("part")
    )
