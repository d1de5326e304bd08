"""Driver queries: model-evaluation, rolling-model,
distribution-distance, attribution, and retrieval-evaluation
operators (round 8) — exactly six families, each implemented and
registered in this module:

- clustering_nmi_purity — external clustering evaluation: normalized
  mutual information and purity of the deterministic k-means
  assignment (the kmeans_two_iterations init + one broadcast-argmax
  assignment pass, operators/ann.ivf_assign) against the embeddings
  table's ground-truth labels.  Every MI/entropy piece is
  micro-snapped from exact integer contingency counts (the
  information_gain_ranking convention); NMI's final normalization
  divides once on exact BIGINT sums.
- rolling_regression_28d — a rolling model per key: the exact OLS
  slope of daily revenue over each trailing 28-day window, per
  segment, from BIGINT moment sums maintained by a bounded window
  frame (ROWS 27 PRECEDING) over the dense calendar grid.  The
  many-small-models pattern: thousands of regressions from one
  window pass, no per-model scan.
- wasserstein_price_distance — EXACT 1-D earth-mover distance
  between the R-flag and N-flag price distributions on $100 bins:
  W1 * nA * nB = sum over bins of |cumA*nB - cumB*nA| is pure
  BIGINT arithmetic (ECDF prefix sums over the value-domain-bounded
  bin table), one final division — the distribution-shift metric
  that, unlike KS, weighs WHERE the mass moved.
- position_based_attribution — the U-shaped (40/20/40) credit rule
  completing the attribution ladder beside last-touch, Shapley and
  Markov removal: exact micro-integer credits per pre-conversion
  touch position (documented floor-remainder convention), one
  window pass per user.
- retrieval_ndcg_eval — ranked-retrieval evaluation of the exact
  cosine top-10 against the embeddings table's ground-truth labels:
  per query NDCG@10, reciprocal rank, and precision@10, with every
  log2 discount weight and 1/rank value folded in Python as a
  literal micro-integer table (the decayed_user_value convention),
  so DCG/IDCG/MRR are pure BIGINT sums with exactly one snapped
  division (the NDCG normalization) per output row.
- knn_loo_confusion — leave-one-out k-NN classifier evaluation over
  the embeddings table: each query vector's label predicted by the
  majority vote of its 5 nearest non-self neighbors (exact cosine,
  ties to the smaller label), reported as the true-vs-predicted
  confusion matrix.  Pure counting after the top-k — no floats
  beyond the deterministic dot ordering.

Cross-engine exactness follows the repo conventions (exact BIGINT
counts/cents/moments; one transcendental or division per output
cell, snapped to micro-units; total-order tie-breaks).

No reference-file citation applies: /root/reference stops at
retrieval; these audit the models the ml/ml2 families train.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions import portable as PT
from ..operators import ranks
from ..session import load_table
from .registry import register

D = PT.DUCKDB
S = PT.SPARK


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# clustering_nmi_purity
# --------------------------------------------------------------------------

def _nmi_oracle() -> str:
    from .driver_queries_scale import _assign_sql

    ent_piece = (
        "CASE WHEN {c} > 0 THEN CAST(floor((CAST({c} AS DOUBLE) / n)"
        " * (-ln(CAST({c} AS DOUBLE) / n)) * 1000000.0 + 0.5) AS BIGINT)"
        " ELSE 0 END"
    )
    return f"""
    WITH c0 AS (
      SELECT vec_id AS centroid_id, embedding AS c_vec
      FROM embeddings WHERE vec_id < 8
    ),
    a1 AS ({_assign_sql('embeddings', 'c0')}),
    cells AS (
      SELECT a1.centroid_id AS cl, e.label AS lb,
             CAST(count(*) AS BIGINT) AS n_cl
      FROM a1 JOIN embeddings e USING (vec_id) GROUP BY 1, 2
    ),
    mc AS (SELECT cl, CAST(sum(n_cl) AS BIGINT) AS n_c FROM cells GROUP BY cl),
    ml AS (SELECT lb, CAST(sum(n_cl) AS BIGINT) AS n_l FROM cells GROUP BY lb),
    tot AS (SELECT CAST(sum(n_cl) AS BIGINT) AS n FROM cells),
    mi AS (
      SELECT CAST(sum(CAST(floor(
               (CAST(cells.n_cl AS DOUBLE) / tot.n)
               * ln(CAST(cells.n_cl AS DOUBLE) * tot.n
                    / (CAST(mc.n_c AS DOUBLE) * ml.n_l))
               * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS mi_micro
      FROM cells JOIN mc ON mc.cl = cells.cl
      JOIN ml ON ml.lb = cells.lb CROSS JOIN tot
    ),
    hc AS (SELECT CAST(sum({ent_piece.format(c="n_c")}) AS BIGINT)
             AS hc_micro FROM mc, tot),
    hl AS (SELECT CAST(sum({ent_piece.format(c="n_l")}) AS BIGINT)
             AS hl_micro FROM ml, tot),
    per_cl AS (
      SELECT cl AS cluster_id, n_cl, lb,
             row_number() OVER (PARTITION BY cl
                                ORDER BY n_cl DESC, lb) AS rn
      FROM cells
    )
    SELECT p.cluster_id, mc.n_c AS n_members, p.lb AS top_label,
           p.n_cl AS top_label_n,
           mi.mi_micro, hc.hc_micro, hl.hl_micro,
           CAST(floor(mi.mi_micro * 1000000.0
                      / sqrt(CAST(hc.hc_micro AS DOUBLE) * hl.hl_micro)
                      + 0.5) AS BIGINT) AS nmi_micro
    FROM per_cl p JOIN mc ON mc.cl = p.cluster_id
    CROSS JOIN mi CROSS JOIN hc CROSS JOIN hl
    WHERE p.rn = 1
    ORDER BY p.cluster_id
    """


@register(
    "clustering_nmi_purity",
    bench=True,
    oracle=_nmi_oracle(),
    doc="external clustering evaluation: the deterministic k-means "
    "assignment (first-8-vector init, one broadcast-argmax pass — "
    "the kmeans_two_iterations machinery) scored against the "
    "embeddings table's ground-truth labels. Per cluster: size, "
    "majority label and its count (summing top_label_n over "
    "clusters gives purity*N exactly); constant columns carry the "
    "corpus-level MI, marginal entropies, and NMI = "
    "MI/sqrt(H_C*H_L), every piece micro-snapped from exact "
    "contingency counts BEFORE summation and the final "
    "normalization divided once on exact BIGINT sums. Scale: the "
    "contingency table is (k x labels)-bounded; only the "
    "assignment pass is corpus-scale.",
)
def clustering_nmi_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .driver_queries_scale import _assign_spark

    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", "label"
    )
    c0 = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("c_vec"),
    )
    a1 = _assign_spark(e.select("vec_id", "embedding"), c0)
    cells = (
        a1.join(e.select("vec_id", "label"), "vec_id")
        .groupBy(F.col("centroid_id").alias("cl"), F.col("label").alias("lb"))
        .agg(F.count("*").cast("bigint").alias("n_cl"))
    )
    mc = cells.groupBy("cl").agg(F.sum("n_cl").cast("bigint").alias("n_c"))
    ml = cells.groupBy("lb").agg(F.sum("n_cl").cast("bigint").alias("n_l"))
    tot = cells.agg(F.sum("n_cl").cast("bigint").alias("n"))
    mi = (
        cells.join(F.broadcast(mc), "cl")
        .join(F.broadcast(ml), "lb")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                F.expr(
                    "CAST(floor((CAST(n_cl AS DOUBLE) / n)"
                    " * ln(CAST(n_cl AS DOUBLE) * n"
                    " / (CAST(n_c AS DOUBLE) * n_l))"
                    " * 1000000.0 + 0.5) AS BIGINT)"
                )
            )
            .cast("bigint")
            .alias("mi_micro")
        )
    )
    ent_piece = (
        "CASE WHEN {c} > 0 THEN CAST(floor((CAST({c} AS DOUBLE) / n)"
        " * (-ln(CAST({c} AS DOUBLE) / n)) * 1000000.0 + 0.5) AS BIGINT)"
        " ELSE 0 END"
    )
    hc = mc.crossJoin(F.broadcast(tot)).agg(
        F.sum(F.expr(ent_piece.format(c="n_c"))).cast("bigint").alias("hc_micro")
    )
    hl = ml.crossJoin(F.broadcast(tot)).agg(
        F.sum(F.expr(ent_piece.format(c="n_l"))).cast("bigint").alias("hl_micro")
    )
    w = Window.partitionBy("cl").orderBy(F.col("n_cl").desc(), F.col("lb"))
    top = (
        cells.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("cl").alias("cluster_id"),
            F.col("lb").alias("top_label"),
            F.col("n_cl").alias("top_label_n"),
        )
    )
    return (
        top.join(
            F.broadcast(mc.select(F.col("cl").alias("cluster_id"),
                                  F.col("n_c").alias("n_members"))),
            "cluster_id",
        )
        .crossJoin(F.broadcast(mi))
        .crossJoin(F.broadcast(hc))
        .crossJoin(F.broadcast(hl))
        .select(
            "cluster_id",
            "n_members",
            "top_label",
            "top_label_n",
            "mi_micro",
            "hc_micro",
            "hl_micro",
            F.expr(
                "CAST(floor(mi_micro * 1000000.0"
                " / sqrt(CAST(hc_micro AS DOUBLE) * hl_micro)"
                " + 0.5) AS BIGINT)"
            ).alias("nmi_micro"),
        )
        .orderBy("cluster_id")
    )


# --------------------------------------------------------------------------
# rolling_regression_28d
# --------------------------------------------------------------------------

@register(
    "rolling_regression_28d",
    oracle="""
    WITH j AS (
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
    daily AS (SELECT segment, d, CAST(sum(cents) AS BIGINT) AS y
              FROM j GROUP BY segment, d),
    grid AS (
      SELECT s.segment, dy.d, CAST(coalesce(daily.y, 0) AS BIGINT) AS y
      FROM segs s CROSS JOIN days dy
      LEFT JOIN daily ON daily.segment = s.segment AND daily.d = dy.d
    ),
    roll AS (
      SELECT segment, d, y,
        CAST(count(*) OVER w AS BIGINT) AS n,
        CAST(sum(d) OVER w AS BIGINT) AS sx,
        CAST(sum(y) OVER w AS BIGINT) AS sy,
        CAST(sum(d * y) OVER w AS BIGINT) AS sxy,
        CAST(sum(d * d) OVER w AS BIGINT) AS sxx,
        row_number() OVER (PARTITION BY segment ORDER BY d) AS rn
      FROM grid
      WINDOW w AS (PARTITION BY segment ORDER BY d
                   ROWS BETWEEN 27 PRECEDING AND CURRENT ROW)
    )
    SELECT segment, d, y, n, sx, sy, sxy, sxx,
           CAST(floor(
             CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx)
             * 1000000.0 + 0.5) AS BIGINT) AS slope_micro
    FROM roll WHERE rn >= 28
    ORDER BY segment, d
    """,
    doc="a rolling model per key: the exact OLS slope of daily "
    "revenue cents against the day index over every trailing "
    "28-day window, per segment, from one dense calendar grid and "
    "ONE bounded window pass (ROWS 27 PRECEDING maintains the five "
    "moment sums as exact BIGINTs; only the final slope divides, "
    "once, micro-snapped — the regression_price_vs_quantity "
    "convention applied to ~12k models at once). The denominator "
    "n*Sxx - Sx^2 is a positive constant of the dense 28-day "
    "design. Scale: windows partition by key and the frame is "
    "constant-width, so state is O(1) per row; a single global "
    "series would route through the operators/ranks.py band layer "
    "instead.",
)
def rolling_regression_28d(spark: SparkSession, sf_dir: str) -> DataFrame:
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
        F.sum("cents").cast("bigint").alias("y")
    )
    grid = (
        segs.crossJoin(days)
        .join(daily, ["segment", "d"], "left")
        .select(
            "segment",
            F.col("d").cast("bigint").alias("d"),
            F.coalesce(F.col("y"), F.lit(0)).cast("bigint").alias("y"),
        )
    )
    w = (
        Window.partitionBy("segment")
        .orderBy("d")
        .rowsBetween(-27, Window.currentRow)
    )
    w_rn = Window.partitionBy("segment").orderBy("d")
    roll = grid.select(
        "segment",
        "d",
        "y",
        F.count("*").over(w).cast("bigint").alias("n"),
        F.sum("d").over(w).cast("bigint").alias("sx"),
        F.sum("y").over(w).cast("bigint").alias("sy"),
        F.sum(F.col("d") * F.col("y")).over(w).cast("bigint").alias("sxy"),
        F.sum(F.col("d") * F.col("d")).over(w).cast("bigint").alias("sxx"),
        F.row_number().over(w_rn).alias("rn"),
    )
    return (
        roll.filter(F.col("rn") >= 28)
        .select(
            "segment",
            "d",
            "y",
            "n",
            "sx",
            "sy",
            "sxy",
            "sxx",
            F.expr(
                "CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)"
                " / (n * sxx - sx * sx) * 1000000.0 + 0.5) AS BIGINT)"
            ).alias("slope_micro"),
        )
        .orderBy("segment", "d")
    )


# --------------------------------------------------------------------------
# wasserstein_price_distance
# --------------------------------------------------------------------------

@register(
    "wasserstein_price_distance",
    oracle="""
    WITH src AS (
      SELECT l_returnflag AS flag,
             CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) // 10000
               AS bin
      FROM lineitem WHERE l_returnflag IN ('R', 'N')
    ),
    bounds AS (SELECT min(bin) AS mn, max(bin) AS mx FROM src),
    spine AS (SELECT CAST(g.x AS BIGINT) AS bin
              FROM bounds, unnest(range(mn, mx + 1)) AS g(x)),
    counts AS (
      SELECT bin,
             CAST(count(*) FILTER (WHERE flag = 'R') AS BIGINT) AS cnt_r,
             CAST(count(*) FILTER (WHERE flag = 'N') AS BIGINT) AS cnt_n
      FROM src GROUP BY bin
    ),
    dense AS (
      SELECT s.bin, coalesce(c.cnt_r, 0) AS cnt_r,
             coalesce(c.cnt_n, 0) AS cnt_n
      FROM spine s LEFT JOIN counts c ON c.bin = s.bin
    ),
    tot AS (SELECT CAST(sum(cnt_r) AS BIGINT) AS n_r,
                   CAST(sum(cnt_n) AS BIGINT) AS n_n FROM dense),
    cum AS (
      SELECT bin, cnt_r, cnt_n,
             CAST(sum(cnt_r) OVER (ORDER BY bin) AS BIGINT) AS cum_r,
             CAST(sum(cnt_n) OVER (ORDER BY bin) AS BIGINT) AS cum_n
      FROM dense
    ),
    contrib AS (
      SELECT cum.*, abs(cum.cum_r * tot.n_n - cum.cum_n * tot.n_r)
               AS contrib
      FROM cum, tot
    ),
    w1 AS (SELECT CAST(sum(contrib) AS BIGINT) AS w1_num FROM contrib)
    SELECT c.bin, c.cnt_r, c.cnt_n, c.cum_r, c.cum_n, c.contrib,
           w1.w1_num,
           CAST(floor(CAST(w1.w1_num AS DOUBLE)
                / (CAST(tot.n_r AS DOUBLE) * tot.n_n)
                * 1000.0 + 0.5) AS BIGINT) AS w1_milli_bins
    FROM contrib c CROSS JOIN w1 CROSS JOIN tot
    ORDER BY c.contrib DESC, c.bin
    LIMIT 10
    """,
    doc="EXACT 1-D Wasserstein (earth-mover) distance between the "
    "R-flag and N-flag extended-price distributions on $100 bins: "
    "W1 * nR * nN = sum over the dense bin spine of "
    "|cumR*nN - cumN*nR| is pure BIGINT arithmetic — the ECDF "
    "prefix sums run over a VALUE-DOMAIN-BOUNDED table (<= ~5000 "
    "bins regardless of corpus size, the ranks.py band argument), "
    "and only the final normalization divides, once, in double "
    "(snapped to milli-bin units). Unlike the KS statistic (max "
    "ECDF gap) this integrates WHERE the mass moved — the metric "
    "behind distribution-shift alerts and embedding-drift audits. "
    "Output: the 10 largest-contribution bins with the global "
    "distance as constant columns. One fact-scale binning groupBy; "
    "everything after is bin-bounded.",
)
def wasserstein_price_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.expr(
            "CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) DIV 10000"
        ).alias("bin"),
    ).filter(F.col("flag").isin("R", "N"))
    bounds = li.agg(F.min("bin").alias("mn"), F.max("bin").alias("mx"))
    spine = bounds.select(F.explode(F.expr("sequence(mn, mx)")).alias("bin"))
    counts = li.groupBy("bin").agg(
        F.count(F.when(F.col("flag") == "R", 1)).cast("bigint").alias("cnt_r"),
        F.count(F.when(F.col("flag") == "N", 1)).cast("bigint").alias("cnt_n"),
    )
    dense = spine.join(counts, "bin", "left").select(
        "bin",
        F.coalesce(F.col("cnt_r"), F.lit(0)).cast("bigint").alias("cnt_r"),
        F.coalesce(F.col("cnt_n"), F.lit(0)).cast("bigint").alias("cnt_n"),
    )
    tot = dense.agg(
        F.sum("cnt_r").cast("bigint").alias("n_r"),
        F.sum("cnt_n").cast("bigint").alias("n_n"),
    )
    cum = ranks.two_phase_prefix_sum(
        dense.withColumn("band", F.expr("bin DIV 100")),
        order_cols=["bin"],
        band_col="band",
        sum_cols=["cnt_r", "cnt_n"],
        suffix="_cum",
    ).select(
        "bin",
        "cnt_r",
        "cnt_n",
        F.col("cnt_r_cum").alias("cum_r"),
        F.col("cnt_n_cum").alias("cum_n"),
    )
    contrib = cum.crossJoin(F.broadcast(tot)).select(
        "bin",
        "cnt_r",
        "cnt_n",
        "cum_r",
        "cum_n",
        F.abs(
            F.col("cum_r") * F.col("n_n") - F.col("cum_n") * F.col("n_r")
        ).alias("contrib"),
        "n_r",
        "n_n",
    )
    w1 = contrib.agg(F.sum("contrib").cast("bigint").alias("w1_num"))
    return (
        contrib.crossJoin(F.broadcast(w1))
        .select(
            "bin",
            "cnt_r",
            "cnt_n",
            "cum_r",
            "cum_n",
            "contrib",
            "w1_num",
            F.expr(
                "CAST(floor(CAST(w1_num AS DOUBLE)"
                " / (CAST(n_r AS DOUBLE) * n_n) * 1000.0 + 0.5) AS BIGINT)"
            ).alias("w1_milli_bins"),
        )
        .orderBy(F.col("contrib").desc(), "bin")
        .limit(10)
    )


# --------------------------------------------------------------------------
# position_based_attribution
# --------------------------------------------------------------------------

@register(
    "position_based_attribution",
    oracle="""
    WITH conv AS (
      SELECT user_id, min(ts) AS conv_ts
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    touches AS (
      SELECT e.user_id, e.event_type AS channel,
             row_number() OVER (PARTITION BY e.user_id
                                ORDER BY e.ts, e.event_id) AS rn,
             count(*) OVER (PARTITION BY e.user_id) AS k
      FROM events e JOIN conv ON conv.user_id = e.user_id
      WHERE e.ts < conv.conv_ts AND e.event_type <> 'purchase'
    ),
    credited AS (
      SELECT channel, user_id,
             CASE WHEN k = 1 THEN 1000000
                  WHEN k = 2 THEN 500000
                  WHEN rn = 1 OR rn = k THEN 400000
                  ELSE 200000 // (k - 2)
             END AS credit_micro
      FROM touches
    )
    SELECT channel,
           CAST(sum(credit_micro) AS BIGINT) AS credit_micro_total,
           CAST(count(*) AS BIGINT) AS n_touches,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM credited
    GROUP BY channel
    ORDER BY credit_micro_total DESC, channel
    """,
    doc="position-based (U-shaped, 40/20/40) attribution of first "
    "purchases, completing the ladder beside last_touch_attribution, "
    "shapley_channel_attribution and markov_removal_attribution: "
    "first and last pre-conversion touches take 400000 micro-credits "
    "each, the middle 200000 splits by exact integer division "
    "across the k-2 interior touches (the floor remainder is "
    "documented leak, deterministic in both engines; k=1 takes all, "
    "k=2 splits 50/50). One shuffle keys each converter's touch "
    "stream; the per-user frame is a total order on (ts, event_id).",
)
def position_based_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("conv_ts"))
    )
    touches = (
        ev.join(conv, "user_id")
        .filter(
            (F.col("ts") < F.col("conv_ts"))
            & (F.col("event_type") != "purchase")
        )
        .select("user_id", F.col("event_type").alias("channel"), "ts",
                "event_id")
    )
    w_rn = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_k = Window.partitionBy("user_id")
    credited = touches.select(
        "channel",
        "user_id",
        F.row_number().over(w_rn).alias("rn"),
        F.count("*").over(w_k).alias("k"),
    ).select(
        "channel",
        "user_id",
        F.expr(
            "CASE WHEN k = 1 THEN 1000000"
            " WHEN k = 2 THEN 500000"
            " WHEN rn = 1 OR rn = k THEN 400000"
            " ELSE 200000 DIV (k - 2) END"
        ).alias("credit_micro"),
    )
    return (
        credited.groupBy("channel")
        .agg(
            F.sum("credit_micro").cast("bigint").alias("credit_micro_total"),
            F.count("*").cast("bigint").alias("n_touches"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        )
        .orderBy(F.col("credit_micro_total").desc(), "channel")
    )


# --------------------------------------------------------------------------
# retrieval_ndcg_eval
# --------------------------------------------------------------------------

#: literal micro-integer discount tables, folded in Python (the
#: decayed_user_value convention): w[i] = round(1e6 / log2(i + 1)) for
#: rank i, cum[r] = sum of the first r weights (the ideal-DCG prefix),
#: rr[i] = round(1e6 / i).  Identical literal strings feed both engines.
_NDCG_K = 10
_NDCG_W = [round(1_000_000 / math.log2(i + 1)) for i in range(1, _NDCG_K + 1)]
_NDCG_CUM = [0]
for _w in _NDCG_W:
    _NDCG_CUM.append(_NDCG_CUM[-1] + _w)
_NDCG_RR = [round(1_000_000 / i) for i in range(1, _NDCG_K + 1)]

_W_CASE = (
    "CASE rank "
    + " ".join(f"WHEN {i + 1} THEN {w}" for i, w in enumerate(_NDCG_W))
    + " ELSE 0 END"
)
_RR_CASE = (
    "CASE first_hit_rank "
    + " ".join(f"WHEN {i + 1} THEN {r}" for i, r in enumerate(_NDCG_RR))
    + " ELSE 0 END"
)
_IDCG_CASE = (
    "CASE least(n_rel_pool, " + str(_NDCG_K) + ") "
    + " ".join(f"WHEN {r} THEN {c}" for r, c in enumerate(_NDCG_CUM))
    + " ELSE 0 END"
)

_NDCG_DOT = PT.dot_double("e.embedding", "q.q_vec", PT.DUCKDB)

_NDCG_ORACLE = f"""
    WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec, label AS q_label
               FROM embeddings WHERE vec_id < 20),
    pool AS (SELECT vec_id, embedding, label FROM embeddings
             WHERE vec_id >= 20),
    ranked AS (
      SELECT q.q_id, q.q_label, e.vec_id, e.label,
             row_number() OVER (PARTITION BY q.q_id
                                ORDER BY {_NDCG_DOT} DESC, e.vec_id) AS rank
      FROM pool e, q
    ),
    scored AS (
      SELECT q_id, q_label, rank,
             CASE WHEN label = q_label THEN 1 ELSE 0 END AS rel
      FROM ranked WHERE rank <= {_NDCG_K}
    ),
    per_q AS (
      SELECT q_id, q_label,
             CAST(sum(rel) AS BIGINT) AS hits10,
             CAST(sum(rel * {_W_CASE}) AS BIGINT) AS dcg_micro,
             CAST(coalesce(min(CASE WHEN rel = 1 THEN rank END), 0)
                  AS BIGINT) AS first_hit_rank
      FROM scored GROUP BY 1, 2
    ),
    pc AS (SELECT label, CAST(count(*) AS BIGINT) AS n_rel_pool
           FROM pool GROUP BY 1),
    wide AS (
      SELECT per_q.q_id, per_q.q_label,
             CAST(coalesce(pc.n_rel_pool, 0) AS BIGINT) AS n_rel_pool,
             per_q.hits10, per_q.first_hit_rank, per_q.dcg_micro
      FROM per_q LEFT JOIN pc ON pc.label = per_q.q_label
    )
    SELECT q_id, q_label, n_rel_pool, hits10, first_hit_rank,
           CAST({_RR_CASE} AS BIGINT) AS rr_micro,
           dcg_micro,
           CAST({_IDCG_CASE} AS BIGINT) AS idcg_micro,
           CASE WHEN {_IDCG_CASE} > 0
                THEN CAST(floor(dcg_micro * 1000000.0 / ({_IDCG_CASE})
                                + 0.5) AS BIGINT)
                ELSE 0 END AS ndcg_micro
    FROM wide ORDER BY q_id
"""


@register(
    "retrieval_ndcg_eval",
    bench=True,
    oracle=_NDCG_ORACLE,
    doc="ranked-retrieval evaluation: NDCG@10, reciprocal rank, and "
    "precision@10 (hits10) of the exact cosine top-10 — queries are "
    "vec_id < 20, the pool is the rest, relevance is label equality "
    "with the query's ground-truth label.  Every transcendental "
    "(log2 discounts, 1/rank) is a Python-folded literal "
    "micro-integer table, so DCG, the ideal-DCG prefix (indexed by "
    "least(n_rel_pool, 10) — the true per-query normalizer, not a "
    "constant), and MRR are exact BIGINT sums; the single division "
    "per row is the NDCG normalization, floor-snapped to micro. "
    "Scale: scoring is the broadcast map-side dot + two-phase top-k "
    "(corpus never shuffled); everything after the top-k is "
    "(n_queries x 10)-bounded.  Beside clustering_nmi_purity this "
    "closes the eval loop on the retrieval ladder itself.",
)
def retrieval_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import ann

    e = _t(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_vec"),
        F.col("label").alias("q_label"),
    )
    pool = e.filter(F.col("vec_id") >= 20)
    topk = ann.brute_force_topk(
        pool, queries.select("q_id", "q_vec"), k=_NDCG_K
    )
    scored = (
        topk.join(pool.select("vec_id", "label"), "vec_id")
        .join(F.broadcast(queries.select("q_id", "q_label")), "q_id")
        .select(
            "q_id",
            "q_label",
            F.col("rank").cast("bigint").alias("rank"),
            F.when(F.col("label") == F.col("q_label"), 1)
            .otherwise(0)
            .alias("rel"),
        )
    )
    per_q = scored.groupBy("q_id", "q_label").agg(
        F.sum("rel").cast("bigint").alias("hits10"),
        F.sum(F.col("rel") * F.expr(_W_CASE)).cast("bigint").alias(
            "dcg_micro"
        ),
        F.coalesce(
            F.min(F.when(F.col("rel") == 1, F.col("rank"))), F.lit(0)
        )
        .cast("bigint")
        .alias("first_hit_rank"),
    )
    pc = pool.groupBy("label").agg(
        F.count("*").cast("bigint").alias("n_rel_pool")
    )
    wide = per_q.join(
        F.broadcast(pc), per_q.q_label == pc.label, "left"
    ).select(
        "q_id",
        "q_label",
        F.coalesce(F.col("n_rel_pool"), F.lit(0))
        .cast("bigint")
        .alias("n_rel_pool"),
        "hits10",
        "first_hit_rank",
        "dcg_micro",
    )
    return wide.select(
        "q_id",
        "q_label",
        "n_rel_pool",
        "hits10",
        "first_hit_rank",
        F.expr(_RR_CASE).cast("bigint").alias("rr_micro"),
        "dcg_micro",
        F.expr(_IDCG_CASE).cast("bigint").alias("idcg_micro"),
        F.expr(
            f"CASE WHEN {_IDCG_CASE} > 0 THEN CAST(floor(dcg_micro * "
            f"1000000.0 / ({_IDCG_CASE}) + 0.5) AS BIGINT) ELSE 0 END"
        ).alias("ndcg_micro"),
    ).orderBy("q_id")


# --------------------------------------------------------------------------
# knn_loo_confusion
# --------------------------------------------------------------------------

_KNN_K = 5
_KNN_NQ = 50

_KNN_DOT = PT.dot_double("e.embedding", "q.q_vec", PT.DUCKDB)

_KNN_ORACLE = f"""
    WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec, label AS q_label
               FROM embeddings WHERE vec_id < {_KNN_NQ}),
    nn AS (
      SELECT q_id, q_label, label FROM (
        SELECT q.q_id, q.q_label, e.label,
               row_number() OVER (PARTITION BY q.q_id
                                  ORDER BY {_KNN_DOT} DESC, e.vec_id) AS rnk
        FROM embeddings e, q WHERE e.vec_id <> q.q_id) t
      WHERE rnk <= {_KNN_K}
    ),
    votes AS (
      SELECT q_id, q_label, label AS cand, count(*) AS n_votes
      FROM nn GROUP BY 1, 2, 3
    ),
    pred AS (
      SELECT q_id, q_label, cand AS pred_label FROM (
        SELECT votes.*,
               row_number() OVER (PARTITION BY q_id
                                  ORDER BY n_votes DESC, cand) AS rv
        FROM votes) t
      WHERE rv = 1
    )
    SELECT CAST(q_label AS BIGINT) AS true_label,
           CAST(pred_label AS BIGINT) AS pred_label,
           CAST(count(*) AS BIGINT) AS n_queries,
           CAST(CASE WHEN q_label = pred_label THEN 1 ELSE 0 END AS BIGINT)
             AS is_correct
    FROM pred GROUP BY q_label, pred_label
    ORDER BY true_label, pred_label
"""


@register(
    "knn_loo_confusion",
    oracle=_KNN_ORACLE,
    doc="leave-one-out k-NN classifier evaluation: the first 50 "
    "vectors are queries, each classified by the majority vote of "
    "its 5 nearest NON-SELF neighbors in the full corpus (exact "
    "cosine, vote ties to the smaller label), reported as the "
    "true-vs-predicted confusion matrix with an is_correct diagonal "
    "marker.  The instance-based sibling of "
    "quality_classifier_trained and naive_bayes_lang_confusion.  "
    "Scale: one broadcast map-side scoring pass (corpus never "
    "shuffled, self excluded by taking top-(k+1) then dropping the "
    "self row); everything after the top-k is (n_queries x "
    "k)-bounded counting.",
)
def knn_loo_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import ann

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < _KNN_NQ).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_vec"),
        F.col("label").alias("q_label"),
    )
    # top-(k+1) including the query itself, then drop the self row:
    # cos(v, v) = 1 is maximal for unit vectors, so the k+1 window
    # always contains the true top-k non-self neighbors.
    top = ann.brute_force_topk(e, q.select("q_id", "q_vec"), k=_KNN_K + 1)
    nn = (
        top.filter(F.col("vec_id") != F.col("q_id"))
        .withColumn(
            "rnk2",
            F.row_number().over(
                Window.partitionBy("q_id").orderBy(
                    F.desc("similarity"), "vec_id"
                )
            ),
        )
        .filter(F.col("rnk2") <= _KNN_K)
        .join(e.select("vec_id", "label"), "vec_id")
        .join(F.broadcast(q.select("q_id", "q_label")), "q_id")
    )
    votes = nn.groupBy("q_id", "q_label", F.col("label").alias("cand")).agg(
        F.count("*").alias("n_votes")
    )
    pred = (
        votes.withColumn(
            "rv",
            F.row_number().over(
                Window.partitionBy("q_id").orderBy(
                    F.desc("n_votes"), "cand"
                )
            ),
        )
        .filter(F.col("rv") == 1)
        .select("q_id", "q_label", F.col("cand").alias("pred_label"))
    )
    return (
        pred.groupBy(
            F.col("q_label").cast("bigint").alias("true_label"),
            F.col("pred_label").cast("bigint").alias("pred_label"),
        )
        .agg(F.count("*").cast("bigint").alias("n_queries"))
        .select(
            "true_label",
            "pred_label",
            "n_queries",
            F.when(F.col("true_label") == F.col("pred_label"), 1)
            .otherwise(0)
            .cast("bigint")
            .alias("is_correct"),
        )
        .orderBy("true_label", "pred_label")
    )


# ---------------------------------------------------------------------------
# expected_calibration_error (round 10): the reliability diagram +
# ECE — is a predicted probability CALIBRATED, not just discriminative
# (the evaluation conformal/isotonic consume upstream).
# ---------------------------------------------------------------------------

@register(
    "expected_calibration_error",
    oracle="""
    WITH o AS (
      SELECT o_orderkey,
             least(CAST(floor(o_totalprice / 50000.0) AS BIGINT), 9)
               AS fbin,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
               AS y
      FROM orders
    ),
    train AS (
      SELECT fbin, CAST(sum(y) * 1000 // count(*) AS BIGINT) AS p_milli
      FROM o WHERE o_orderkey % 2 = 0 GROUP BY fbin
    ),
    ev AS (
      SELECT t.p_milli, o.y, t.p_milli // 100 AS cb
      FROM o JOIN train t USING (fbin) WHERE o.o_orderkey % 2 = 1
    ),
    buckets AS (
      SELECT cb, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(p_milli) // count(*) AS BIGINT) AS avg_pred_milli,
             CAST(sum(y) * 1000 // count(*) AS BIGINT) AS actual_milli
      FROM ev GROUP BY cb
    ),
    tot AS (
      SELECT CAST(sum(n * abs(avg_pred_milli - actual_milli)) // sum(n)
                  AS BIGINT) AS ece_milli
      FROM buckets
    )
    SELECT CAST(cb AS BIGINT) AS bucket, n, avg_pred_milli, actual_milli,
           CAST(abs(avg_pred_milli - actual_milli) AS BIGINT) AS gap_milli,
           tot.ece_milli
    FROM buckets CROSS JOIN tot ORDER BY bucket
    """,
    doc="Expected Calibration Error + reliability diagram (Naeini et "
    "al. 2015) — the evaluation that asks whether a predicted "
    "probability MEANS its number (conformal and isotonic consume "
    "calibration; this measures it).  The probability model is "
    "trained in-plan leakage-safe: even order keys fit per-price-bin "
    "urgent rates (exact milli integer division), odd keys are "
    "scored by their bin's trained rate — the stratified_split "
    "hash-half convention.  Eval predictions group into 10 "
    "calibration buckets (p_milli DIV 100); per bucket the mean "
    "prediction and realized rate are exact integer divisions, and "
    "ECE = sum(n_b * |avg_pred - actual|) DIV N — every number in "
    "the result is exact BIGINT arithmetic, no transcendental "
    "anywhere.  Eval rows whose price bin never appeared in the "
    "train half drop (inner join — ECE is defined over trained "
    "bins).  Scale: two grouped passes over orders plus a "
    "10-row-table broadcast join; the reliability table is bounded "
    "at 10 rows regardless of corpus size.",
)
def expected_calibration_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr(
            "least(CAST(floor(o_totalprice / 50000.0) AS BIGINT), 9)"
        ).alias("fbin"),
        F.expr(
            "CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END"
        ).alias("y"),
    )
    train = (
        o.filter(F.expr("o_orderkey % 2 = 0"))
        .groupBy("fbin")
        .agg(F.expr("CAST(sum(y) * 1000 DIV count(*) AS BIGINT)").alias("p_milli"))
    )
    ev = (
        o.filter(F.expr("o_orderkey % 2 = 1"))
        .join(F.broadcast(train), "fbin")
        .select("p_milli", "y", F.expr("p_milli DIV 100").alias("cb"))
    )
    buckets = ev.groupBy("cb").agg(
        F.count("*").cast("bigint").alias("n"),
        F.expr("CAST(sum(p_milli) DIV count(*) AS BIGINT)").alias(
            "avg_pred_milli"
        ),
        F.expr("CAST(sum(y) * 1000 DIV count(*) AS BIGINT)").alias(
            "actual_milli"
        ),
    )
    tot = buckets.agg(
        F.expr(
            "CAST(sum(n * abs(avg_pred_milli - actual_milli)) DIV sum(n)"
            " AS BIGINT)"
        ).alias("ece_milli")
    )
    return (
        buckets.crossJoin(F.broadcast(tot))
        .select(
            F.col("cb").cast("bigint").alias("bucket"),
            "n",
            "avg_pred_milli",
            "actual_milli",
            F.expr(
                "CAST(abs(avg_pred_milli - actual_milli) AS BIGINT)"
            ).alias("gap_milli"),
            "ece_milli",
        )
        .orderBy("bucket")
    )
