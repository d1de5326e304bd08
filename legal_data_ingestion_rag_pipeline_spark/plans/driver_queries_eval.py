"""Driver queries: model-evaluation and rolling-model operators
(round 8) — exactly two families, each implemented and registered in
this module:

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

Cross-engine exactness follows the repo conventions (exact BIGINT
counts/cents/moments; one transcendental or division per output
cell, snapped to micro-units; total-order tie-breaks).

No reference-file citation applies: /root/reference stops at
retrieval; these audit the models the ml/ml2 families train.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions import portable as PT
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
