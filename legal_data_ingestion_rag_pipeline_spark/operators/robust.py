"""Robust statistics over embedding columns — the geometric median
(Weiszfeld 1937; Beck & Sabach 2015 for the modern treatment),
Spark-first.

Why a curation engine needs it: the component-wise MEAN of an
embedding group (embedding_label_centroids) is the L2-optimal
prototype but a single mislabeled or outlier vector drags it; the
GEOMETRIC MEDIAN (the L1/Fermat-Weber point) has a 0.5 breakdown
point, making it the robust class prototype for label-noise auditing,
robust-aggregation (e.g. Byzantine-tolerant gradient/embedding
averaging, Blanchard et al. 2017), and outlier scoring — the natural
companion to the KNN-Shapley valuation in operators/valuation.py.

Weiszfeld iteration, fixed unroll (the kmeans_two_iterations
convention — deterministic init, every float snapped, the whole
trajectory hash-checkable against an unrolled SQL oracle):

    m_0   = component-wise mean (DECIMAL-exact sums, round6)
    d_i   = round6( sqrt( sum_j (x_ij - m_j)^2 ) )   [left fold]
    w_i   = round6( 1 / max(d_i, 1e-6) )             [singularity guard]
    m'_j  = round6( sum_i dec27(round6(x_ij * w_i)) / sum_i dec27(w_i) )

Every per-row quantity is round6-snapped (identical double arithmetic
both engines), every cross-row sum runs in DECIMAL(27,10) (exact,
order-independent), every decimal->double re-entry is round6-snapped —
the repo's hash-gate recipe for iterative float algorithms.

Scale shape (100 TB): the median table is (groups x dim) — KBs —
and BROADCASTS to the corpus each iteration; per iteration the corpus
is scanned once (distance + weight map-side) and shuffles ONLY
(group, pos) partial sums (groups x dim rows after map-side combine)
plus a (group) weight sum.  Iterations cost scans, not state; the
loop is a fixed plan unroll, no driver-side data.

No reference-file citation applies: /root/reference stops at
retrieval; this extends the robust-statistics family (SURVEY.md
beyond-reference operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import portable as PT

#: Weiszfeld singularity guard: distances clamp to this floor before
#: inversion (a point coinciding with the current iterate would
#: otherwise produce an infinite weight)
D_FLOOR = "0.000001"


def dist6_sql(x: str, m: str, dialect: str) -> str:
    """round6(sqrt(sum_j (x_j - m_j)^2)): the snapped Euclidean
    distance between a float array and a double array, left-folded in
    array order — bit-identical across engines."""
    if dialect == PT.SPARK:
        diffs = (
            f"zip_with({x}, {m}, (a, b) ->"
            f" (CAST(a AS DOUBLE) - b) * (CAST(a AS DOUBLE) - b))"
        )
    else:
        diffs = PT.transform(
            f"list_zip({x}, {m})",
            "p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))"
            " * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))",
            dialect,
        )
    fold = PT.reduce_(
        diffs, "CAST(0.0 AS DOUBLE)", "(s, v) -> s + v", dialect
    )
    return PT.round6(f"sqrt({fold})", dialect)


def _mean_init(points: DataFrame, group_col: str, vec_col: str) -> DataFrame:
    pos = points.select(
        group_col, F.posexplode(vec_col).alias("pos", "val")
    )
    agg = pos.groupBy(group_col, "pos").agg(
        F.sum(F.col("val").cast("double").cast("decimal(27,10)"))
        .cast("double")
        .alias("s"),
        F.count("*").alias("c"),
    )
    agg = agg.withColumn("m", F.expr(PT.round6("s / c", PT.SPARK)))
    return agg.groupBy(group_col).agg(
        F.expr(
            "transform(array_sort(collect_list(struct(pos, m))), x -> x.m)"
        ).alias("gm")
    )


def _weiszfeld_step(
    points: DataFrame, medians: DataFrame, group_col: str, vec_col: str
) -> DataFrame:
    j = points.join(F.broadcast(medians), group_col)
    d6 = dist6_sql(vec_col, "gm", PT.SPARK)
    w6 = PT.round6(f"1.0 / GREATEST({d6}, {D_FLOOR})", PT.SPARK)
    weighted = j.select(group_col, vec_col, F.expr(w6).alias("w"))
    den = weighted.groupBy(group_col).agg(
        F.sum(F.col("w").cast("decimal(27,10)")).cast("double").alias("den")
    )
    term6 = PT.round6("CAST(val AS DOUBLE) * w", PT.SPARK)
    num = (
        weighted.select(
            group_col, "w", F.posexplode(vec_col).alias("pos", "val")
        )
        .select(group_col, "pos", F.expr(term6).alias("t"))
        .groupBy(group_col, "pos")
        .agg(
            F.sum(F.col("t").cast("decimal(27,10)"))
            .cast("double")
            .alias("nu")
        )
    )
    upd = num.join(F.broadcast(den), group_col).withColumn(
        "m", F.expr(PT.round6("nu / den", PT.SPARK))
    )
    return upd.groupBy(group_col).agg(
        F.expr(
            "transform(array_sort(collect_list(struct(pos, m))), x -> x.m)"
        ).alias("gm")
    )


def geometric_median(
    points: DataFrame,
    group_col: str,
    vec_col: str,
    iters: int = 2,
) -> DataFrame:
    """(group, gm): the Weiszfeld iterate after ``iters`` snapped steps
    from the component-mean init — the robust group prototype."""
    # NULL vectors would silently vanish from the mean init (posexplode
    # emits nothing) yet still join each step — exclude them up front
    # and let callers decide whether NULLs are an error
    points = points.filter(F.col(vec_col).isNotNull())
    m = _mean_init(points, group_col, vec_col)
    for _ in range(iters):
        m = _weiszfeld_step(points, m, group_col, vec_col)
    return m


def geometric_median_report(
    points: DataFrame,
    group_col: str,
    vec_col: str,
    iters: int = 2,
) -> DataFrame:
    """Gate-shaped output: (group, n_points, median_csv, obj_micro) —
    the final median serialized on the %.6f grid and the L1 objective
    (exact BIGINT sum of micro-floored point distances)."""
    m = geometric_median(points, group_col, vec_col, iters)
    j = points.join(F.broadcast(m), group_col)
    d6 = dist6_sql(vec_col, "gm", PT.SPARK)
    return (
        j.select(
            group_col,
            F.expr(
                f"CAST(FLOOR(({d6}) * 1000000.0 + 0.5) AS BIGINT)"
            ).alias("_dm"),
            F.expr(PT.vec_csv6("gm", PT.SPARK)).alias("median_csv"),
        )
        .groupBy(group_col, "median_csv")
        .agg(
            F.count("*").cast("bigint").alias("n_points"),
            F.sum("_dm").cast("bigint").alias("obj_micro"),
        )
        .select(group_col, "n_points", "median_csv", "obj_micro")
    )


def weiszfeld_oracle_sql(
    pts_cte: str, group_col: str = "g", iters: int = 2
) -> str:
    """The unrolled DuckDB twin: ``pts_cte`` must select (g, x).
    Mirrors every snap of the Spark path step for step."""
    D = PT.DUCKDB
    mean_m = PT.round6(
        "CAST(sum(CAST(CAST(val AS DOUBLE) AS DECIMAL(27,10)))"
        " AS DOUBLE) / count(*)",
        D,
    )
    ctes = [
        f"pts AS ({pts_cte})",
        f"""m0 AS (
      SELECT g, array_agg(m ORDER BY pos) AS gm FROM (
        SELECT g, pos, {mean_m} AS m
        FROM (SELECT g, unnest(x) AS val,
                     unnest(range(0, len(x))) AS pos FROM pts)
        GROUP BY g, pos
      ) GROUP BY g
    )""",
    ]
    prev = "m0"
    for t in range(1, iters + 1):
        d6 = dist6_sql("p.x", "m.gm", D)
        w6 = PT.round6(f"1.0 / GREATEST({d6}, {D_FLOOR})", D)
        term6 = PT.round6("CAST(val AS DOUBLE) * w", D)
        m_new = PT.round6("nu / den", D)
        ctes.append(
            f"""w{t} AS (
      SELECT p.g, p.x, {w6} AS w
      FROM pts p JOIN {prev} m ON p.g = m.g
    )"""
        )
        ctes.append(
            f"""den{t} AS (
      SELECT g, CAST(sum(CAST(w AS DECIMAL(27,10))) AS DOUBLE) AS den
      FROM w{t} GROUP BY g
    )"""
        )
        ctes.append(
            f"""num{t} AS (
      SELECT g, pos,
             CAST(sum(CAST(term AS DECIMAL(27,10))) AS DOUBLE) AS nu
      FROM (
        SELECT g, pos, {term6} AS term
        FROM (SELECT g, w, unnest(x) AS val,
                     unnest(range(0, len(x))) AS pos FROM w{t})
      ) GROUP BY g, pos
    )"""
        )
        ctes.append(
            f"""m{t} AS (
      SELECT g, array_agg(m ORDER BY pos) AS gm FROM (
        SELECT n.g, n.pos, {m_new} AS m
        FROM num{t} n JOIN den{t} d USING (g)
      ) GROUP BY g
    )"""
        )
        prev = f"m{t}"
    d_final = dist6_sql("p.x", "m.gm", D)
    csv = PT.vec_csv6("m.gm", D)
    return f"""
    WITH {",".join(ctes)}
    SELECT g AS {group_col},
           CAST(count(*) AS BIGINT) AS n_points,
           ANY_VALUE(mcsv) AS median_csv,
           CAST(SUM(CAST(FLOOR(dm * 1000000.0 + 0.5) AS BIGINT))
                AS BIGINT) AS obj_micro
    FROM (
      SELECT p.g, {d_final} AS dm, {csv} AS mcsv
      FROM pts p JOIN {prev} m ON p.g = m.g
    )
    GROUP BY g ORDER BY g
    """
