"""Data valuation — exact KNN-Shapley (Jia et al. 2019, "Efficient
Task-Specific Data Valuation for Nearest Neighbor Algorithms"),
Spark-first.

The training-data curation primitive the quality-classifier / DSIR
families don't cover: assign each TRAINING point an exact Shapley
value for the K-NN utility on a validation set — which examples help,
which hurt.  For the K-NN utility the Shapley value has a closed-form
recursion over the distance ranking, so the usually-exponential
valuation is O(N log N) per validation point:

    with training points ranked 1..N by distance to test point t
    (1 = nearest), u_j = 1[label_j = label_t]:

        s_N = u_N / N
        s_j = s_{j+1} + (u_j - u_{j+1}) / K * min(K, j) / j

Declarative form (NO iteration): unroll the recursion into a SUFFIX
SUM — s_j = u_N/N + sum_{m=j}^{N-1} (u_m - u_{m+1}) * min(K,m)/(K*m)
— which is one ranking window plus one suffix-sum window per test
point.  Exactness contract: each per-rank term is micro-snapped to
pico units (FLOOR(x*1e12 + 0.5); the inner x is ONE double division
of exact small integers, bit-identical across engines), so the suffix
sum and the per-training-point total are exact BIGINT sums — the
hash-gate convention.

Scale shape (100 TB):
- the validation pool is small by construction (a held-out sample) —
  BROADCAST it; distances compute map-side against the training scan
  (one pass, column-pruned to id/vector/label);
- ONE shuffle on test_id feeds the ranking window; the same partition
  serves rank, lead, count and the suffix sum (extra in-partition
  sorts, no extra exchange);
- per-test partitions hold N rows: at corpus scale either bound the
  valued pool (an IVF/LSH candidate prefilter — the operators/ann.py
  machinery) or replace row_number with the band-parallel two-phase
  rank of operators/ranks.py keyed per test point; the recursion only
  needs ranks and suffix sums, both of which that machinery provides;
- the final per-training-point total is a uniform-key groupBy and the
  top-k output plans as TakeOrderedAndProject.

No reference-file citation applies: /root/reference stops at
retrieval; this extends the curation family (SURVEY.md
beyond-reference operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions import portable as PT

#: pico-unit scale for the per-rank Shapley terms
P12 = "1000000000000.0"


def knn_shapley(
    train: DataFrame,
    test: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    pool: int | None = None,
) -> DataFrame:
    """(test_id, train_id, train_label, shapley_p12): the exact
    KNN-Shapley value of every training point for every test point,
    in pico units.  Columns of ``test`` are consumed as the same
    (id, vec, label) triple; the test frame must be small (it is
    broadcast).

    ``pool``: value only each test point's ``pool`` nearest
    candidates (pool-restricted Shapley — the recursion's N becomes
    the pool size).  This is the corpus-scale form: with an IVF/LSH
    prefilter supplying the pool, the per-test window frames are
    bounded by construction instead of corpus-sized."""
    t = test.select(
        F.col(id_col).alias("test_id"),
        F.col(vec_col).alias("_tv"),
        F.col(label_col).alias("_tl"),
    )
    r = train.select(
        F.col(id_col).alias("train_id"),
        F.col(vec_col).alias("_rv"),
        F.col(label_col).cast("bigint").alias("train_label"),
    )
    pairs = r.join(F.broadcast(t)).select(
        "test_id",
        "train_id",
        "train_label",
        F.when(F.col("train_label") == F.col("_tl").cast("bigint"), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("u"),
        F.expr(PT.sq_l2_q6("_rv", "_tv", PT.SPARK)).alias("d2"),
    )
    w = Window.partitionBy("test_id").orderBy(F.asc("d2"), F.asc("train_id"))
    if pool is not None:
        pairs = pairs.withColumn("j", F.row_number().over(w)).filter(
            F.col("j") <= pool
        )
        wj = Window.partitionBy("test_id").orderBy(F.asc("j"))
        ranked = pairs.select(
            "test_id",
            "train_id",
            "train_label",
            "u",
            "j",
            F.lead("u").over(wj).alias("u_next"),
            F.count("*").over(Window.partitionBy("test_id")).alias("n"),
        )
    else:
        ranked = pairs.select(
            "test_id",
            "train_id",
            "train_label",
            "u",
            F.row_number().over(w).alias("j"),
            F.lead("u").over(w).alias("u_next"),
            F.count("*").over(Window.partitionBy("test_id")).alias("n"),
        )
    term = F.when(
        F.col("j") < F.col("n"),
        F.expr(
            f"CAST(FLOOR((u - u_next) * LEAST({k}, j) * {P12}"
            f" / ({k} * j) + 0.5) AS BIGINT)"
        ),
    ).otherwise(F.expr(f"CAST(FLOOR(u * {P12} / n + 0.5) AS BIGINT)"))
    suffix = Window.partitionBy("test_id").orderBy(F.desc("j")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return ranked.withColumn("_term", term).select(
        "test_id",
        "train_id",
        "train_label",
        F.sum("_term").over(suffix).cast("bigint").alias("shapley_p12"),
    )


def knn_shapley_py(
    rows: list[tuple[int, list[float], int]],
    test_ids: set[int],
    k: int,
) -> dict[tuple[int, int], int]:
    """Sparkless twin: {(test_id, train_id): shapley_p12} — bit-equal
    replay of :func:`knn_shapley` (same micro-quantized distances,
    same pico-floored terms, same suffix-sum order)."""
    import math

    def q6(x: float) -> int:
        return math.floor(float(x) * 1e6 + 0.5)

    test = [(i, v, l) for (i, v, l) in rows if i in test_ids]
    train = [(i, v, l) for (i, v, l) in rows if i not in test_ids]
    out: dict[tuple[int, int], int] = {}
    for tid, tv, tl in test:
        qt = [q6(x) for x in tv]
        scored = []
        for rid, rv, rl in train:
            d2 = sum((q6(x) - y) ** 2 for x, y in zip(rv, qt))
            scored.append((d2, rid, 1 if rl == tl else 0))
        scored.sort()
        n = len(scored)
        terms = []
        for idx, (_, rid, u) in enumerate(scored):
            j = idx + 1
            if j < n:
                u_next = scored[idx + 1][2]
                x = (u - u_next) * min(k, j) * 1e12 / (k * j)
            else:
                x = u * 1e12 / n
            terms.append(math.floor(x + 0.5))
        # suffix sums in descending-j order (the Spark window's fold)
        acc = 0
        svals = [0] * n
        for idx in range(n - 1, -1, -1):
            acc += terms[idx]
            svals[idx] = acc
        for idx, (_, rid, _u) in enumerate(scored):
            out[(tid, rid)] = svals[idx]
    return out
