"""Seeded-fuzz equivalence for the two-phase order-statistics layer
(operators/ranks.py) and integer-exact HITS (operators/graph.hits):
random skewed data replayed against the plain single-window form /
a pure-Python fixed-point model (the test_fuzz.py convention)."""

from __future__ import annotations

import collections
import math
import random

from pyspark.sql import Window, functions as F

from legal_data_ingestion_rag_pipeline_spark.operators import graph, ranks

SEED = 20260815


def _rand_rows(rng, n=400, groups=3):
    # heavy ties + negative values: the band contract must hold for
    # trunc-DIV bands over negatives too (callers use DIV on cents)
    return [
        (
            i,
            f"g{rng.randrange(groups)}",
            rng.choice([-5, -1, 0, 1, 2, 3, 7, 7, 7, 50, 51, 999]),
            rng.randrange(0, 20),
        )
        for i in range(n)
    ]


def test_fuzz_two_phase_rank_matches_single_window(spark):
    rng = random.Random(SEED)
    rows = _rand_rows(rng)
    df = spark.createDataFrame(
        rows, "id: bigint, grp: string, v: bigint, w: bigint"
    ).withColumn("band", F.expr("v DIV 4"))

    got = {
        r.id: r.rank
        for r in ranks.two_phase_rank(
            df, ["v", "id"], "band", part_cols=["grp"]
        ).collect()
    }
    w = Window.partitionBy("grp").orderBy("v", "id")
    want = {
        r.id: r.rank
        for r in df.withColumn("rank", F.row_number().over(w)).collect()
    }
    assert got == want

    # global (no part_cols) form
    got_g = {
        r.id: r.rank
        for r in ranks.two_phase_rank(df, ["v", "id"], "band").collect()
    }
    want_g = {
        r.id: r.rank
        for r in df.withColumn(
            "rank", F.row_number().over(Window.orderBy("v", "id"))
        ).collect()
    }
    assert got_g == want_g


def test_fuzz_two_phase_prefix_sum_matches_single_window(spark):
    rng = random.Random(SEED + 1)
    rows = _rand_rows(rng)
    df = spark.createDataFrame(
        rows, "id: bigint, grp: string, v: bigint, w: bigint"
    ).withColumn("band", F.expr("v DIV 4"))

    got = {
        r.id: r.w_run
        for r in ranks.two_phase_prefix_sum(
            df, ["v", "id"], "band", ["w"], part_cols=["grp"]
        ).collect()
    }
    w = (
        Window.partitionBy("grp")
        .orderBy("v", "id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = {
        r.id: r.w_run
        for r in df.withColumn("w_run", F.sum("w").over(w)).collect()
    }
    assert got == want


def test_quintile_score_balanced_and_bounded(spark):
    n = 23
    df = spark.createDataFrame(
        [(i,) for i in range(1, n + 1)], "rank: bigint"
    ).withColumn("n", F.lit(n).cast("bigint"))
    scores = [
        r.q
        for r in df.select(ranks.quintile_score("rank", "n").alias("q"))
        .orderBy("q")
        .collect()
    ]
    assert min(scores) == 1 and max(scores) == 5
    counts = collections.Counter(scores)
    # 1 + ((rank-1)*5) DIV n buckets differ by at most 1 in size
    assert max(counts.values()) - min(counts.values()) <= 1
    assert sum(counts.values()) == n


def _py_hits(edges, iterations):
    scale = graph.HITS_SCALE
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    out_adj = collections.defaultdict(set)
    in_adj = collections.defaultdict(set)
    for u, v in edges:
        out_adj[u].add(v)
        in_adj[v].add(u)

    def norm(raw):
        mx = max(raw.values())
        s = max(1, math.ceil(mx / scale))
        return {n: r // s for n, r in raw.items()}

    hub = {n: scale for n in nodes}
    auth = None
    for _ in range(iterations):
        auth = norm({n: sum(hub[u] for u in in_adj[n]) for n in nodes})
        hub = norm({n: sum(auth[v] for v in out_adj[n]) for n in nodes})
    return hub, auth


def test_fuzz_hits_matches_python_model(spark):
    rng = random.Random(SEED + 2)
    for _ in range(2):
        edges = set()
        while len(edges) < 40:
            a, b = rng.randrange(15), rng.randrange(15)
            if a != b:
                edges.add((a, b))
        edges = sorted(edges)
        hub, auth = _py_hits(edges, iterations=2)
        e = spark.createDataFrame(edges, "src: bigint, dst: bigint")
        got = {
            r.node: (r.hub_units, r.auth_units)
            for r in graph.hits(e, iterations=2).collect()
        }
        assert got == {n: (hub[n], auth[n]) for n in hub}


def test_gram_moments_partition_independent(spark):
    """Exact integer Gram: any partitioning yields the identical
    cells, and they match a direct numpy computation."""
    import numpy as np

    from legal_data_ingestion_rag_pipeline_spark.operators.linalg import (
        VEC_SCALE,
        covariance_spectrum_py,
        gram_moments,
    )

    rng = random.Random(SEED + 3)
    dim = 5
    vecs = [
        [rng.uniform(-1, 1) for _ in range(dim)] for _ in range(40)
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "id: long, embedding: array<double>",
    )

    def cells(frame):
        return {
            (r.i, r.j): r.v
            for r in gram_moments(frame, "embedding", dim).collect()
        }

    c1 = cells(df.coalesce(1))
    c7 = cells(df.repartition(7))
    assert c1 == c7

    q = np.floor(
        np.asarray(vecs, dtype=np.float64) * float(VEC_SCALE) + 0.5
    ).astype(np.int64)
    want_gram = q.T @ q
    for i in range(dim):
        for j in range(dim):
            assert c1[(i, j)] == want_gram[i, j]
    assert all(c1[(dim, j)] == q[:, j].sum() for j in range(dim))
    assert c1[(dim, dim)] == len(vecs)

    spec = covariance_spectrum_py(
        [(i, j, v) for (i, j), v in c1.items()], dim, top_k=3
    )
    # eigenvalues of a real scatter matrix: descending, non-negative
    vals = [v for _, v in spec]
    assert vals == sorted(vals, reverse=True)
    assert vals[-1] >= 0


def test_two_phase_prefix_max_matches_single_window(spark):
    """Fuzz: band-parallel prefix max == the plain single-window form,
    both inclusive and strict-predecessor, over ties and negatives."""
    rng = random.Random(SEED + 7)
    rows = [
        (i, rng.randrange(-50, 51), rng.randrange(-1000, 1001))
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "id bigint, k bigint, v bigint")
    df = df.withColumn("band", F.expr("k DIV 7"))
    for inclusive in (True, False):
        got = {
            r["id"]: r["pm"]
            for r in ranks.two_phase_prefix_max(
                df,
                ["k", "id"],
                "band",
                "v",
                out_name="pm",
                inclusive=inclusive,
            ).collect()
        }
        end = 0 if inclusive else -1
        w = Window.orderBy("k", "id").rowsBetween(
            Window.unboundedPreceding, end
        )
        want = {
            r["id"]: r["pm"]
            for r in df.withColumn("pm", F.max("v").over(w)).collect()
        }
        assert got == want, f"inclusive={inclusive}"


def test_pareto_frontier_is_exactly_the_undominated_set(spark):
    """The skyline query equals the brute-force dominance filter and
    is an antichain: along increasing price, frontier sizes strictly
    increase (equal-price members have equal size)."""
    from legal_data_ingestion_rag_pipeline_spark.plans.registry import registry

    sf = "/root/testdata/sf0.001"
    got = [
        (r["part_key"], r["price_cents"], r["size"])
        for r in registry()["pareto_frontier_parts"].spark(spark, sf).collect()
    ]
    import duckdb

    pts = duckdb.connect().execute(
        f"""SELECT p_partkey, CAST(floor(p_retailprice * 100.0 + 0.5)
            AS BIGINT), CAST(p_size AS BIGINT)
            FROM read_parquet('{sf}/part.parquet')"""
    ).fetchall()
    want = sorted(
        (int(k), int(p), int(s))
        for k, p, s in pts
        if not any(
            bp <= p and bs >= s and (bp < p or bs > s)
            for _, bp, bs in pts
        )
    )
    assert sorted(got) == want
    for (_, pa, sa), (_, pb, sb) in zip(got, got[1:]):
        assert (pa < pb and sa < sb) or (pa == pb and sa == sb)
