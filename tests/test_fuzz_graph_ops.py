"""Seeded-fuzz equivalence for the session-3 iterative operators:
random small graphs / interval sets replayed against pure-Python
reference models (the test_fuzz.py convention)."""

from __future__ import annotations

import collections
import random

from pyspark.sql import functions as F

from legal_data_ingestion_rag_pipeline_spark.operators import graph, sweep

SEED = 20260814


def _rand_graph(rng, n=18, m=30):
    edges = set()
    while len(edges) < m:
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    return sorted(edges)


def _adj(edges):
    adj = collections.defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    return adj


def test_fuzz_k_core_matches_python_peel(spark):
    rng = random.Random(SEED)
    for _ in range(2):
        edges = _rand_graph(rng)
        adj = _adj(edges)
        k = 3
        deg = {v: len(n) for v, n in adj.items()}
        live = set(adj)
        while True:
            drop = {v for v in live if deg[v] < k}
            if not drop:
                break
            for v in drop:
                live.discard(v)
                for u in adj[v]:
                    if u in live:
                        deg[u] -= 1
        e = spark.createDataFrame(edges, "a: bigint, b: bigint")
        got = {r.v: r.core_degree for r in graph.k_core(e, k=k).collect()}
        assert set(got) == live
        assert got == {v: deg[v] for v in live}


def test_fuzz_bfs_matches_python(spark):
    rng = random.Random(SEED + 1)
    edges = _rand_graph(rng)
    adj = _adj(edges)
    src = min(adj)
    dist = {src: 0}
    frontier = [src]
    while frontier:
        nxt = []
        for v in frontier:
            for u in adj[v]:
                if u not in dist:
                    dist[u] = dist[v] + 1
                    nxt.append(u)
        frontier = nxt
    cap = 3
    expect = {v: d for v, d in dist.items() if d <= cap}
    e = spark.createDataFrame(edges, "a: bigint, b: bigint")
    got = {
        r.v: r.dist
        for r in graph.bfs_distances(e, source=src, max_depth=cap).collect()
    }
    assert got == expect


def test_fuzz_bellman_ford_matches_python(spark):
    rng = random.Random(SEED + 2)
    n = 15
    edges = [
        (rng.randrange(n), rng.randrange(n), rng.randrange(1, 50))
        for _ in range(40)
    ]
    edges = [(a, b, w) for a, b, w in edges if a != b]
    rounds = 4
    INF = float("inf")
    dist = {0: 0}
    for _ in range(rounds):
        nxt = dict(dist)
        for a, b, w in edges:
            if a in dist and dist[a] + w < nxt.get(b, INF):
                nxt[b] = dist[a] + w
        dist = nxt
    e = spark.createDataFrame(edges, "src: bigint, dst: bigint, w: bigint")
    got = {
        r.v: r.dist for r in graph.bellman_ford(e, 0, rounds=rounds).collect()
    }
    assert got == dist


def test_fuzz_lpa_matches_python(spark):
    rng = random.Random(SEED + 3)
    edges = _rand_graph(rng, n=14, m=24)
    adj = _adj(edges)
    rounds = 3
    labels = {v: v for v in adj}
    for _ in range(rounds):
        nxt = {}
        for v in adj:
            cnt = collections.defaultdict(int)
            for u in adj[v]:
                cnt[labels[u]] += 1
            nxt[v] = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))[0]
        labels = nxt
    e = spark.createDataFrame(edges, "a: bigint, b: bigint")
    got = {
        r.v: r.label
        for r in graph.label_propagation(e, rounds=rounds).collect()
    }
    assert got == labels


def test_fuzz_concurrency_matches_global_sweep(spark):
    rng = random.Random(SEED + 4)
    base = 1_700_000_000
    iv = []
    for _ in range(40):
        s = base + rng.randrange(0, 3 * 86400)
        e = s + rng.randrange(0, 86400)
        iv.append((s, e))
    # python global sweep (post-change convention, [s, e) half-open)
    deltas = collections.defaultdict(int)
    for s, e in iv:
        deltas[s] += 1
        deltas[e] -= 1
    run = 0
    by_day_peak = {}
    by_day_carry = {}
    import datetime as dt

    for ts in sorted(deltas):
        day = dt.datetime.fromtimestamp(ts, dt.timezone.utc).date().isoformat()
        if day not in by_day_carry:
            by_day_carry[day] = run
        run += deltas[ts]
        by_day_peak[day] = max(by_day_peak.get(day, -(10**9)), run)
    df = spark.createDataFrame(iv, "s_epoch: bigint, e_epoch: bigint").select(
        F.timestamp_seconds("s_epoch").alias("s"),
        F.timestamp_seconds("e_epoch").alias("e"),
    )
    rows = {
        str(r.day): (r.carry_in, r.peak_concurrent)
        for r in sweep.concurrency_by_day(df, "s", "e").collect()
    }
    assert rows == {
        d: (by_day_carry[d], by_day_peak[d]) for d in by_day_peak
    }


def test_fuzz_personalized_pagerank_matches_python(spark):
    """Seed-restart walk vs a pure-Python integer twin on a random
    graph; also checks mass concentrates near the seeds."""
    rng = random.Random(SEED + 7)
    edges = _rand_graph(rng, n=14, m=24)
    und = sorted(set(edges) | {(b, a) for a, b in edges})
    nodes = sorted({v for e in und for v in e})
    seeds = [v for v in nodes[:3]]
    SCALE = graph.PAGERANK_SCALE
    ns = len(seeds)
    unit = SCALE // ns
    base = 15 * unit // 100
    out = collections.defaultdict(list)
    for a, b in und:
        out[a].append(b)
    rank = {v: (unit if v in seeds else 0) for v in nodes}
    for _ in range(2):
        dang = sum(rank[v] for v in nodes if not out[v])
        cin = collections.defaultdict(int)
        for a in nodes:
            if out[a]:
                c = rank[a] // len(out[a])
                for b in out[a]:
                    cin[b] += c
        rank = {
            v: (base if v in seeds else 0)
            + (85 * (cin[v] + ((dang // ns) if v in seeds else 0))) // 100
            for v in nodes
        }
    e = spark.createDataFrame(und, "src: bigint, dst: bigint")
    sd = spark.createDataFrame([(s,) for s in seeds], "node: bigint")
    got = {
        r.node: r.rank_units
        for r in graph.personalized_pagerank(e, sd, iterations=2).collect()
    }
    assert got == rank
    # proximity: total seed-side mass should dominate a uniform share
    seed_mass = sum(rank[s] for s in seeds)
    assert seed_mass * len(nodes) > sum(rank.values()) * ns


def test_fuzz_boruvka_matches_python_kruskal(spark):
    """Random weighted graphs (with DUPLICATE weights, multiple
    components, and parallel-edge candidates) against a sequential
    Kruskal under the same (w, lo, hi) total order — different
    algorithm, same unique forest."""
    from fixtures import fuzz_trials

    rng = random.Random(SEED + 13)
    # tail slice: kept trials' rng draws unchanged
    for n, m in ((14, 20), (20, 26), (12, 33))[: fuzz_trials(3, 2)]:
        edges = [
            (a, b, rng.randrange(1, 6))  # heavy weight ties on purpose
            for a, b in _rand_graph(rng, n=n, m=m)
        ]
        df = spark.createDataFrame(edges, "lo: bigint, hi: bigint, w: bigint")
        got = sorted(
            (r.lo, r.hi, r.w) for r in graph.boruvka_msf(df).collect()
        )
        parent = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        want = []
        for w, lo, hi in sorted((w, a, b) for a, b, w in edges):
            ra, rb = find(lo), find(hi)
            if ra != rb:
                parent[ra] = rb
                want.append((lo, hi, w))
        assert got == sorted(want)
