"""Unit tests for the round-7 session-tail operators: k-core peeling,
BSP BFS, and the sweep-line concurrency prefix sum."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from legal_data_ingestion_rag_pipeline_spark.operators import graph, sweep


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "a: bigint, b: bigint")


def test_k_core_peels_tree_and_keeps_clique(spark):
    # a 4-clique with a pendant path hanging off it: the 3-core is
    # exactly the clique, found only after the path peels layer by
    # layer (2 rounds), which exercises the iterative re-count.
    clique = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    path = [(4, 5), (5, 6)]
    core = graph.k_core(_edges(spark, clique + path), k=3).collect()
    assert {r.v for r in core} == {1, 2, 3, 4}
    assert all(r.core_degree == 3 for r in core)


def test_k_core_empty_when_k_exceeds_graph(spark):
    core = graph.k_core(_edges(spark, [(1, 2), (2, 3)]), k=5).collect()
    assert core == []


def test_k_core_rejects_bad_k(spark):
    with pytest.raises(ValueError):
        graph.k_core(_edges(spark, [(1, 2)]), k=0)


def test_bfs_distances_chain_and_cap(spark):
    chain = [(i, i + 1) for i in range(6)]  # 0-1-2-3-4-5-6
    d = {
        r.v: r.dist
        for r in graph.bfs_distances(
            _edges(spark, chain), source=0, max_depth=12
        ).collect()
    }
    assert d == {i: i for i in range(7)}
    # the depth cap truncates the frontier, it doesn't mislabel
    d3 = {
        r.v: r.dist
        for r in graph.bfs_distances(
            _edges(spark, chain), source=0, max_depth=3
        ).collect()
    }
    assert d3 == {0: 0, 1: 1, 2: 2, 3: 3}


def test_bfs_unreachable_absent(spark):
    d = {
        r.v: r.dist
        for r in graph.bfs_distances(
            _edges(spark, [(1, 2), (10, 11)]), source=1
        ).collect()
    }
    assert d == {1: 0, 2: 1}


def test_bfs_two_level_antijoin_collision_classes(spark):
    """Pin the undirected two-level anti-join rework (round 13): a
    depth-d candidate can only collide with levels d-1 and d-2, so
    the duplicate filter keeps just the last two frontiers.  Each
    collision class gets a witness:

    - EVEN cycle 0-1-2-3-0: from 0, vertex 0 is re-proposed at depth
      2 by both depth-1 frontiers (a d-2 collision);
    - ODD cycle 10-11-12-10: 11 and 12 propose each other at depth 2
      (a d-1 collision);
    - diamond 20-{21,22}-23: 23 is proposed twice within one level
      (same-level dedup via the distinct, not the anti-join).

    If the anti-join dropped a needed level, a settled vertex would
    re-emit with a larger dist and the dicts below would double-key.
    """
    edges = [
        (0, 1), (1, 2), (2, 3), (3, 0),          # even cycle
        (10, 11), (11, 12), (12, 10),            # odd cycle
        (20, 21), (20, 22), (21, 23), (22, 23),  # diamond
    ]
    rows = graph.bfs_distances(
        _edges(spark, edges), source=0, max_depth=8
    ).collect()
    assert len(rows) == len({r.v for r in rows})  # no re-emission
    assert {r.v: r.dist for r in rows} == {0: 0, 1: 1, 3: 1, 2: 2}
    rows = graph.bfs_distances(
        _edges(spark, edges), source=10, max_depth=8
    ).collect()
    assert {r.v: r.dist for r in rows} == {10: 0, 11: 1, 12: 1}
    rows = graph.bfs_distances(
        _edges(spark, edges), source=20, max_depth=8
    ).collect()
    assert {r.v: r.dist for r in rows} == {20: 0, 21: 1, 22: 1, 23: 2}


def test_multi_source_bfs_two_level_antijoin_overlapping_cones(spark):
    """Same pin for the landmark form: cones are independent, so a
    vertex settled in one landmark's cone must still be discovered by
    another's, while within each cone the two-level filter holds (the
    shared even cycle gives every landmark a d-2 collision)."""
    edges = [(0, 1), (1, 2), (2, 3), (3, 0)]
    got = {
        (r.landmark, r.v): r.dist
        for r in graph.multi_source_bfs(
            _edges(spark, edges), sources=[0, 2], max_depth=8
        ).collect()
    }
    assert got == {
        (0, 0): 0, (0, 1): 1, (0, 3): 1, (0, 2): 2,
        (2, 2): 0, (2, 1): 1, (2, 3): 1, (2, 0): 2,
    }


def test_concurrency_two_phase_matches_global_sweep(spark):
    # intervals engineered to cross day boundaries so the day-carry
    # path is actually exercised: the global single-sort sweep is the
    # oracle the operator must reproduce exactly.
    iv = spark.createDataFrame(
        [
            ("2024-01-01 08:00:00", "2024-01-01 12:00:00"),
            ("2024-01-01 09:00:00", "2024-01-02 10:00:00"),  # crosses midnight
            ("2024-01-01 11:00:00", "2024-01-01 11:00:00"),  # empty [s,s)
            ("2024-01-02 09:30:00", "2024-01-03 01:00:00"),  # crosses again
            ("2024-01-02 09:30:00", "2024-01-02 09:45:00"),  # tied start
        ],
        "s_raw: string, e_raw: string",
    ).select(
        F.to_timestamp("s_raw").alias("s"), F.to_timestamp("e_raw").alias("e")
    )
    rows = {
        str(r.day): (r.carry_in, r.peak_concurrent, r.n_starts)
        for r in sweep.concurrency_by_day(iv, "s", "e").collect()
    }
    # day 1: +1@8, +1@9, (+1-1)@11 cancels, -1@12 -> peak 2, carry 0
    assert rows["2024-01-01"] == (0, 2, 3)
    # day 2 enters with 1 open (the midnight-crosser): +2@9:30(tied),
    # -1@9:45, -1@10 -> peak 3
    assert rows["2024-01-02"] == (1, 3, 2)
    # day 3 enters with 1 open, closes it at 01:00 -> peak 0 after the
    # change point (post-change convention), carry 1
    assert rows["2024-01-03"] == (1, 0, 0)


def test_sessions_from_events_gap_rule(spark):
    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 10),
            (1, "2024-01-01 00:29:00", 11),  # same session (29 min)
            (1, "2024-01-01 01:00:00", 12),  # 31 min gap -> new session
            (2, "2024-01-01 00:00:00", 13),
        ],
        "user_id: bigint, ts_raw: string, event_id: bigint",
    ).select("user_id", F.to_timestamp("ts_raw").alias("ts"), "event_id")
    iv = sweep.sessions_from_events(ev).collect()
    per_user = {}
    for r in iv:
        per_user.setdefault(r.user_id, []).append((str(r.s), str(r.e)))
    assert len(per_user[1]) == 2
    assert len(per_user[2]) == 1
    assert ("2024-01-01 00:00:00", "2024-01-01 00:29:00") in per_user[1]
    assert ("2024-01-01 01:00:00", "2024-01-01 01:00:00") in per_user[1]


def test_bellman_ford_prefers_cheaper_multihop(spark):
    e = spark.createDataFrame(
        [(0, 1, 10), (1, 2, 10), (0, 2, 25), (2, 3, 5), (0, 9, 100)],
        "src: bigint, dst: bigint, w: bigint",
    )
    d = {r.v: r.dist for r in graph.bellman_ford(e, 0, rounds=3).collect()}
    assert d == {0: 0, 1: 10, 2: 20, 3: 25, 9: 100}


def test_bellman_ford_hop_cap_is_semantic(spark):
    # with rounds=1 only direct edges resolve; the cheaper 2-hop path
    # to 2 is invisible until round 2
    e = spark.createDataFrame(
        [(0, 1, 10), (1, 2, 10), (0, 2, 25)],
        "src: bigint, dst: bigint, w: bigint",
    )
    d1 = {r.v: r.dist for r in graph.bellman_ford(e, 0, rounds=1).collect()}
    assert d1 == {0: 0, 1: 10, 2: 25}
    d2 = {r.v: r.dist for r in graph.bellman_ford(e, 0, rounds=2).collect()}
    assert d2[2] == 20


def test_bellman_ford_rejects_bad_rounds(spark):
    e = spark.createDataFrame([(0, 1, 1)], "src: bigint, dst: bigint, w: bigint")
    with pytest.raises(ValueError):
        graph.bellman_ford(e, 0, rounds=0)


def test_mmr_select_diversity_and_exhaustion(spark):
    from legal_data_ingestion_rag_pipeline_spark.operators import rerank

    # two near-identical high-relevance vectors + one diverse
    # mid-relevance vector: plain top-k (and relevance-heavy lambda)
    # takes both twins back-to-back; a diversity-heavy lambda must
    # interleave the diverse vector at rank 2.
    pool = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.999, 0.001]),
            (3, [0.6, 0.6]),
        ],
        "vec_id: bigint, embedding: array<double>",
    )
    relevance_heavy = rerank.mmr_select(pool, [1.0, 0.0], k=3)
    assert [p[1] for p in relevance_heavy] == [1, 2, 3]
    diverse = rerank.mmr_select(pool, [1.0, 0.0], k=3, lam_num=3)
    assert [p[1] for p in diverse] == [1, 3, 2]
    # k beyond pool size exhausts gracefully
    assert len(rerank.mmr_select(pool, [1.0, 0.0], k=10)) == 3


def test_mmr_select_stable_under_repartition(spark):
    from legal_data_ingestion_rag_pipeline_spark.operators import rerank

    rows = [(i, [float((i * 7 + j) % 5) / 5.0 for j in range(4)]) for i in range(20)]
    pool1 = spark.createDataFrame(rows, "vec_id: bigint, embedding: array<double>")
    pool2 = pool1.repartition(7)
    q = [0.3, 0.9, 0.1, 0.5]
    assert rerank.mmr_select(pool1, q, k=5) == rerank.mmr_select(pool2, q, k=5)


def test_conjunctive_search_monotone_and_validates(spark):
    from legal_data_ingestion_rag_pipeline_spark.operators import fts

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "alpha beta"),
            (3, "alpha alpha beta gamma gamma"),
            (4, "delta"),
        ],
        "doc_id: bigint, text: string",
    )
    one = fts.conjunctive_search(docs, "doc_id", "text", ["alpha"]).collect()
    assert {r.doc_id for r in one} == {1, 2, 3}
    three = fts.conjunctive_search(
        docs, "doc_id", "text", ["alpha", "beta", "gamma"]
    ).collect()
    # adding terms only narrows (AND semantics); tf sums over all terms
    assert {r.doc_id: r.total_tf for r in three} == {1: 3, 3: 5}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        fts.conjunctive_search(docs, "doc_id", "text", [])


def test_lpa_density_vs_connectivity(spark):
    # two triangles joined by one bridge: LPA keeps them separate
    # (density classes); connected_components merges them
    e = _edges(
        spark, [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12), (3, 10)]
    )
    lpa = {r.v: r.label for r in graph.label_propagation(e, rounds=3).collect()}
    comms = {}
    for v, l in lpa.items():
        comms.setdefault(l, set()).add(v)
    assert sorted(map(sorted, comms.values())) == [[1, 2, 3], [10, 11, 12]]
    cc = {
        r.vertex: r.label
        for r in graph.connected_components(
            e.withColumnsRenamed({"a": "src", "b": "dst"})
        ).collect()
    }
    assert len(set(cc.values())) == 1


def test_lpa_rejects_bad_rounds(spark):
    with pytest.raises(ValueError):
        graph.label_propagation(_edges(spark, [(1, 2)]), rounds=0)


def test_clamped_balance_walk(spark):
    from legal_data_ingestion_rag_pipeline_spark.operators.recurrence import (
        clamped_running_balance,
    )

    d = spark.createDataFrame(
        [
            # user 1: +100, -300 (clamp to 0), +50 -> 50, 1 clamp
            (1, 1, 100), (1, 2, -300), (1, 3, 50),
            # user 2: -5 (clamp), -5 (clamp) -> 0, 2 clamps
            (2, 1, -5), (2, 2, -5),
        ],
        "user_id: bigint, seq: bigint, delta: bigint",
    )
    out = {
        r.user_id: (r.final_balance, r.n_clamps, r.n_steps)
        for r in clamped_running_balance(
            d, "user_id", ["seq"], "delta"
        ).collect()
    }
    assert out == {1: (50, 1, 3), 2: (0, 2, 2)}
    # a plain running sum would report user 1 at -150: the reflection
    # term (running min of prefix sums) is what restores the clamp


def test_clamped_balance_closed_form_no_python(spark):
    """Round 9 (verdict r8 #2): the clamped balance is the Skorokhod
    closed form — two window functions, a groupBy, and NO Python
    stage in the physical plan."""
    from legal_data_ingestion_rag_pipeline_spark.operators.recurrence import (
        clamped_running_balance,
    )

    d = spark.createDataFrame(
        [(1, 1, 100), (1, 2, -300)], "user_id: bigint, seq: bigint, delta: bigint"
    )
    plan = (
        clamped_running_balance(d, "user_id", ["seq"], "delta")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" in plan
    for py_stage in ("FlatMapGroupsInPandas", "BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert py_stage not in plan, py_stage


def test_clamped_balance_fuzz_vs_walk(spark):
    """The closed form must equal the definitional walk on random
    delta sequences (clamps included)."""
    import random

    from legal_data_ingestion_rag_pipeline_spark.operators.recurrence import (
        clamped_running_balance,
    )

    rng = random.Random(909)
    rows = []
    want = {}
    for key in range(1, 21):
        n = rng.randint(1, 40)
        bal = clamps = 0
        for seq in range(1, n + 1):
            delta = rng.randint(-500, 400)
            rows.append((key, seq, delta))
            nxt = bal + delta
            if nxt < 0:
                clamps += 1
                bal = 0
            else:
                bal = nxt
        want[key] = (bal, clamps, n)
    d = spark.createDataFrame(rows, "user_id: bigint, seq: bigint, delta: bigint")
    got = {
        r.user_id: (r.final_balance, r.n_clamps, r.n_steps)
        for r in clamped_running_balance(d, "user_id", ["seq"], "delta").collect()
    }
    assert got == want


def test_gap_decay_ewma_walk(spark):
    """Hand-computed data-dependent-decay EWMA, plus the k-bounds
    guard."""
    import pytest as _pytest

    from legal_data_ingestion_rag_pipeline_spark.operators.recurrence import (
        gap_decay_ewma,
    )

    # user 1: y1=100; k=1 -> y=(100*1+40)//2=70; k=3 -> (70*7+10)//8=62
    # user 2: single row -> y=7, max_k=2 (k recorded even when unused)
    d = spark.createDataFrame(
        [
            (1, 1, 100, 1),
            (1, 2, 40, 1),
            (1, 3, 10, 3),
            (2, 1, 7, 2),
        ],
        "user_id: bigint, seq: bigint, x: bigint, k: bigint",
    )
    out = {
        r.user_id: (r.final_ewma, r.n_steps, r.max_k)
        for r in gap_decay_ewma(d, "user_id", ["seq"], "x", "k").collect()
    }
    assert out == {1: (62, 3, 3), 2: (7, 1, 2)}

    bad = spark.createDataFrame(
        [(1, 1, 5, 31)], "user_id: bigint, seq: bigint, x: bigint, k: bigint"
    )
    with _pytest.raises(Exception, match="outside"):
        gap_decay_ewma(bad, "user_id", ["seq"], "x", "k").collect()


def test_ivm_join_delta_disjoint_and_complete(spark):
    from legal_data_ingestion_rag_pipeline_spark.operators import ivm

    a_old = spark.createDataFrame([(1, "a1"), (2, "a2")], "k: bigint, av: string")
    a_del = spark.createDataFrame([(2, "a3"), (3, "a4")], "k: bigint, av: string")
    b_old = spark.createDataFrame([(1, "b1"), (3, "b2")], "k: bigint, bv: string")
    b_del = spark.createDataFrame([(2, "b3")], "k: bigint, bv: string")
    full = (
        a_old.unionByName(a_del)
        .join(b_old.unionByName(b_del), "k")
        .collect()
    )
    incr = (
        a_old.join(b_old, "k")
        .unionByName(ivm.join_view_delta(a_old, a_del, b_old, b_del, ["k"]))
        .collect()
    )
    key = lambda r: (r.k, r.av, r.bv)
    assert sorted(map(key, incr)) == sorted(map(key, full))


def test_hll_intersection_inclusion_exclusion_sane(spark):
    """|A n B| estimate from register-max union sketches lands within
    HLL noise of truth on synthetic overlapping sets."""
    from legal_data_ingestion_rag_pipeline_spark.operators import sketches

    def keys(lo, hi):
        return spark.range(lo, hi).select(
            F.concat(F.lit("u"), F.col("id")).alias("k")
        )

    b = 8
    ra = sketches.hll_register(keys(0, 3000), "k", b=b)
    rb = sketches.hll_register(keys(2000, 5000), "k", b=b)
    ru = (
        ra.unionByName(rb)
        .groupBy("bucket")
        .agg(F.max("max_rank").alias("max_rank"))
    )
    ea = sketches.hll_estimate(ra, b=b).collect()[0].est_hll
    eb = sketches.hll_estimate(rb, b=b).collect()[0].est_hll
    eu = sketches.hll_estimate(ru, b=b).collect()[0].est_hll
    inter = ea + eb - eu
    assert 400 <= inter <= 1800, inter  # truth = 1000, raw-HLL noise band


def test_decay_table_monotone_and_horizon():
    """The literal decay table matches floor(0.9^d * 1e6 + 0.5) and is
    strictly decreasing — the guarantee the cross-engine literal
    convention rests on."""
    from legal_data_ingestion_rag_pipeline_spark.plans.driver_queries_analytics import (
        _DECAY_MICRO,
    )

    x = 1.0
    for d, expect in enumerate(_DECAY_MICRO):
        assert expect == int(x * 1_000_000 + 0.5), d
        x *= 0.9
    assert all(
        a > b for a, b in zip(_DECAY_MICRO, _DECAY_MICRO[1:])
    )
    assert len(_DECAY_MICRO) == 41  # 40-day horizon inclusive


def test_finalize_daily_peaks_single_day_and_negatives(spark):
    from pyspark.sql import functions as FF

    per_ts = spark.createDataFrame(
        [("2024-03-01 10:00:00", 3), ("2024-03-01 11:00:00", -1),
         ("2024-03-01 12:00:00", -2)],
        "ts_raw: string, delta: long",
    ).select(FF.to_timestamp("ts_raw").alias("ts"), "delta")
    rows = sweep.finalize_daily_peaks(per_ts).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (str(r.day), r.carry_in, r.peak_concurrent) == ("2024-03-01", 0, 3)


def test_registry_invariants_markov_and_systematic(spark):
    """The invariants the query docs claim, machine-checked: Markov
    marginals equal the per-from transition sums, and the systematic
    sample draws exactly k=97 picks over a monotone cumulative."""
    from collections import defaultdict

    from legal_data_ingestion_rag_pipeline_spark.plans.registry import registry

    reg = registry()
    sf = "/root/testdata/sf0.01"
    mk = reg["markov_event_transitions"].spark(spark, sf).collect()
    per_from = defaultdict(int)
    n_from = {}
    for r in mk:
        per_from[r.from_type] += r.n_transitions
        n_from[r.from_type] = r.n_from
    assert dict(per_from) == n_from
    ss = reg["systematic_weighted_sample"].spark(spark, sf).collect()
    assert sum(r.n_picks for r in ss) == 97
    cums = [r.cum for r in ss]
    assert cums == sorted(cums)


def test_band_and_lpm_partitions_cover_exactly(spark):
    """Half-open bands and longest-match categories both PARTITION
    their domain: per-group counts must sum to the table count."""
    from legal_data_ingestion_rag_pipeline_spark.plans.registry import registry
    from legal_data_ingestion_rag_pipeline_spark.session import load_table

    reg = registry()
    sf = "/root/testdata/sf0.01"
    n_orders = load_table(spark, sf, "orders").count()
    bands = reg["price_band_report"].spark(spark, sf).collect()
    assert sum(r.n_orders for r in bands) == n_orders
    n_docs = load_table(spark, sf, "documents").count()
    lpm = reg["domain_category_lpm"].spark(spark, sf).collect()
    assert sum(r.n_docs for r in lpm) == n_docs


def test_cohort_week_zero_equals_cohort_size(spark):
    """Every user is active in their own first-purchase week, so
    n_active at weeks_since=0 must equal cohort_size — the free
    self-check the query doc promises."""
    from legal_data_ingestion_rag_pipeline_spark.plans.registry import registry

    rows = (
        registry()["cohort_retention_weekly"]
        .spark(spark, "/root/testdata/sf0.01")
        .collect()
    )
    week0 = [r for r in rows if r.weeks_since == 0]
    assert week0 and all(r.n_active == r.cohort_size for r in week0)
    # retention never exceeds the cohort
    assert all(r.n_active <= r.cohort_size for r in rows)


def test_dbscan_exact_refuses_large_corpus(spark):
    """The exact O(n^2) DBSCAN is an AUDIT query: it must refuse to
    run above max_rows rather than melt a cluster."""
    import pytest as _pytest

    from legal_data_ingestion_rag_pipeline_spark.plans.driver_queries_similarity import (
        dbscan_embedding_clusters,
    )

    with _pytest.raises(ValueError, match="max_rows"):
        dbscan_embedding_clusters(spark, "/root/testdata/sf0.001", max_rows=5)


def test_dbscan_srp_edges_subset_of_exact(spark):
    """SRP-bucketed DBSCAN trades recall, never precision: its
    eps-graph must be a SUBSET of the exact form's (same eps, same
    exact cosine verification inside buckets), and both reports'
    member accounting must cover every embedding exactly once."""
    from legal_data_ingestion_rag_pipeline_spark.plans.driver_queries_similarity import (
        dbscan_embedding_clusters,
        dbscan_srp_clusters,
    )

    sf = "/root/testdata/sf0.001"
    exact = dbscan_embedding_clusters(spark, sf).collect()
    srp = dbscan_srp_clusters(spark, sf).collect()

    import duckdb

    n_emb = duckdb.sql(
        f"SELECT count(*) FROM '{sf}/embeddings.parquet'"
    ).fetchone()[0]
    for rows in (exact, srp):
        assert sum(r.n_total for r in rows) == n_emb  # partition of corpus
        for r in rows:
            if r.cluster_id != -1:
                assert r.n_core >= 1  # a cluster needs a core point
                assert r.min_member <= r.max_member
    # recall trade: SRP can only have fewer-or-equal clustered points
    clustered = lambda rows: sum(
        r.n_total for r in rows if r.cluster_id != -1
    )
    assert clustered(srp) <= clustered(exact)


def test_gap_decay_ewma_state_carries_across_arrow_batches(spark):
    """The partition-walk form (round 9) must carry per-key state
    across Arrow batch boundaries: with maxRecordsPerBatch=7, one
    key's 100 ordered rows span many batches and the walk must still
    equal the sequential Python twin."""
    from legal_data_ingestion_rag_pipeline_spark.operators.recurrence import (
        gap_decay_ewma,
    )

    rows = [(1, i, (i * 37) % 500, 1 + (i % 6)) for i in range(100)]
    rows += [(2, i, (i * 11) % 300, 1 + (i % 3)) for i in range(55)]
    df = spark.createDataFrame(
        rows, "user_id bigint, seq bigint, x bigint, k bigint"
    )

    def twin(seq):
        y = mk = None
        for _, x, k in seq:
            if y is None:
                y, mk = x, k
            else:
                y = (y * ((1 << k) - 1) + x) >> k
                mk = max(mk, k)
        return y, mk

    expect = {}
    for uid in (1, 2):
        s = sorted((i, x, k) for u, i, x, k in rows if u == uid)
        y, mk = twin(s)
        expect[uid] = (y, len(s), mk)

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        got = {
            r.user_id: (r.final_ewma, r.n_steps, r.max_k)
            for r in gap_decay_ewma(
                df.coalesce(1), "user_id", ["seq"], "x", "k"
            ).collect()
        }
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", old
        )
    assert got == expect


def test_srp_edge_recall_bounds_and_refusal(spark):
    """The recall calibration query: recall in (0, 1000], SRP edges a
    strict subset at this plane budget, and the exact side's O(n^2)
    refusal guard intact."""
    import pytest as _pytest

    from legal_data_ingestion_rag_pipeline_spark.plans.driver_queries_similarity import (
        dbscan_srp_edge_recall,
    )

    r = dbscan_srp_edge_recall(spark, "/root/testdata/sf0.001").collect()[0]
    assert 0 < r.n_srp_edges <= r.n_exact_edges
    assert 0 < r.recall_milli <= 1000
    with _pytest.raises(ValueError, match="max_rows"):
        dbscan_srp_edge_recall(spark, "/root/testdata/sf0.001", max_rows=5)


def test_ivf_candidates_beat_srp_at_loose_eps(spark):
    """The measured argument for the IVF DBSCAN path: at the loose
    cos >= 0.35 eps, trained-cell multi-probe co-membership must
    recall strictly more eps-edges than the two-table SRP codes, and
    both remain subsets of the exact graph."""
    from legal_data_ingestion_rag_pipeline_spark.plans.driver_queries_similarity import (
        dbscan_ivf_edge_recall,
        dbscan_srp_edge_recall,
    )

    sf = "/root/testdata/sf0.001"
    srp = dbscan_srp_edge_recall(spark, sf).collect()[0]
    ivf = dbscan_ivf_edge_recall(spark, sf).collect()[0]
    assert srp.n_exact_edges == ivf.n_exact_edges
    assert ivf.n_ivf_edges > srp.n_srp_edges
    assert ivf.n_ivf_edges <= ivf.n_exact_edges
    assert ivf.recall_milli > srp.recall_milli
