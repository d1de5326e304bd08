"""Round-13 family pins: C4 line filter, SimRank, Boruvka MSF,
Mondrian.  Each query is oracle-gated for bit-equality; these tests
pin SEMANTICS through independent paths (constructed graphs with
hand-computed answers, pure-Python twins over the same parquet,
invariant checks the oracle replay could not fake).
"""

from __future__ import annotations

import collections

import duckdb

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


# ---------------------------------------------------------------------------
# c4_heuristic_line_filter
# ---------------------------------------------------------------------------

def test_c4_flags_on_constructed_segments(spark):
    from pyspark.sql import functions as F

    from legal_data_ingestion_rag_pipeline_spark.plans.driver_queries_round13 import (
        _c4_seg_flags_sql,
    )

    rows = [
        ("the big red car", True),     # full width + function word
        ("big red car", False),        # ragged (3 tokens)
        ("big red fast car", False),   # no function word
        ("the the the car", False),    # 3x-repeated token
        ("a a b b", True),             # 2x repeats are fine, has 'a'
        ("", False),
    ]
    df = spark.createDataFrame([(s,) for s, _ in rows], "seg: string")
    got = df.select(
        "seg", F.expr(_c4_seg_flags_sql("split(seg, ' ')", "spark")).alias("kept")
    ).collect()
    assert {r.seg: r.kept for r in got} == dict(rows)


def test_c4_doc_accounting_invariants(spark):
    from legal_data_ingestion_rag_pipeline_spark.plans.driver_queries_round13 import (
        _C4_MIN_KEPT,
        c4_heuristic_line_filter,
    )

    rows = c4_heuristic_line_filter(spark, SF).collect()
    con = duckdb.connect()
    n_docs = con.execute(
        f"SELECT count(*) FROM read_parquet('{SF}/documents.parquet')"
    ).fetchone()[0]
    texts = dict(
        con.execute(
            "SELECT doc_id, coalesce(text, '') FROM "
            f"read_parquet('{SF}/documents.parquet')"
        ).fetchall()
    )
    con.close()
    assert len(rows) == n_docs, "filtering must never delete documents"
    for r in rows:
        assert 0 <= r.n_kept <= r.n_segments
        assert r.keep_doc == (
            r.n_kept >= _C4_MIN_KEPT and 2 * r.n_kept >= r.n_segments
        )
        # clean text is a sub-multiset of the original tokens
        orig = collections.Counter(texts[r.doc_id].split(" "))
        kept = collections.Counter(t for t in r.clean_text.split(" ") if t)
        assert not kept - orig, r.doc_id


# ---------------------------------------------------------------------------
# simrank_copurchase
# ---------------------------------------------------------------------------

def _simrank_twin(sf_dir):
    """Pure-Python exact-integer SimRank twin (same floor-division
    fixed-point arithmetic, independently structured)."""
    con = duckdb.connect()
    po = con.execute(
        "SELECT DISTINCT l_orderkey, l_partkey FROM "
        f"read_parquet('{sf_dir}/lineitem.parquet')"
    ).fetchall()
    con.close()
    parts_of = collections.defaultdict(set)
    orders_of = collections.defaultdict(set)
    for o, p in po:
        parts_of[o].add(p)
        orders_of[p].add(o)

    def s1u(o1, o2):
        if o1 == o2:
            return 10**12
        common = len(parts_of[o1] & parts_of[o2])
        return (8 * common * 10**11) // (len(parts_of[o1]) * len(parts_of[o2]))

    out = {}
    parts = sorted(orders_of)
    for i, a in enumerate(parts):
        for b in parts[i + 1:]:
            if len(orders_of[a] & orders_of[b]) < 2:
                continue
            ssum = sum(
                s1u(o1, o2) for o1 in orders_of[a] for o2 in orders_of[b]
            )
            out[(a, b)] = (8 * ssum) // (
                10 * len(orders_of[a]) * len(orders_of[b])
            )
    return out


def test_simrank_matches_python_twin(spark):
    from legal_data_ingestion_rag_pipeline_spark.plans.driver_queries_round13 import (
        simrank_copurchase,
    )

    rows = simrank_copurchase(spark, SF).collect()
    twin = _simrank_twin(SF)
    assert rows
    # the query returns the top-50 under (s2 desc, a, b); the twin's
    # full map must agree on every returned pair AND on the ordering
    ordered = sorted(twin.items(), key=lambda kv: (-kv[1], kv[0]))[: len(rows)]
    got = [((r.part_a, r.part_b), r.s2_p12) for r in rows]
    assert got == ordered


def test_simrank_bounds(spark):
    from legal_data_ingestion_rag_pipeline_spark.plans.driver_queries_round13 import (
        simrank_copurchase,
    )

    for r in simrank_copurchase(spark, SF).collect():
        # C = 0.8: s2 can reach C only if the order sets coincide
        assert 0 <= r.s2_p12 <= 8 * 10**11
        assert r.part_a < r.part_b


# ---------------------------------------------------------------------------
# mst_copurchase_backbone / graph.boruvka_msf
# ---------------------------------------------------------------------------

def test_boruvka_known_graph(spark):
    from legal_data_ingestion_rag_pipeline_spark.operators.graph import boruvka_msf

    # two components; MST of the square 1-2-3-4 with diagonal drops
    # the heaviest cycle edge (3-4 w=9); 10-11 is its own tree
    edges = [
        (1, 2, 1), (2, 3, 2), (1, 3, 5), (3, 4, 9), (1, 4, 4),
        (10, 11, 7),
    ]
    df = spark.createDataFrame(edges, "lo: bigint, hi: bigint, w: bigint")
    got = sorted(
        (r.lo, r.hi, r.w) for r in boruvka_msf(df).collect()
    )
    assert got == [(1, 2, 1), (1, 4, 4), (2, 3, 2), (10, 11, 7)]


def test_boruvka_tie_break_is_total_order(spark):
    from legal_data_ingestion_rag_pipeline_spark.operators.graph import boruvka_msf

    # all weights equal: the (w, lo, hi) order must pick the
    # lexicographically smallest spanning tree of the triangle
    df = spark.createDataFrame(
        [(1, 2, 5), (2, 3, 5), (1, 3, 5)], "lo: bigint, hi: bigint, w: bigint"
    )
    got = sorted((r.lo, r.hi) for r in boruvka_msf(df).collect())
    assert got == [(1, 2), (1, 3)]


def test_mst_is_spanning_forest(spark):
    from legal_data_ingestion_rag_pipeline_spark.plans.driver_queries_round13 import (
        _MST_SUPPORT2_SQL,
        mst_copurchase_backbone,
    )

    rows = mst_copurchase_backbone(spark, SF).collect()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{SF}/lineitem.parquet')"
    )
    full = con.execute(_MST_SUPPORT2_SQL).fetchall()
    con.close()
    verts = {v for lo, hi, _ in full for v in (lo, hi)}
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    n_comp = len(verts)
    for lo, hi, _ in full:
        ra, rb = find(lo), find(hi)
        if ra != rb:
            parent[ra] = rb
            n_comp -= 1
    # a spanning forest has exactly V - C edges and no cycles
    assert len(rows) == len(verts) - n_comp
    parent.clear()
    for r in rows:
        ra, rb = find(r.part_lo), find(r.part_hi)
        assert ra != rb, "cycle in claimed forest"
        parent[ra] = rb


# ---------------------------------------------------------------------------
# mondrian_k_anonymize
# ---------------------------------------------------------------------------

def test_mondrian_k_guarantee_and_partition(spark):
    from legal_data_ingestion_rag_pipeline_spark.plans.driver_queries_round13 import (
        _MON_K,
        mondrian_k_anonymize,
    )

    rows = mondrian_k_anonymize(spark, SF01).collect()
    con = duckdb.connect()
    total = con.execute(
        f"SELECT count(*) FROM read_parquet('{SF01}/customer.parquet')"
    ).fetchone()[0]
    con.close()
    assert len(rows) > 1, "sf0.01 must actually split"
    assert sum(r.n for r in rows) == total, "boxes must partition the table"
    for r in rows:
        # the k-anonymity guarantee: no released box below k
        assert r.n >= _MON_K
        assert r.bal_min <= r.bal_max and r.ck_min <= r.ck_max


def test_mondrian_fact_table_never_shuffles(spark):
    from legal_data_ingestion_rag_pipeline_spark.plans.driver_queries_round13 import (
        mondrian_k_anonymize,
    )

    plan = (
        mondrian_k_anonymize(spark, SF01)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # medians/counts reduce tiny node tables; the customer rows ride
    # along via broadcast joins — a sort-merge join of the fact table
    # at every level would be the wrong plan at scale
    assert "SortMergeJoin" not in plan, plan


# ---------------------------------------------------------------------------
# mlp_quality_inference
# ---------------------------------------------------------------------------

def test_mlp_matches_numpy_forward_pass(spark):
    import numpy as np

    from legal_data_ingestion_rag_pipeline_spark.plans.driver_queries_round13 import (
        _MLP_B1,
        _MLP_B2,
        _MLP_TOP,
        _MLP_V,
        _MLP_W1,
        mlp_quality_inference,
    )

    rows = mlp_quality_inference(spark, SF01).collect()
    assert len(rows) == _MLP_TOP
    con = duckdb.connect()
    data = con.execute(
        "SELECT vec_id, embedding FROM "
        f"read_parquet('{SF01}/embeddings.parquet')"
    ).fetchall()
    con.close()
    W1 = np.array(_MLP_W1)
    b1 = np.array(_MLP_B1)
    v = np.array(_MLP_V)
    scores = {}
    for vid, emb in data:
        h = np.maximum(0.0, b1 + W1 @ np.array(emb, dtype=np.float64))
        scores[vid] = _MLP_B2 + float(v @ h)
    want = sorted(scores, key=lambda i: (-scores[i], i))[:_MLP_TOP]
    assert [r.vec_id for r in rows] == want
    for r in rows:
        # BLAS reorders sums, so compare at micro tolerance
        assert abs(r.score_micro / 1e6 - scores[r.vec_id]) < 2e-6


def test_mlp_weights_are_exact_binary_fractions():
    from legal_data_ingestion_rag_pipeline_spark.plans.driver_queries_round13 import (
        _MLP_B1,
        _MLP_V,
        _MLP_W1,
    )

    for w in [x for row in _MLP_W1 for x in row] + _MLP_B1 + _MLP_V:
        assert w * 16 == int(w * 16), w  # k/16 exactly representable
        assert -1.0 < w < 1.0


def test_mlp_plan_is_pure_map_plus_topk(spark):
    from legal_data_ingestion_rag_pipeline_spark.plans.driver_queries_round13 import (
        mlp_quality_inference,
    )

    plan = (
        mlp_quality_inference(spark, SF01)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the model must ride the expression pipeline: no Python, no
    # per-doc shuffle — just scan, project, TakeOrdered
    assert "TakeOrderedAndProject" in plan
    assert "EvalPython" not in plan
    assert "Exchange hashpartitioning" not in plan


# ---------------------------------------------------------------------------
# fts_maxscore_pruned_search
# ---------------------------------------------------------------------------

def test_maxscore_equals_exhaustive_on_other_queries(spark):
    """Pruned vs exhaustive on ad-hoc term sets (including one where
    the seed is too small to prune) — result must always be
    identical."""
    from legal_data_ingestion_rag_pipeline_spark.operators import fts
    from legal_data_ingestion_rag_pipeline_spark.session import load_table

    docs = load_table(spark, SF01, "documents")
    for terms, k in ((["dup", "the", "a"], 5), (["vector", "merge"], 7),
                     (["dup"], 30)):
        exact = [
            (r.doc_id, r.n_terms_hit, r.score)
            for r in fts.bm25_topk(docs, "doc_id", "text", terms, k=k).collect()
        ]
        pruned = [
            (r.doc_id, r.n_terms_hit, r.score)
            for r in fts.maxscore_topk(
                docs, "doc_id", "text", terms, k=k
            ).collect()
        ]
        assert pruned == exact, terms


def test_maxscore_actually_prunes_on_gate_query(spark):
    """On the gate query the three common terms must fall
    non-essential: only docs containing 'dup' (df = 25 of 500) may
    enter the final aggregation."""
    from pyspark.sql import functions as F

    from legal_data_ingestion_rag_pipeline_spark.plans.driver_queries_round13 import (
        _WAND_TERMS,
        fts_maxscore_pruned_search,
    )
    from legal_data_ingestion_rag_pipeline_spark.session import load_table

    docs = load_table(spark, SF01, "documents")
    n_match_any = (
        docs.filter(
            " OR ".join(f"text LIKE '%{t}%'" for t in _WAND_TERMS)
        ).count()
    )
    n_dup = docs.filter(F.col("text").like("%dup%")).count()
    assert n_dup < n_match_any * 0.2, "corpus drifted; pruning moot"
    out = fts_maxscore_pruned_search(spark, SF01).collect()
    # every returned doc must contain the essential term
    dup_ids = {
        r.doc_id
        for r in docs.filter(F.col("text").like("%dup%"))
        .select("doc_id")
        .collect()
    }
    assert {r.doc_id for r in out} <= dup_ids


def test_mondrian_fuzz_matches_python_twin(spark):
    """Random customer-shaped frames through the SAME fixed-cycle
    Mondrian SQL vs an independently-written Python twin (explicit
    recursion instead of chained CTEs)."""
    import random

    from legal_data_ingestion_rag_pipeline_spark.plans.driver_queries_round13 import (
        _MON_DIMS,
        _MON_K,
        _mondrian_sql,
    )

    from fixtures import fuzz_trials

    rng = random.Random(20260816)
    for trial in range(fuzz_trials(3, 1)):  # head slice: draws unchanged
        n = rng.choice([180, 450, 900])
        rows = [
            (i + 1, rng.randrange(-99999, 1000000) / 100.0)
            for i in range(n)
        ]
        df = spark.createDataFrame(rows, "c_custkey: bigint, c_acctbal: double")
        df.createOrReplaceTempView("_r13_customer")
        got = sorted(
            tuple(r) for r in spark.sql(
                _mondrian_sql("spark").replace(
                    "FROM customer", "FROM _r13_customer"
                )
            ).collect()
        )

        def median(vals):
            s = sorted(vals)
            m = len(s)
            if m % 2:
                return float(s[m // 2])
            return (s[m // 2 - 1] + s[m // 2]) / 2.0

        nodes = {1: [(round(b * 100), k) for k, b in rows]}
        # twin stores (bal_c, ck) and splits by the cycle dims
        for dim_name in _MON_DIMS:
            idx = 0 if dim_name == "bal_c" else 1
            nxt = {}
            for node, members in nodes.items():
                med = median([m[idx] for m in members])
                left = [m for m in members if m[idx] <= med]
                right = [m for m in members if m[idx] > med]
                if len(left) >= _MON_K and len(right) >= _MON_K:
                    nxt[node * 2] = left
                    nxt[node * 2 + 1] = right
                else:
                    nxt[node] = members
            nodes = nxt
        want = sorted(
            (
                node,
                len(ms),
                min(m[0] for m in ms),
                max(m[0] for m in ms),
                min(m[1] for m in ms),
                max(m[1] for m in ms),
            )
            for node, ms in nodes.items()
        )
        assert got == want, f"trial {trial}"


# ---------------------------------------------------------------------------
# ldp_randomized_response / plsa_topics_em
# ---------------------------------------------------------------------------

def _poly_hash_py(s: str) -> int:
    h = 7
    for ch in s:
        h = (h * 31 + ord(ch)) % 1_000_000_007
    return h


def test_ldp_mechanism_matches_python_twin_and_debiases(spark):
    from legal_data_ingestion_rag_pipeline_spark.plans.driver_queries_round13 import (
        ldp_randomized_response,
    )

    rows = ldp_randomized_response(spark, SF01).collect()
    con = duckdb.connect()
    events = con.execute(
        "SELECT event_id, event_type FROM "
        f"read_parquet('{SF01}/events.parquet')"
    ).fetchall()
    con.close()
    types = sorted({t for _, t in events})
    k = len(types)
    idx = {t: i for i, t in enumerate(types)}
    rep = collections.Counter()
    for eid, et in events:
        h = _poly_hash_py(str(eid))
        if h % 4 < 3:
            rep[idx[et]] += 1
        else:
            j = (h // 4) % (k - 1)
            rep[j if j < idx[et] else j + 1] += 1
    true = collections.Counter(idx[et] for _, et in events)
    n = len(events)
    assert len(rows) == k
    for r in rows:
        i = idx[r.event_type]
        assert r.c_reported == rep[i], r.event_type
        assert r.c_true == true[i]
        est = (4 * (k - 1) * rep[i] - n) / (3 * k - 4)
        assert abs(r.est_count - est) < 2e-6
        # unbiasedness is in expectation, not per draw — pin a loose
        # per-type accuracy envelope instead (counts ~2000, sd ~50)
        assert abs(r.est_count - true[i]) <= 0.1 * true[i] + 50
    # estimator is exactly unbiased in aggregate: sums telescope to n
    assert abs(sum(r.est_count for r in rows) - n) < 1e-3


def _plsa_twin(sf_dir, K=3, U=10**6):
    """Exact-integer pLSA twin: same floor divisions, independently
    structured (dict loops instead of window functions)."""
    con = duckdb.connect()
    rows = con.execute(
        "SELECT doc_id, text FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    con.close()
    counts = collections.Counter()
    for d, text in rows:
        for w in (text or "").split(" "):
            if w:
                counts[(d, w)] += 1
    vocab = sorted({w for _, w in counts})
    raw = {
        (z, w): 1000 + (_poly_hash_py(w) * (z + 1)) % 9973
        for z in range(K)
        for w in vocab
    }
    phi = {}
    for z in range(K):
        tot = sum(raw[(z, w)] for w in vocab)
        for w in vocab:
            phi[(z, w)] = (raw[(z, w)] * U) // tot
    theta0 = U // K
    theta = collections.defaultdict(lambda: theta0)

    for _it in range(2):
        n = {}
        for (d, w), c in counts.items():
            nums = [theta[(d, z)] * phi[(z, w)] for z in range(K)]
            den = sum(nums)
            for z in range(K):
                n[(d, w, z)] = c * ((nums[z] * U) // den)
        phi_new, theta_new = {}, {}
        for z in range(K):
            tot_z = sum(v for (d, w, zz), v in n.items() if zz == z)
            for w in vocab:
                s = sum(
                    v for (d, ww, zz), v in n.items() if ww == w and zz == z
                )
                phi_new[(z, w)] = (s * U) // tot_z
        docs = {d for d, _ in counts}
        for d in docs:
            tot_d = sum(v for (dd, w, z), v in n.items() if dd == d)
            for z in range(K):
                s = sum(
                    v for (dd, w, zz), v in n.items() if dd == d and zz == z
                )
                theta_new[(d, z)] = (s * U) // tot_d
        phi, theta = phi_new, theta_new
    return phi


def test_plsa_matches_python_twin_bit_exact(spark):
    from legal_data_ingestion_rag_pipeline_spark.plans.driver_queries_round13 import (
        plsa_topics_em,
    )

    rows = plsa_topics_em(spark, SF).collect()
    twin = _plsa_twin(SF)
    got = {(r.topic, r.word): r.phi_micro for r in rows}
    assert got == twin


def test_plsa_distributions_are_normalized_and_asymmetric(spark):
    from legal_data_ingestion_rag_pipeline_spark.plans.driver_queries_round13 import (
        _PLSA_K,
        _PLSA_U,
        plsa_topics_em,
    )

    rows = plsa_topics_em(spark, SF01).collect()
    by_topic = collections.defaultdict(dict)
    for r in rows:
        by_topic[r.topic][r.word] = r.phi_micro
        assert r.phi_micro > 0
    assert len(by_topic) == _PLSA_K
    for z, dist in by_topic.items():
        # floor-division leaves at most |vocab| micro-units of slack
        assert _PLSA_U - len(dist) <= sum(dist.values()) <= _PLSA_U
    # the hash seeding must have broken symmetry: topics differ
    t0, t1 = by_topic[0], by_topic[1]
    assert any(t0[w] != t1[w] for w in t0)


# ---------------------------------------------------------------------------
# hyperanf_neighborhood / graph.hyperanf
# ---------------------------------------------------------------------------

_ANF_B = 6


def _anf_reg(v):
    """The shared register algebra: poly hash + mid-square finalizer,
    bucket/rank split — must stay in lock-step with
    sketches.hll_sql_parts."""
    from legal_data_ingestion_rag_pipeline_spark.functions import portable as PT
    from legal_data_ingestion_rag_pipeline_spark.operators.sketches import (
        HLL_HASH_BITS,
    )

    m = 1 << _ANF_B
    shift = (HLL_HASH_BITS - _ANF_B) + 1
    aa, cc = PT._perm_constants(1)[0]
    h0 = 7
    for ch in str(v):
        h0 = (h0 * 31 + ord(ch)) % PT.P
    h = ((h0 * h0 % PT.P) * aa + cc) % PT.P
    w = h // m
    rank = shift if w == 0 else shift - w.bit_length()
    return h % m, rank


def _anf_twin(adj, hops):
    from legal_data_ingestion_rag_pipeline_spark.operators.sketches import (
        HLL_HASH_BITS,
    )

    m = 1 << _ANF_B
    shift = (HLL_HASH_BITS - _ANF_B) + 1
    state = {}
    for v in adj:
        b, r = _anf_reg(v)
        state[v] = {b: r}
    out = {}

    def record(hop):
        for v, regs in state.items():
            s = sum(1 << (shift - mr) for mr in regs.values())
            s += (m - len(regs)) * (1 << shift)
            out[(hop, v)] = s

    record(0)
    for hop in range(1, hops + 1):
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
    return out


_ANF_EDGES = [
    # a 4-path glued to a triangle: diameter 5 (1 -> 6), one isolated pair
    (1, 2), (2, 3), (3, 4), (4, 5),
    (5, 6), (6, 7), (7, 5),
    (100, 101),
]


def test_hyperanf_matches_python_twin_bit_exact(spark):
    from legal_data_ingestion_rag_pipeline_spark.operators.graph import hyperanf

    edges = spark.createDataFrame(_ANF_EDGES, "lo BIGINT, hi BIGINT")
    got = {
        (r.hop, r.v): r.s_scaled
        for r in hyperanf(edges, hops=4, hll_b=_ANF_B).collect()
    }
    adj = collections.defaultdict(set)
    for a, b in _ANF_EDGES:
        adj[a].add(b)
        adj[b].add(a)
    assert got == _anf_twin(adj, 4)


def test_hyperanf_balls_grow_monotone(spark):
    """Registers only ever max-merge upward, so the estimator
    denominator s_scaled is non-increasing in hop for every vertex
    (the ball estimate is non-decreasing)."""
    from legal_data_ingestion_rag_pipeline_spark.operators.graph import hyperanf

    edges = spark.createDataFrame(_ANF_EDGES, "lo BIGINT, hi BIGINT")
    rows = hyperanf(edges, hops=4, hll_b=_ANF_B).collect()
    by_v = collections.defaultdict(dict)
    for r in rows:
        by_v[r.v][r.hop] = r.s_scaled
    for v, hs in by_v.items():
        seq = [hs[h] for h in sorted(hs)]
        assert seq == sorted(seq, reverse=True), (v, seq)


def test_hyperanf_converges_to_component_hll(spark):
    """At hop >= diameter every vertex's sketch must equal the plain
    HLL of its whole component's vertex set — HyperANF IS iterated
    HLL union, so the fixpoint is the component sketch."""
    from legal_data_ingestion_rag_pipeline_spark.operators.graph import hyperanf
    from legal_data_ingestion_rag_pipeline_spark.operators.sketches import (
        HLL_HASH_BITS,
    )

    m = 1 << _ANF_B
    shift = (HLL_HASH_BITS - _ANF_B) + 1
    comps = [{1, 2, 3, 4, 5, 6, 7}, {100, 101}]

    def comp_s(members):
        regs = {}
        for v in members:
            b, r = _anf_reg(v)
            if regs.get(b, -1) < r:
                regs[b] = r
        s = sum(1 << (shift - mr) for mr in regs.values())
        return s + (m - len(regs)) * (1 << shift)

    edges = spark.createDataFrame(_ANF_EDGES, "lo BIGINT, hi BIGINT")
    final = {
        r.v: r.s_scaled
        for r in hyperanf(edges, hops=5, hll_b=_ANF_B)
        .where("hop = 5")
        .collect()
    }
    for members in comps:
        want = comp_s(members)
        for v in members:
            assert final[v] == want, (v, final[v], want)


def test_hyperanf_fuzz_matches_python_twin(spark):
    """Seeded-random graphs (Erdos-Renyi-ish with isolated tails)
    through graph.hyperanf vs the dict-arithmetic twin — every
    (hop, vertex) register sum must agree bit-exactly."""
    import random

    from legal_data_ingestion_rag_pipeline_spark.operators.graph import hyperanf

    rng = random.Random(20260817)
    for trial in range(3):
        n = rng.choice([20, 40, 60])
        pairs = set()
        for _ in range(n * 2):
            a, b = rng.randrange(n), rng.randrange(n)
            if a != b:
                pairs.add((min(a, b), max(a, b)))
        edges_list = sorted(pairs)
        adj = collections.defaultdict(set)
        for a, b in edges_list:
            adj[a].add(b)
            adj[b].add(a)
        df = spark.createDataFrame(edges_list, "lo BIGINT, hi BIGINT")
        got = {
            (r.hop, r.v): r.s_scaled
            for r in hyperanf(df, hops=3, hll_b=_ANF_B).collect()
        }
        assert got == _anf_twin(adj, 3), f"trial {trial} (n={n})"


# ---------------------------------------------------------------------------
# scc_subsequent_parts / graph.scc_coloring
# ---------------------------------------------------------------------------

def _kosaraju(edges):
    adj = collections.defaultdict(set)
    radj = collections.defaultdict(set)
    verts = set()
    for u, v in edges:
        adj[u].add(v)
        radj[v].add(u)
        verts.update((u, v))
    order, seen = [], set()
    for s in sorted(verts):
        if s in seen:
            continue
        stack = [(s, iter(sorted(adj[s])))]
        seen.add(s)
        while stack:
            node, it = stack[-1]
            adv = False
            for nxt in it:
                if nxt not in seen:
                    seen.add(nxt)
                    stack.append((nxt, iter(sorted(adj[nxt]))))
                    adv = True
                    break
            if not adv:
                order.append(node)
                stack.pop()
    comp = {}
    for s in reversed(order):
        if s in comp:
            continue
        comp[s] = s
        st = [s]
        while st:
            x = st.pop()
            for y in radj[x]:
                if y not in comp:
                    comp[y] = s
                    st.append(y)
    groups = collections.defaultdict(list)
    for v, r in comp.items():
        groups[r].append(v)
    out = {}
    for vs in groups.values():
        sid = max(vs)
        for v in vs:
            out[v] = sid
    return out


def test_scc_known_graph(spark):
    """Two cycles joined by a DAG chain, a tail, and a trim-only
    branch: every structural case (nontrivial SCC, chain vertex,
    source, sink) hand-checked."""
    from legal_data_ingestion_rag_pipeline_spark.operators.graph import scc_coloring

    edges = [(1, 2), (2, 3), (3, 1), (10, 11), (11, 10),
             (3, 5), (5, 10), (20, 1), (30, 2)]
    df = spark.createDataFrame(edges, "u BIGINT, v BIGINT")
    want = [(1, 3), (2, 3), (3, 3), (5, 5), (10, 11),
            (11, 11), (20, 20), (30, 30)]
    for lfe in (0, 100_000):  # distributed coloring AND local finish
        got = sorted(
            (r.v, r.scc_id)
            for r in scc_coloring(df, local_finish_edges=lfe).collect()
        )
        assert got == want, f"local_finish_edges={lfe}"


def test_scc_fuzz_matches_kosaraju(spark):
    """Seeded random digraphs (dense enough to force nontrivial SCCs)
    through the coloring operator vs sequential Kosaraju — the
    different-algorithm-same-answer contract."""
    import random

    from legal_data_ingestion_rag_pipeline_spark.operators.graph import scc_coloring

    from fixtures import fuzz_trials

    # density 3n forces nontrivial SCCs; density 1.5n forces deep
    # trim cascades with orphaned chain vertices (the u -> x -> v
    # shape where both neighbors trim away in the same round); the
    # fast default keeps one n=25 trial per density class (each SCC
    # run is a multi-second BSP fixpoint, and the n=40 dense draw
    # alone costs ~20 s), SPARK_GRAFT_FULL_FUZZ=1 runs all five
    trials = ((1, 3), (3, 1.5), (0, 3), (2, 3), (4, 1.5))
    for trial, mult in trials[: fuzz_trials(5, 2)]:
        rng = random.Random(20260817 + trial)  # order-independent draws
        n = rng.choice([15, 25, 40])
        pairs = set()
        for _ in range(int(n * mult)):
            a, b = rng.randrange(n), rng.randrange(n)
            if a != b:
                pairs.add((a, b))
        edges_list = sorted(pairs)
        df = spark.createDataFrame(edges_list, "u BIGINT, v BIGINT")
        got = {
            r.v: r.scc_id
            for r in scc_coloring(df, local_finish_edges=0).collect()
        }
        assert got == _kosaraju(edges_list), f"trial {trial} (n={n})"


def test_scc_pure_dag_is_all_trim(spark):
    """A DAG has only singleton SCCs and must dissolve entirely in
    the trim phase — the coloring flood should never run (asserted
    indirectly: a 2-level DAG labels every vertex as itself)."""
    from legal_data_ingestion_rag_pipeline_spark.operators.graph import scc_coloring

    edges = [(1, 2), (1, 3), (2, 4), (3, 4), (4, 5), (2, 5)]
    df = spark.createDataFrame(edges, "u BIGINT, v BIGINT")
    got = sorted((r.v, r.scc_id) for r in scc_coloring(df).collect())
    assert got == [(v, v) for v in (1, 2, 3, 4, 5)]
