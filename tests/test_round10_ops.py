"""Round-10 operator pins: WordPiece, Fellegi-Sunter linkage,
seasonal residual anomalies, Adamic-Adar, ECE."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from legal_data_ingestion_rag_pipeline_spark.operators import wordpiece as wp


# ---------------------------------------------------------------------------
# WordPiece pure functions
# ---------------------------------------------------------------------------

def test_wordpiece_greedy_matches_hf_semantics():
    """Greedy longest-match-first with ## continuations, [UNK] on any
    unmatchable position — the HF WordPiece contract on its own
    doc example."""
    vocab = {v: 1 for v in [
        "un", "##aff", "##able", "##ffa", "##ble", "u", "n", "##a",
        "##f", "##b", "##l", "##e",
    ]}
    assert wp.greedy_encode("unaffable", vocab) == [
        "un", "##aff", "##able"
    ]
    # greedy takes the LONGEST start unit even when that forces
    # single-char continuations afterwards
    vocab2 = {v: 1 for v in ["una", "un", "##affable", "##f", "##a",
                             "##b", "##l", "##e"]}
    assert wp.greedy_encode("unaffable", vocab2) == [
        "una", "##f", "##f", "##a", "##b", "##l", "##e"
    ]
    # a char with no continuation unit -> whole word UNK
    assert wp.greedy_encode("unq", {"un": 1, "u": 1, "n": 1}) is None
    # start-position chars matter too
    assert wp.greedy_encode("qun", {"##u": 1, "##n": 1}) is None


def test_wordpiece_seed_counts_position_aware():
    counts = wp.seed_unit_counts_py({"aa": 3}, max_len=2)
    # position 0: "a" (x3), "aa" (x3); position 1: "##a" (x3)
    assert counts == {"a": 3, "aa": 3, "##a": 3}


def test_wordpiece_vocab_selection_total_order():
    units = {"a": 1, "##a": 1, "ab": 5, "##ab": 5, "abc": 5, "zz": 9}
    got = wp.select_vocab(units, vocab_target=4)
    # singles always kept; budget 4 - 2 = 2 multis by (count DESC,
    # unit ASC): zz(9), then ties at 5 -> "##ab" < "ab" < "abc"
    assert set(got) == {"a", "##a", "zz", "##ab"}


def test_wordpiece_spark_matches_twin(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq_

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cats sat"),
        (3, "concatenation of the catapult"),
        (4, None),
        (5, ""),
        # EVERY token contains SEP (\x1f): the word filter removes all
        # its rows, so only the ids-frame left-join keeps it alive —
        # the round-10 advice regression (Spark dropped it; twin kept
        # it as zeros)
        (6, "a\x1fb \x1fc"),
    ]
    path = str(tmp_path / "docs.parquet")
    pq_.write_table(
        pa.table(
            {
                "doc_id": [r[0] for r in rows],
                "text": [r[1] for r in rows],
            }
        ),
        path,
    )
    docs = spark.read.parquet(path)
    vocab_spark = wp.train_wordpiece(docs, vocab_target=32)
    vocab_py = wp.train_wordpiece_py(
        wp.word_counts_from_parquet(path), vocab_target=32
    )
    assert vocab_spark == vocab_py
    got = {
        r.doc_id: (r.n_words, r.n_pieces, r.n_unk_words, r.n_continuations)
        for r in wp.encode_stats(docs, vocab_spark).collect()
    }
    want = wp.encode_stats_from_parquet(path, vocab_py)
    assert got == want
    assert got[4] == (0, 0, 0, 0) and got[5] == (0, 0, 0, 0)
    assert got[6] == (0, 0, 0, 0)


# ---------------------------------------------------------------------------
# Fellegi-Sunter linkage
# ---------------------------------------------------------------------------

def test_record_linkage_scores_and_block_cap(spark, monkeypatch, tmp_path):
    from legal_data_ingestion_rag_pipeline_spark.plans import (
        driver_queries_similarity as DQS,
    )

    # two docs agreeing on everything must outrank two agreeing on
    # nothing but the block key; the max score = sum of agree weights
    import pyarrow as pa
    import pyarrow.parquet as pq_

    texts = [
        (1, "alpha beta gamma delta", "en", "src_a", 22),
        (2, "alpha beta gamma delta", "en", "src_a", 22),
        (3, "alpha zzz yyy xxx www vvv uuu", "en", "src_b", 80),
    ]
    pq_.write_table(
        pa.table(
            {
                "doc_id": [t[0] for t in texts],
                "text": [t[1] for t in texts],
                "lang": [t[2] for t in texts],
                "source": [t[3] for t in texts],
                "n_chars": [t[4] for t in texts],
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    out = DQS.record_linkage_fellegi_sunter(spark, str(tmp_path)).collect()
    by_pair = {(r.id_a, r.id_b): r for r in out}
    full = by_pair[(1, 2)]
    assert (
        full.agree_source,
        full.agree_len,
        full.agree_t2,
        full.agree_last,
    ) == (1, 1, 1, 1)
    assert full.score_micro == sum(w[0] for w in DQS._RL_W.values())
    assert by_pair[(1, 3)].score_micro < full.score_micro
    assert out[0].score_micro == max(r.score_micro for r in out)


# ---------------------------------------------------------------------------
# seasonal residual anomalies / ECE / FD audit / Adamic-Adar
# ---------------------------------------------------------------------------

def test_seasonal_anomaly_flags_break_not_cycle(spark, tmp_path):
    """A type that is ALWAYS busy on Mondays must not alarm on
    Mondays; a one-off spike must."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq_

    rows = []
    eid = 0
    base = dt.datetime(2024, 1, 1)  # a Monday
    for week in range(6):
        for dow in range(7):
            day = base + dt.timedelta(days=week * 7 + dow)
            n = 20 if dow == 0 else 5  # Mondays always busy
            if week == 3 and dow == 2:
                n = 50  # the genuine anomaly (a Wednesday)
            for _ in range(n):
                rows.append((eid, day, 1, "click", 1.0, None))
                eid += 1
    pq_.write_table(
        pa.table(
            {
                "event_id": [r[0] for r in rows],
                "ts": pa.array([r[1] for r in rows],
                               type=pa.timestamp("us")),
                "user_id": [r[2] for r in rows],
                "event_type": [r[3] for r in rows],
                "value": [r[4] for r in rows],
                "props": [r[5] for r in rows],
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    from legal_data_ingestion_rag_pipeline_spark.plans import (
        driver_queries_stats as DQSTATS,
    )

    got = DQSTATS.seasonal_residual_anomalies(spark, str(tmp_path)).collect()
    flagged_days = {str(r.day) for r in got}
    assert "2024-01-24" in flagged_days  # the spiked Wednesday
    # no Monday is flagged: the cycle was absorbed by its baseline
    import datetime as dt2

    for r in got:
        d = r.day
        assert d.weekday() != 0


def test_ece_zero_when_perfectly_calibrated(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq_

    # train and eval halves identical by construction -> per-bin
    # predicted rate equals realized rate -> every gap 0, ECE 0
    rows = []
    # fbin = (k//2) % 4 puts an even AND an odd key in every bin;
    # phase = (k//8) % 4 cycles uniformly over 48 blocks, so the
    # urgent rate is EXACTLY fbin/4 in both the train (even) and
    # eval (odd) halves
    for k in range(384):
        fbin = (k // 2) % 4
        urgent = (k // 8) % 4 < fbin
        rows.append(
            (
                k,
                float(fbin * 50000 + 10),
                "1-URGENT" if urgent else "3-MEDIUM",
            )
        )
    pq_.write_table(
        pa.table(
            {
                "o_orderkey": [r[0] for r in rows],
                "o_totalprice": [r[1] for r in rows],
                "o_orderpriority": [r[2] for r in rows],
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    from legal_data_ingestion_rag_pipeline_spark.plans import (
        driver_queries_eval as DQE,
    )

    out = DQE.expected_calibration_error(spark, str(tmp_path)).collect()
    assert out, "no buckets"
    for r in out:
        assert r.gap_milli == 0
        assert r.ece_milli == 0
        assert r.avg_pred_milli == r.actual_milli


def test_adamic_adar_small_basket_outweighs_large(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq_

    # pair (1,2) shares one 2-item basket; pair (3,4) shares one
    # 5-item basket -> AA(1,2) = 1e6/ln2 > AA(3,4) = 1e6/ln5
    rows = [(100, 1), (100, 2),
            (200, 3), (200, 4), (200, 5), (200, 6), (200, 7)]
    pq_.write_table(
        pa.table({"l_orderkey": [r[0] for r in rows],
                  "l_partkey": [r[1] for r in rows]}),
        f"{tmp_path}/lineitem.parquet",
    )
    from legal_data_ingestion_rag_pipeline_spark.plans import (
        driver_queries_scale as DQSC,
    )

    got = {(r.pa, r.pb): r.aa_micro
           for r in DQSC.adamic_adar_linkpred(spark, str(tmp_path)).collect()}
    import math

    assert got[(1, 2)] == int(math.floor(1_000_000.0 / math.log(2.0) + 0.5))
    assert got[(3, 4)] == int(math.floor(1_000_000.0 / math.log(5.0) + 0.5))
    assert got[(1, 2)] > got[(3, 4)]


# ---------------------------------------------------------------------------
# PCA (operators/pca.py)
# ---------------------------------------------------------------------------

def test_pca_gram_exact_matches_twin_and_finds_planted_axis(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq_

    from legal_data_ingestion_rag_pipeline_spark.operators import pca

    # planted dominant axis: variance along e0 >> e1 >> rest
    vecs = []
    for k in range(40):
        a = 1.0 if k % 2 == 0 else -1.0
        b = 0.3 if k % 4 < 2 else -0.3
        vecs.append([a, b, 0.01 * (k % 3), 0.0])
    path = str(tmp_path / "embeddings.parquet")
    pq_.write_table(
        pa.table(
            {
                "vec_id": list(range(40)),
                "embedding": pa.array(vecs, type=pa.list_(pa.float64())),
            }
        ),
        path,
    )
    e = spark.read.parquet(path)
    g_spark = pca.gram_exact(e)
    g_py = pca.gram_from_parquet(path)
    assert g_spark == g_py

    comps, shares = pca.power_components(g_py, n_components=2)
    # PC1 ~ e0 (sign-fixed positive), PC2 ~ e1
    assert abs(comps[0][0]) > 990_000 and abs(comps[0][1]) < 120_000
    assert comps[0][0] > 0  # sign convention
    assert abs(comps[1][1]) > 990_000
    assert shares[0] > shares[1] > 0

    got = {r.vec_id: (r.pc1_micro, r.pc2_micro)
           for r in pca.project(e, comps).collect()}
    # even ids project positive on PC1, odd negative (planted signs)
    assert all(v[0] > 900_000 for k, v in got.items() if k % 2 == 0)
    assert all(v[0] < -900_000 for k, v in got.items() if k % 2 == 1)


def test_pca_gram_exact_rejects_ragged_column(spark):
    from legal_data_ingestion_rag_pipeline_spark.operators import pca

    ragged = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0]), (2, [1.0, 2.0])],
        "vec_id: bigint, embedding: array<double>",
    )
    with pytest.raises(ValueError, match="ragged"):
        pca.gram_exact(ragged)
    # explicit dim that disagrees with the data also fails loudly
    ok = spark.createDataFrame(
        [(1, [1.0, 2.0])], "vec_id: bigint, embedding: array<double>"
    )
    with pytest.raises(ValueError, match="dim"):
        pca.gram_exact(ok, dim=3)


# ---------------------------------------------------------------------------
# logistic GD two steps
# ---------------------------------------------------------------------------

def test_logistic_gd_separable_data_learns_sign(spark, tmp_path):
    """On linearly separable data the two-step trainer must move the
    price weight positive (urgent iff expensive) and beat the
    all-negative baseline accuracy by step 2."""
    import pyarrow as pa
    import pyarrow.parquet as pq_

    rows = []
    for k in range(200):
        expensive = k % 2 == 0
        rows.append(
            (
                k,
                float(250_000 if expensive else 10_000),
                "1-URGENT" if expensive else "3-MEDIUM",
                "1995-06-15",
            )
        )
    pq_.write_table(
        pa.table(
            {
                "o_orderkey": [r[0] for r in rows],
                "o_totalprice": [r[1] for r in rows],
                "o_orderpriority": [r[2] for r in rows],
                "o_orderdate": [r[3] for r in rows],
            }
        ),
        f"{tmp_path}/orders.parquet",
    )
    from legal_data_ingestion_rag_pipeline_spark.plans import (
        driver_queries_ml as DQML,
    )

    out = {r.step: r for r in DQML.logistic_gd_two_steps(
        spark, str(tmp_path)).collect()}
    assert out[1].w1_ > 0  # price weight learns the planted sign
    assert out[2].acc_milli >= out[1].acc_milli
    assert out[2].acc_milli == 1000  # separable -> perfect by step 2


def test_tokenizer_bakeoff_shared_word_count(spark):
    """All three tokenizers see the same corpus tokenization, so
    n_words must be identical across rows and fertility >= 1000
    (a word is at least one piece)."""
    from legal_data_ingestion_rag_pipeline_spark.plans import (
        driver_queries_pretrain as DQP,
    )

    out = DQP.tokenizer_bakeoff(spark, "/root/testdata/sf0.001").collect()
    assert [r.tokenizer for r in out] == ["bpe", "unigram", "wordpiece"]
    assert len({r.n_words for r in out}) == 1
    for r in out:
        assert r.fertility_milli >= 1000
        assert r.n_pieces >= r.n_words


def test_late_interaction_maxsim_exact_term_doc_wins(spark, tmp_path):
    """A doc containing all three query terms must outrank a doc with
    none; per-doc score equals the Python-twin MaxSim."""
    import pyarrow as pa
    import pyarrow.parquet as pq_

    from legal_data_ingestion_rag_pipeline_spark.plans import (
        driver_queries_similarity as DQS,
    )

    docs = [
        (1, "vector merge window"),
        (2, "apple banana cherry"),
        (3, "vector only here"),
    ]
    pq_.write_table(
        pa.table(
            {
                "doc_id": [d[0] for d in docs],
                "text": [d[1] for d in docs],
            }
        ),
        f"{tmp_path}/documents.parquet",
    )
    out = {r.doc_id: r.maxsim_score
           for r in DQS.late_interaction_maxsim(spark, str(tmp_path)).collect()}

    def twin(text):
        qs = [DQS._li_tok_vec_py(q) for q in DQS._LI_QUERY]
        tvs = [DQS._li_tok_vec_py(t) for t in text.split()]
        return sum(
            max(sum(a * b for a, b in zip(q, t)) for t in tvs) for q in qs
        )

    for did, text in docs:
        assert out[did] == twin(text)
    assert out[1] > out[2]
    assert out[1] >= out[3]


def test_sorted_neighborhood_pairs_cross_boundary(spark, tmp_path):
    """SN's hallmark: the window slides ACROSS sort-key boundaries —
    with 2 docs per lang and window 3, cross-lang pairs MUST appear;
    pair counts per distance follow n - d for the n=4 sorted list."""
    import pyarrow as pa
    import pyarrow.parquet as pq_

    docs = [
        (1, "alpha one", "de", "s1", 9),
        (2, "beta two", "de", "s1", 8),
        (3, "gamma three", "en", "s2", 11),
        (4, "delta four", "en", "s2", 10),
    ]
    pq_.write_table(
        pa.table(
            {
                "doc_id": [d[0] for d in docs],
                "text": [d[1] for d in docs],
                "lang": [d[2] for d in docs],
                "source": [d[3] for d in docs],
                "n_chars": [d[4] for d in docs],
            }
        ),
        f"{tmp_path}/documents.parquet",
    )
    from legal_data_ingestion_rag_pipeline_spark.plans import (
        driver_queries_similarity as DQS,
    )

    got = {r.window_dist: r
           for r in DQS.sorted_neighborhood_pairs(spark, str(tmp_path)).collect()}
    # 4 ranked rows -> 3 pairs at d=1, 2 at d=2, 1 at d=3
    assert [got[d].n_pairs for d in (1, 2, 3)] == [3, 2, 1]
    # at d=1 exactly one pair crosses the lang boundary (de->en)
    assert got[1].n_same_lang == 2
    # the d=3 pair spans first-to-last: different lang and source
    assert got[3].n_same_lang == 0 and got[3].n_same_source == 0


def test_mink_prob_duplicated_doc_scores_lower(spark, tmp_path):
    """A document duplicated many times in the corpus (the 'member')
    must have a LOWER min-k tail average than a one-off document of
    the same length — the Min-K% Prob separation."""
    import pyarrow as pa
    import pyarrow.parquet as pq_

    dup = "the quick brown fox jumps over the lazy dog"
    rare = "zyx wvu tsr qpo nml kji hgf edc baz"
    texts = [dup] * 10 + [rare]
    pq_.write_table(
        pa.table(
            {
                "doc_id": list(range(len(texts))),
                "text": texts,
            }
        ),
        f"{tmp_path}/documents.parquet",
    )
    from legal_data_ingestion_rag_pipeline_spark.plans import (
        driver_queries_pretrain as DQP,
    )

    out = {r.doc_id: r
           for r in DQP.mink_prob_contamination(spark, str(tmp_path)).collect()}
    rare_id = len(texts) - 1
    assert out[0].mink_avg_nlp_micro < out[rare_id].mink_avg_nlp_micro
    # k = max(1, n*20 DIV 100); the dup doc has 8 bigrams -> k = 1
    assert out[0].n_bigrams == 8 and out[0].k_count == 1


def test_jaro_winkler_milli_classic_examples():
    """The census-literature examples under the milli-exact integer
    spec (floats give 0.961 / 0.813; the double-floor integer form
    lands within one milli below)."""
    from legal_data_ingestion_rag_pipeline_spark.plans.driver_queries_similarity import (
        jaro_winkler_milli,
    )

    assert jaro_winkler_milli("martha", "marhta") == 960
    assert jaro_winkler_milli("dixon", "dicksonx") == 812
    assert jaro_winkler_milli("same", "same") == 1000
    assert jaro_winkler_milli("abc", "xyz") == 0
    assert jaro_winkler_milli("", "abc") == 0
    # symmetry
    assert jaro_winkler_milli("dwayne", "duane") == jaro_winkler_milli(
        "duane", "dwayne"
    )


def test_wordpiece_greedy_reconstruction_fuzz():
    """Seeded fuzz: for any vocabulary and word, a non-UNK greedy
    segmentation must RECONSTRUCT the word exactly (pieces with ##
    stripped concatenate back), start with a start-unit, and continue
    with ##-units only."""
    import random

    from legal_data_ingestion_rag_pipeline_spark.operators import wordpiece as wp

    rng = random.Random(20260816)
    alphabet = "abcd"
    for _ in range(300):
        words = [
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 10)))
            for _ in range(rng.randint(1, 8))
        ]
        counts = {w: rng.randint(1, 5) for w in words}
        vocab = wp.train_wordpiece_py(counts, vocab_target=rng.randint(4, 40))
        for w in counts:
            seg = wp.greedy_encode(w, vocab)
            if seg is None:
                continue
            assert not seg[0].startswith(wp.CONT)
            assert all(p.startswith(wp.CONT) for p in seg[1:])
            rebuilt = seg[0] + "".join(p[len(wp.CONT):] for p in seg[1:])
            assert rebuilt == w


def test_jaro_winkler_fuzz_properties():
    """Seeded fuzz: symmetry, range [0, 1000], identity = 1000, and
    monotone-ish sanity (sharing a prefix never scores below the
    same pair with the prefix scrambled is NOT guaranteed by JW, so
    only the hard invariants are pinned)."""
    import random

    from legal_data_ingestion_rag_pipeline_spark.plans.driver_queries_similarity import (
        jaro_winkler_milli,
    )

    rng = random.Random(42)
    alphabet = "abcdef"
    for _ in range(500):
        a = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 12)))
        b = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 12)))
        s = jaro_winkler_milli(a, b)
        assert 0 <= s <= 1000
        assert s == jaro_winkler_milli(b, a)
        assert jaro_winkler_milli(a, a) == 1000


def test_dp_noise_shrinks_with_eps(spark):
    """Geometric-mechanism sanity: across the segment cells, total
    absolute error at eps=1.0 must not exceed the total at eps=0.1
    (noise scale is 1/eps); released = true + noise exactly."""
    from legal_data_ingestion_rag_pipeline_spark.plans import (
        driver_queries_profiling as DQP,
    )

    rows = DQP.dp_noise_calibration(spark, "/root/testdata/sf0.001").collect()
    by_eps = {}
    for r in rows:
        by_eps.setdefault(r.eps_milli, []).append(r)
        assert r.released_n == r.true_n + (r.released_n - r.true_n)
        assert r.abs_err == abs(r.released_n - r.true_n)
    tot = {k: sum(r.abs_err for r in v) for k, v in by_eps.items()}
    assert tot[1000] <= tot[100]


def test_rrf_three_system_consensus_wins(spark, tmp_path):
    """A doc ranked #1 by all three systems must take RRF #1 with
    exactly 3 * floor(1e6/61) micro-points."""
    import pyarrow as pa
    import pyarrow.parquet as pq_

    docs = [
        (1, "vector merge window vector merge window"),
        (2, "vector something else entirely here now"),
        (3, "no relevant terms at all whatsoever ok"),
    ]
    pq_.write_table(
        pa.table({"doc_id": [d[0] for d in docs],
                  "text": [d[1] for d in docs]}),
        f"{tmp_path}/documents.parquet",
    )
    from legal_data_ingestion_rag_pipeline_spark.plans import (
        driver_queries_similarity as DQS,
    )

    out = DQS.rrf_hybrid_search(spark, str(tmp_path)).collect()
    top = out[0]
    assert top.doc_id == 1
    assert top.n_systems == 3
    assert top.rrf_micro == 3 * (1_000_000 // 61)
