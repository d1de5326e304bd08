"""Unigram-LM subword tokenizer training (SentencePiece), Spark-first.

The OTHER major subword recipe beside BPE (Kudo 2018; the
T5/ALBERT/XLNet vocab): instead of greedily merging pairs, seed a
large candidate-piece vocabulary, fit piece probabilities by EM over
the corpus likelihood, and tokenize by Viterbi — the segmentation
minimizing the total -log p of its pieces.  Complements operators/
bpe.py exactly the way the reference's ingest pairs its two dedup
strategies: same corpus-scale passes, different algorithm family.

Spark-first shape, 100 TB-safe (the bpe.py discipline):

- the ONLY corpus-scale pass is word_frequencies (reused from
  operators/bpe.py); everything downstream runs over the DISTINCT
  word table weighted by counts;
- seed-candidate counting explodes substrings (len <= MAX_PIECE_LEN)
  of distinct words — vocabulary-scale x O(max_len * word_len), one
  groupBy;
- each EM iteration = one Arrow-batched Viterbi pass over distinct
  words (pandas_udf; the piece-cost table rides in the closure like
  the BPE rank table, ~1 MB per 30k pieces) + one (piece, count)
  aggregation — vocabulary-scale shuffles only;
- the trained model (piece -> count) is collected driver-side like
  the BPE merge list and the classifier Gram — a documented
  vocab-scale (KB..MB) collect, never corpus-scale.

Determinism / cross-engine exactness:

- piece costs are integer MICRO-units: floor(-ln(cnt/total)*1e6+0.5)
  with cnt and total exact ints, ln applied once per piece
  driver-side in Python for BOTH the Spark path and the twin — the
  engines only have to agree on integer COUNTS;
- Viterbi DP is exact integer arithmetic over micro costs; ties
  resolve by preferring the LONGER piece ending at each position
  (split index ascending, strict improvement only) — a total rule
  the pure-Python twin replicates bit-for-bit;
- E-step counts are integers; pieces whose expected count drops to 0
  leave the vocabulary (safe on the training corpus: the pieces that
  covered a word in iteration k survive into k+1 by construction).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from ..functions import portable as PT
from .bpe import SEP, word_frequencies

#: longest candidate piece (chars); single chars are always seeded
MAX_PIECE_LEN = 4
#: multi-char candidates need at least this corpus count to seed
MIN_SEED_COUNT = 2
#: EM refinement rounds after seeding
EM_ITERS = 2


# ---------------------------------------------------------------------------
# shared pure functions (Spark closures AND the sparkless twin)
# ---------------------------------------------------------------------------

def costs_from_counts(counts: dict[str, int]) -> dict[str, int]:
    """piece -> integer micro-cost floor(-ln(cnt/total)*1e6 + 0.5).
    cnt/total is a ratio of exact ints; ln is applied ONCE per piece,
    here, driver-side — both engines consume the same table."""
    total = sum(counts.values())
    return {
        p: int(math.floor(-math.log(c / total) * 1_000_000.0 + 0.5))
        for p, c in counts.items()
    }


def viterbi_segment(
    word: str, costs: dict[str, int], max_len: int = MAX_PIECE_LEN
) -> list[str] | None:
    """Minimum-total-cost segmentation of ``word`` into vocabulary
    pieces; None if unsegmentable (a char absent from the vocab).

    Exact integer DP.  Tie rule: for each end position, candidate
    split points run ASCENDING (longest piece first) and only a
    STRICTLY better cost replaces the incumbent — so equal-cost
    segmentations resolve to the longest-piece-first one, totally."""
    n = len(word)
    inf = None
    dp: list[int | None] = [inf] * (n + 1)
    back: list[int] = [0] * (n + 1)
    dp[0] = 0
    for i in range(1, n + 1):
        best: int | None = None
        bj = -1
        for j in range(max(0, i - max_len), i):
            if dp[j] is None:
                continue
            c = costs.get(word[j:i])
            if c is None:
                continue
            cand = dp[j] + c
            if best is None or cand < best:
                best, bj = cand, j
        dp[i], back[i] = best, bj
    if dp[n] is None:
        return None
    out: list[str] = []
    i = n
    while i > 0:
        j = back[i]
        out.append(word[j:i])
        i = j
    out.reverse()
    return out


def seed_counts_py(
    word_counts: dict[str, int],
    max_len: int = MAX_PIECE_LEN,
    min_count: int = MIN_SEED_COUNT,
) -> dict[str, int]:
    """Candidate-piece counts: every substring of length <= max_len,
    weighted by word frequency; multi-char pieces below min_count are
    dropped, single chars always kept."""
    counts: dict[str, int] = {}
    for w, c in word_counts.items():
        n = len(w)
        for i in range(n):
            for l in range(1, min(max_len, n - i) + 1):
                p = w[i : i + l]
                counts[p] = counts.get(p, 0) + c
    return {
        p: c
        for p, c in counts.items()
        if len(p) == 1 or c >= min_count
    }


def em_step_py(
    word_counts: dict[str, int],
    costs: dict[str, int],
    max_len: int = MAX_PIECE_LEN,
) -> dict[str, int]:
    """One hard-EM round: Viterbi-segment every distinct word under
    the current costs, accumulate piece counts x word frequency."""
    out: dict[str, int] = {}
    for w, c in word_counts.items():
        seg = viterbi_segment(w, costs, max_len)
        if seg is None:
            continue
        for p in seg:
            out[p] = out.get(p, 0) + c
    return out


def prune_vocab(
    counts: dict[str, int], vocab_target: int
) -> dict[str, int]:
    """SentencePiece's prune step, deterministic form: keep every
    single-char piece (segmentability floor) plus the top multi-char
    pieces by (count DESC, piece ASC) until the vocabulary holds
    ``vocab_target`` pieces.  A pure function of the count table —
    both engines' twins prune identically."""
    singles = {p: c for p, c in counts.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in counts.items() if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )
    keep = dict(singles)
    for p, c in multi[: max(0, vocab_target - len(singles))]:
        keep[p] = c
    return keep


def train_unigram_py(
    word_counts: dict[str, int],
    max_len: int = MAX_PIECE_LEN,
    min_count: int = MIN_SEED_COUNT,
    em_iters: int = EM_ITERS,
    vocab_target: int | None = None,
) -> dict[str, int]:
    """Sparkless twin of train_unigram: final piece counts."""
    counts = seed_counts_py(word_counts, max_len, min_count)
    for _ in range(em_iters):
        counts = em_step_py(word_counts, costs_from_counts(counts), max_len)
    if vocab_target is not None:
        counts = prune_vocab(counts, vocab_target)
        counts = em_step_py(word_counts, costs_from_counts(counts), max_len)
    return counts


# ---------------------------------------------------------------------------
# Spark path
# ---------------------------------------------------------------------------

def _substrings_expr(word_col: str, max_len: int) -> str:
    """All substrings of length 1..max_len as one codegen expression
    (flattened position x length grid)."""
    return (
        f"flatten(transform(sequence(1, length({word_col})), i -> "
        f"transform(sequence(1, least({max_len},"
        f" length({word_col}) - i + 1)), l -> "
        f"substring({word_col}, i, l))))"
    )


def _segment_udf(costs: dict[str, int], max_len: int):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def _seg(s):
        import pandas as pd

        cache: dict[str, list[str] | None] = {}
        out = []
        for w in s:
            if w is None:
                out.append(None)
                continue
            got = cache.get(w, 0)
            if got == 0:
                got = viterbi_segment(w, costs, max_len)
                cache[w] = got
            out.append(got)
        return pd.Series(out)

    return _seg


def train_unigram(
    docs: DataFrame,
    text_col: str = "text",
    max_len: int = MAX_PIECE_LEN,
    min_count: int = MIN_SEED_COUNT,
    em_iters: int = EM_ITERS,
    vocab_target: int | None = None,
) -> dict[str, int]:
    """Distributed unigram-LM training: returns final piece -> count.

    Corpus touched once (word_frequencies); seeding and every EM
    round are vocabulary-scale Spark aggregations; the (piece, count)
    model collects driver-side per round (the BPE merge-table / Gram
    convention, documented KB..MB scale).  ``vocab_target`` enables
    the SentencePiece prune round: cut the vocabulary to the target
    (singles always survive) and run one more distributed E-step so
    the surviving pieces re-absorb the pruned ones' mass."""
    words = word_frequencies(docs, text_col).persist()

    def _estep(counts: dict[str, int]) -> dict[str, int]:
        seg = _segment_udf(costs_from_counts(counts), max_len)
        estep = (
            words.select(seg(F.col("word")).alias("_pieces"), "cnt")
            .select(F.explode("_pieces").alias("piece"), "cnt")
            .groupBy("piece")
            .agg(F.sum("cnt").cast("bigint").alias("c"))
        )
        return {r["piece"]: int(r["c"]) for r in estep.collect()}

    try:
        seed = (
            words.select(
                F.explode(
                    F.expr(_substrings_expr("word", max_len))
                ).alias("piece"),
                "cnt",
            )
            .groupBy("piece")
            .agg(F.sum("cnt").cast("bigint").alias("c"))
            .filter(
                (F.length("piece") == 1) | (F.col("c") >= F.lit(min_count))
            )
        )
        counts = {r["piece"]: int(r["c"]) for r in seed.collect()}
        for _ in range(em_iters):
            counts = _estep(counts)
        if vocab_target is not None:
            counts = prune_vocab(counts, vocab_target)
            counts = _estep(counts)
        return counts
    finally:
        words.unpersist()


def encode_stats(
    docs: DataFrame,
    counts: dict[str, int],
    text_col: str = "text",
    id_col: str = "doc_id",
    max_len: int = MAX_PIECE_LEN,
) -> DataFrame:
    """Per-document tokenization stats under the trained model:
    (id, n_words, n_pieces, sum_cost_micro) — the fertility /
    compression numbers a tokenizer evaluation reports.  One Arrow
    Viterbi pass over exploded words + one per-doc aggregation;
    documents with no tokenizable words survive with zeros."""
    costs = costs_from_counts(counts)
    # ONE Arrow UDF returning (n_pieces, cost) per word: the model
    # rides in the closure, so the plan size is constant in the
    # vocabulary size (the BPE FOLD_MAX_MERGES lesson — a create_map
    # over thousands of literal pieces would cliff Catalyst)
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<np: bigint, c: bigint>")
    def _enc(s):
        import pandas as pd

        cache: dict[str, tuple[int, int]] = {}
        nps, cs = [], []
        for w in s:
            if w is None:
                nps.append(0)
                cs.append(0)
                continue
            got = cache.get(w)
            if got is None:
                seg = viterbi_segment(w, costs, max_len)
                got = (
                    (0, 0)
                    if seg is None
                    else (len(seg), sum(costs[p] for p in seg))
                )
                cache[w] = got
            nps.append(got[0])
            cs.append(got[1])
        return pd.DataFrame({"np": nps, "c": cs})

    words = docs.select(
        id_col,
        F.explode_outer(F.expr(PT.tokens(text_col, PT.SPARK))).alias("word"),
    ).filter(F.col("word").isNull() | ~F.col("word").contains(SEP))
    per_word = words.withColumn("_e", _enc(F.col("word"))).select(
        id_col,
        F.when(F.col("word").isNotNull(), 1).otherwise(0).alias("_nw"),
        F.col("_e.np").alias("_np"),
        F.col("_e.c").alias("_c"),
    )
    return per_word.groupBy(id_col).agg(
        F.sum("_nw").cast("bigint").alias("n_words"),
        F.sum("_np").cast("bigint").alias("n_pieces"),
        F.sum("_c").cast("bigint").alias("sum_cost_micro"),
    )


# ---------------------------------------------------------------------------
# sparkless twin over a documents parquet (oracle rendering)
# ---------------------------------------------------------------------------

def word_counts_from_parquet(path: str) -> dict[str, int]:
    import re

    import pyarrow.parquet as pq_

    counts: dict[str, int] = {}
    for batch in pq_.ParquetFile(path).iter_batches(columns=["text"]):
        for text in batch.column("text").to_pylist():
            if not text:
                continue
            for w in re.split(PT.PY_WS, text.lower()):
                if w and SEP not in w:  # mirror word_frequencies
                    counts[w] = counts.get(w, 0) + 1
    return counts


def encode_stats_from_parquet(
    path: str, counts: dict[str, int], max_len: int = MAX_PIECE_LEN
) -> dict[int, tuple[int, int, int]]:
    """doc_id -> (n_words, n_pieces, sum_cost_micro), bit-equal to
    encode_stats over the same parquet."""
    import re

    import pyarrow.parquet as pq_

    costs = costs_from_counts(counts)
    cache: dict[str, tuple[int, int]] = {}

    def enc(w: str) -> tuple[int, int]:
        got = cache.get(w)
        if got is None:
            seg = viterbi_segment(w, costs, max_len)
            got = (
                (0, 0)
                if seg is None
                else (len(seg), sum(costs[p] for p in seg))
            )
            cache[w] = got
        return got

    stats: dict[int, tuple[int, int, int]] = {}
    for batch in pq_.ParquetFile(path).iter_batches(
        columns=["doc_id", "text"]
    ):
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("text").to_pylist(),
        ):
            nw = np = sc = 0
            if text:
                for w in re.split(PT.PY_WS, text.lower()):
                    if w and SEP not in w:
                        nw += 1
                        p, c = enc(w)
                        np += p
                        sc += c
            cur = stats.get(doc_id, (0, 0, 0))
            stats[doc_id] = (cur[0] + nw, cur[1] + np, cur[2] + sc)
    return stats
