"""WordPiece subword tokenizer, Spark-first — the THIRD major subword
recipe beside BPE (operators/bpe.py) and unigram-LM
(operators/unigram.py), completing the triple a tokenizer bake-off
compares (BERT's vocab family; Wu et al. 2016).

What distinguishes WordPiece from the other two here:

- the vocabulary separates WORD-START units from CONTINUATION units
  (the ``##`` convention): ``un`` at position 0 and ``##un`` inside a
  word are different vocabulary entries with different counts;
- encoding is GREEDY longest-match-first (the HuggingFace WordPiece
  algorithm), not Viterbi: at each position take the longest unit in
  the vocabulary, no backtracking; if NO unit matches at some
  position the WHOLE word maps to [UNK] (the HF contract — partial
  segmentations are discarded, which is what makes the unknown-rate
  a vocabulary-quality signal worth reporting).

Training here is the frequency-ranked variant (count-based seeding,
the deterministic core of the likelihood trainers): every substring
occurrence of every distinct word is counted position-aware (start
vs continuation), weighted by word frequency, and the vocabulary is
all single-position units (segmentability floor for known chars)
plus the top multi-char units by (count DESC, unit ASC) up to
``vocab_target`` — a pure function of the count table, so the
sparkless twin prunes identically.

Spark-first shape, 100 TB-safe (the bpe/unigram discipline):

- the ONLY corpus-scale pass is word_frequencies (shared with BPE);
- seed counting explodes position-tagged substrings of DISTINCT
  words — vocabulary-scale x O(max_len * word_len), one groupBy;
- encoding is one Arrow pandas_udf pass over exploded words with a
  per-batch memo (each distinct word greedy-matched once per batch);
  the vocabulary rides in the closure (constant plan size — the BPE
  FOLD_MAX lesson);
- the trained vocabulary collects driver-side (documented KB..MB
  vocab-scale collect, the merge-table convention).

Determinism: all counts are exact integers; vocabulary selection and
greedy matching are pure functions of the count table with total tie
orders, so the pyarrow twin (for the VALUES oracle) is bit-equal.

No reference-file citation applies: /root/reference stops at
retrieval; this extends the tokenizer family of operators/bpe.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import portable as PT
from .bpe import SEP, word_frequencies

#: longest candidate unit (chars of the raw substring, excluding the
#: ## tag)
MAX_UNIT_LEN = 6
#: vocabulary size target (single-position units always survive)
VOCAB_TARGET = 768
#: continuation-unit tag (display form; counts key on it directly)
CONT = "##"


# ---------------------------------------------------------------------------
# shared pure functions (Spark closures AND the sparkless twin)
# ---------------------------------------------------------------------------

def seed_unit_counts_py(
    word_counts: dict[str, int], max_len: int = MAX_UNIT_LEN
) -> dict[str, int]:
    """Position-aware substring counts: units starting the word count
    as ``s``, units starting inside it as ``##s`` — every occurrence
    position counts once, weighted by word frequency."""
    counts: dict[str, int] = {}
    for w, c in word_counts.items():
        n = len(w)
        for i in range(n):
            for l in range(1, min(max_len, n - i) + 1):
                u = w[i : i + l] if i == 0 else CONT + w[i : i + l]
                counts[u] = counts.get(u, 0) + c
    return counts


def select_vocab(
    unit_counts: dict[str, int], vocab_target: int = VOCAB_TARGET
) -> dict[str, int]:
    """Keep every single-char unit (start AND continuation forms —
    the segmentability floor for known characters) plus the top
    multi-char units by (count DESC, unit ASC) up to vocab_target.
    Pure function of the count table."""
    def raw_len(u: str) -> int:
        return len(u) - len(CONT) if u.startswith(CONT) else len(u)

    singles = {u: c for u, c in unit_counts.items() if raw_len(u) == 1}
    multi = sorted(
        ((u, c) for u, c in unit_counts.items() if raw_len(u) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )
    keep = dict(singles)
    for u, c in multi[: max(0, vocab_target - len(singles))]:
        keep[u] = c
    return keep


def greedy_encode(
    word: str, vocab: dict[str, int], max_len: int = MAX_UNIT_LEN
) -> list[str] | None:
    """HF WordPiece greedy longest-match-first; None = [UNK] (no unit
    matches at some position — the WHOLE word is unknown)."""
    n = len(word)
    out: list[str] = []
    i = 0
    while i < n:
        hit = None
        for l in range(min(max_len, n - i), 0, -1):
            u = word[i : i + l] if i == 0 else CONT + word[i : i + l]
            if u in vocab:
                hit = u
                break
        if hit is None:
            return None
        out.append(hit)
        i += len(hit) - (len(CONT) if hit.startswith(CONT) else 0)
    return out


def train_wordpiece_py(
    word_counts: dict[str, int],
    max_len: int = MAX_UNIT_LEN,
    vocab_target: int = VOCAB_TARGET,
) -> dict[str, int]:
    """Sparkless twin of train_wordpiece: unit -> count vocabulary."""
    return select_vocab(seed_unit_counts_py(word_counts, max_len), vocab_target)


def word_counts_from_parquet(path: str) -> dict[str, int]:
    """pyarrow twin of word_frequencies (same tokenizer + SEP filter)."""
    import re

    import pyarrow.parquet as pq_

    counts: dict[str, int] = {}
    for batch in pq_.ParquetFile(path).iter_batches(columns=["text"]):
        for text in batch.column("text").to_pylist():
            if not text:
                continue
            for w in re.split(PT.PY_WS, text.lower()):
                if w and SEP not in w:
                    counts[w] = counts.get(w, 0) + 1
    return counts


def encode_stats_from_parquet(
    path: str, vocab: dict[str, int], max_len: int = MAX_UNIT_LEN
) -> dict[int, tuple[int, int, int, int]]:
    """doc_id -> (n_words, n_pieces, n_unk_words, n_continuations),
    bit-equal to encode_stats over the same parquet."""
    import re

    import pyarrow.parquet as pq_

    cache: dict[str, tuple[int, int, int]] = {}

    def enc(w: str) -> tuple[int, int, int]:
        got = cache.get(w)
        if got is None:
            seg = greedy_encode(w, vocab, max_len)
            got = (
                (0, 1, 0)
                if seg is None
                else (
                    len(seg),
                    0,
                    sum(1 for p in seg if p.startswith(CONT)),
                )
            )
            cache[w] = got
        return got

    stats: dict[int, tuple[int, int, int, int]] = {}
    for batch in pq_.ParquetFile(path).iter_batches(
        columns=["doc_id", "text"]
    ):
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("text").to_pylist(),
        ):
            nw = np = nu = nc = 0
            if text:
                for w in re.split(PT.PY_WS, text.lower()):
                    if not w or SEP in w:
                        continue
                    nw += 1
                    p, u, c = enc(w)
                    np += p
                    nu += u
                    nc += c
            stats[int(doc_id)] = (nw, np, nu, nc)
    return stats


# ---------------------------------------------------------------------------
# Spark path
# ---------------------------------------------------------------------------

def _units_expr(word_col: str, max_len: int) -> str:
    """Position-tagged substrings as one codegen expression (the
    unigram _substrings_expr grid, with the ## continuation tag)."""
    return (
        f"flatten(transform(sequence(1, length({word_col})), i -> "
        f"transform(sequence(1, least({max_len},"
        f" length({word_col}) - i + 1)), l -> "
        f"CASE WHEN i = 1 THEN substring({word_col}, i, l) "
        f"ELSE concat('{CONT}', substring({word_col}, i, l)) END)))"
    )


def train_wordpiece(
    docs: DataFrame,
    text_col: str = "text",
    max_len: int = MAX_UNIT_LEN,
    vocab_target: int = VOCAB_TARGET,
) -> dict[str, int]:
    """Distributed WordPiece vocabulary: unit -> count.

    Corpus touched once (word_frequencies, shared with BPE); the seed
    explode and groupBy are vocabulary-scale; selection is the pure
    select_vocab over the collected count table (documented KB..MB
    vocab-scale collect, the merge-table convention)."""
    words = word_frequencies(docs, text_col)
    seed = (
        words.select(
            F.explode(F.expr(_units_expr("word", max_len))).alias("unit"),
            "cnt",
        )
        .groupBy("unit")
        .agg(F.sum("cnt").cast("bigint").alias("c"))
    )
    counts = {r["unit"]: int(r["c"]) for r in seed.collect()}
    return select_vocab(counts, vocab_target)


def encode_stats(
    docs: DataFrame,
    vocab: dict[str, int],
    text_col: str = "text",
    id_col: str = "doc_id",
    max_len: int = MAX_UNIT_LEN,
) -> DataFrame:
    """Per-document WordPiece stats under the trained vocabulary:
    (id, n_words, n_pieces, n_unk_words, n_continuations) — fertility
    plus the unknown-rate signal greedy matching makes meaningful.
    One Arrow pass over exploded words + one per-doc aggregation;
    documents with no tokenizable words survive with zeros."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<np: bigint, nu: bigint, nc: bigint>")
    def _enc(s):
        import pandas as pd

        cache: dict[str, tuple[int, int, int]] = {}
        nps, nus, ncs = [], [], []
        for w in s:
            if w is None:
                nps.append(0)
                nus.append(0)
                ncs.append(0)
                continue
            got = cache.get(w)
            if got is None:
                seg = greedy_encode(w, vocab, max_len)
                got = (
                    (0, 1, 0)
                    if seg is None
                    else (
                        len(seg),
                        0,
                        sum(1 for p in seg if p.startswith(CONT)),
                    )
                )
                cache[w] = got
            nps.append(got[0])
            nus.append(got[1])
            ncs.append(got[2])
        return pd.DataFrame({"np": nps, "nu": nus, "nc": ncs})

    words = docs.select(
        id_col,
        F.explode_outer(F.expr(PT.tokens(text_col, PT.SPARK))).alias("word"),
    ).filter(F.col("word").isNull() | ~F.col("word").contains(SEP))
    per_word = words.withColumn("_e", _enc(F.col("word"))).select(
        id_col,
        F.when(F.col("word").isNotNull(), 1).otherwise(0).alias("_nw"),
        F.coalesce(F.col("_e.np"), F.lit(0)).alias("_np"),
        F.coalesce(F.col("_e.nu"), F.lit(0)).alias("_nu"),
        F.coalesce(F.col("_e.nc"), F.lit(0)).alias("_nc"),
    )
    agg = per_word.groupBy(id_col).agg(
        F.sum("_nw").cast("bigint").alias("n_words"),
        F.sum("_np").cast("bigint").alias("n_pieces"),
        F.sum("_nu").cast("bigint").alias("n_unk_words"),
        F.sum("_nc").cast("bigint").alias("n_continuations"),
    )
    # A document whose EVERY token contains SEP loses all its rows to
    # the filter above (explode_outer only emits a null row for an
    # empty/null token array, not a fully-filtered one) — left-join
    # the stats back onto the distinct id frame so such documents
    # survive as (0,0,0,0), matching encode_stats_from_parquet.
    ids = docs.select(id_col).distinct()
    return ids.join(agg, id_col, "left").select(
        id_col,
        *[
            F.coalesce(F.col(c), F.lit(0)).cast("bigint").alias(c)
            for c in ("n_words", "n_pieces", "n_unk_words", "n_continuations")
        ],
    )
