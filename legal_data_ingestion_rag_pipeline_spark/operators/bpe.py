"""Byte-pair-encoding merge training, Spark-first.

The tokenizer-training step of an LLM data pipeline (Sennrich et al.
2016; the GPT-2/RoBERTa vocab recipe): repeatedly find the most
frequent adjacent symbol pair over the word-frequency table and merge
it.  The iterative structure mirrors kmeans_two_iterations: per
round, ONE distributed aggregation over the vocabulary plus a 1-row
driver collect (the argmax pair) — the corpus itself is touched once
to build word frequencies and never again.

Scale notes (100 TB):
- word-frequency table construction is the only corpus-scale pass
  (explode tokens -> groupBy word), identical to vocab building;
- each merge round shuffles only (pair, count) partials over the
  VOCABULARY, which is millions of rows, not the corpus; production
  trainers (fastBPE, HF tokenizers) further sample words — pass a
  pre-sampled docs DF for that;
- merge application is a codegen'd fold per word — no UDFs anywhere.

Determinism: pair argmax tie-breaks (count DESC, pair ASC), greedy
left-to-right non-overlapping merge application — the pure-Python
twin (train_merges_py) reproduces the trained merge table exactly,
which is how the driver gate hash-checks an iterative algorithm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import portable as PT

#: symbol-pair separator — never appears in whitespace-split tokens
SEP = "\x1f"


def _q(s: str) -> str:
    """Escape a symbol for inlining in a SQL string literal."""
    return s.replace("\\", "\\\\").replace("'", "\\'")


def _adjacent_pairs(syms: str) -> str:
    """SQL: array of 'left<SEP>right' strings for adjacent symbols."""
    n = f"greatest(size({syms}) - 1, 0)"
    return (
        f"zip_with(slice({syms}, 1, {n}), slice({syms}, 2, {n}), "
        f"(a, b) -> concat(a, '{SEP}', b))"
    )


def _merge_fold(syms: str, p1: str, p2: str) -> str:
    """SQL: greedy left-to-right merge of adjacent (p1, p2) into
    p1||p2 via a fold — the canonical BPE application order."""
    l, r, m = _q(p1), _q(p2), _q(p1 + p2)
    return (
        f"aggregate({syms}, CAST(array() AS array<string>), (acc, x) -> "
        f"IF(size(acc) > 0 AND element_at(acc, size(acc)) = '{l}' "
        f"AND x = '{r}', "
        f"concat(slice(acc, 1, size(acc) - 1), array('{m}')), "
        f"concat(acc, array(x))))"
    )


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt): the corpus-scale pass, done once."""
    return (
        docs.select(
            F.explode(F.expr(PT.tokens(text_col, PT.SPARK))).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def train_merges(
    docs: DataFrame, n_merges: int, text_col: str = "text"
) -> list[tuple[str, str, int]]:
    """Learn up to ``n_merges`` BPE merges; returns
    [(left, right, pair_count), ...] in rank order.  Stops early when
    no adjacent pair remains."""
    words = word_frequencies(docs, text_col).withColumn(
        "syms", F.expr("split(word, '')")
    )
    words = words.persist()
    merges: list[tuple[str, str, int]] = []
    try:
        for _ in range(n_merges):
            top = (
                words.select(
                    F.explode(F.expr(_adjacent_pairs("syms"))).alias("pair"),
                    "cnt",
                )
                .groupBy("pair")
                .agg(F.sum("cnt").alias("pair_cnt"))
                .orderBy(F.desc("pair_cnt"), F.asc("pair"))
                .limit(1)
                .collect()
            )
            if not top:
                break
            p1, p2 = top[0].pair.split(SEP, 1)
            merges.append((p1, p2, top[0].pair_cnt))
            nxt = words.select(
                "word", "cnt", F.expr(_merge_fold("syms", p1, p2)).alias("syms")
            ).persist()
            nxt.count()  # materialize before dropping the parent
            words.unpersist()
            words = nxt
    finally:
        words.unpersist()
    return merges


def apply_merges(
    df: DataFrame, merges: list[tuple[str, str, int]], syms_col: str = "syms"
) -> DataFrame:
    """Encode: apply the learned merges to a symbol-array column in
    rank order (the BPE encode convention). Pure codegen folds."""
    out = df
    for p1, p2, _ in merges:
        out = out.withColumn(syms_col, F.expr(_merge_fold(syms_col, p1, p2)))
    return out


# ---------------------------------------------------------------------------
# Pure-Python twin — the oracle path for the driver's hash gate, and
# the fuzz reference.  Reads the SAME parquet, reproduces train_merges
# bit-for-bit.
# ---------------------------------------------------------------------------

def _merge_word_py(syms: list[str], p1: str, p2: str) -> list[str]:
    out: list[str] = []
    for x in syms:
        if out and out[-1] == p1 and x == p2:
            out[-1] = p1 + p2
        else:
            out.append(x)
    return out


def train_merges_py(
    word_counts: dict[str, int], n_merges: int
) -> list[tuple[str, str, int]]:
    words = {w: (list(w), c) for w, c in word_counts.items()}
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, c in words.values():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        # (count DESC, pair ASC) — the Spark orderBy tie-break; the
        # pair string compares as left + SEP + right
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0] + SEP + kv[0][1]))
        (p1, p2), cnt = best
        merges.append((p1, p2, cnt))
        words = {
            w: (_merge_word_py(syms, p1, p2), c)
            for w, (syms, c) in words.items()
        }
    return merges


def train_merges_from_parquet(path: str, n_merges: int) -> list[tuple[str, str, int]]:
    """Sparkless twin over a documents parquet — used to render the
    driver oracle with data-derived literals (the ann_pq_trained
    convention)."""
    import re

    import pyarrow.parquet as pq_

    counts: dict[str, int] = {}
    for batch in pq_.ParquetFile(path).iter_batches(columns=["text"]):
        for text in batch.column("text").to_pylist():
            if not text:
                continue
            for w in re.split(r"\s+", text.lower()):
                if w:
                    counts[w] = counts.get(w, 0) + 1
    return train_merges_py(counts, n_merges)
