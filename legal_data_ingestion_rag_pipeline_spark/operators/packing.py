"""Sequence packing for pretraining — greedy next-fit-decreasing bin
packing of documents into fixed token-capacity context windows,
Spark-first.

Every pretraining pipeline packs documents into L-token training
sequences; the padding it fails to eliminate is pure wasted compute
(Krell et al. 2021 measure ~20%+ waste for naive batching at L=512).
This operator assigns each document to a (shard, bin) so downstream
can concatenate bin members into one training sequence.

Algorithm: NEXT-FIT-DECREASING within hash shards.
- Documents shard by ``doc_id % n_shards`` — embarrassingly parallel,
  and packing quality is local (NFD's fill ratio concentrates fast;
  with thousands of docs per shard the per-shard padding is within
  noise of a global pack, without any global sort).
- Within a shard, documents sort by (capped_tokens DESC, doc_id) and
  stream through next-fit: if the current bin can't take the doc,
  CLOSE it and open a new one.  Unlike first-fit, next-fit keeps O(1)
  state (one open-bin fill counter) — the property that makes the
  operator streamable and memory-safe at any shard size.
- Documents longer than the capacity are capped (they become one full
  bin — the truncate-to-context convention); empty documents are
  excluded (nothing to pack).

Determinism: token counts are exact; shard/sort/next-fit are pure
integer decisions with total tie orders (doc_id), so the pure-Python
twin (:func:`pack_stats_py`, backing the VALUES oracle) is bit-equal.

Scale shape (100 TB): one map-side token-count pass; ONE shuffle on
the shard key; per-shard packing is a grouped Arrow pass
(applyInPandas -> FlatMapGroupsInPandas, never row-wise Python) whose
state is a single integer.  ``n_shards`` is the parallelism/memory
dial: size it so a shard's (doc_id, n_tokens) pairs fit an executor
(16 bytes/doc -> millions of docs per shard are trivial); packing
results never collect to the driver.

No reference-file citation applies: /root/reference stops at
retrieval; this extends the pretraining-curation family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import portable as PT

CAPACITY = 128
N_SHARDS = 8


def pack_assignments(
    docs: DataFrame,
    capacity: int = CAPACITY,
    n_shards: int = N_SHARDS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, shard, bin_id, n_tokens) — the packing assignment.
    bin_id is the 0-based bin index within the shard, in NFD order."""
    # coalesce BEFORE tokenizing: size(NULL array) is NULL and Spark's
    # least() skips NULLs, so a NULL text would otherwise become a
    # phantom `capacity`-token document instead of being excluded
    toks = PT.tokens(f"coalesce({text_col}, '')", PT.SPARK)
    sized = docs.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        F.least(F.size(F.expr(toks)), F.lit(capacity))
        .cast("bigint")
        .alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)
    # pmod, not %: Spark's % follows the dividend's sign (negative
    # remainder for negative ids) while the pure-Python twin uses
    # Python %, which is always non-negative — pmod matches the twin
    # for any id sign
    sharded = sized.withColumn(
        "shard", F.pmod(F.col("doc_id"), F.lit(n_shards)).cast("bigint")
    )

    def _pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True]
        )
        bins, fill, cur = [], 0, -1
        for n in pdf["n_tokens"]:
            n = int(n)
            if cur < 0 or fill + n > capacity:
                cur += 1
                fill = 0
            fill += n
            bins.append(cur)
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "shard": pdf["shard"].astype("int64"),
                "bin_id": pd.Series(bins, index=pdf.index, dtype="int64"),
                "n_tokens": pdf["n_tokens"].astype("int64"),
            }
        )

    return sharded.groupBy("shard").applyInPandas(
        _pack, "doc_id bigint, shard bigint, bin_id bigint, n_tokens bigint"
    )


def pack_stats_py(
    sf_dir: str, capacity: int = CAPACITY, n_shards: int = N_SHARDS
) -> list[tuple[int, int, int, int, int, int]]:
    """Sparkless twin: [(shard, n_docs, n_bins, total_tokens,
    padding_tokens, fill_milli)] sorted by shard — bit-equal replay of
    pack_assignments + the per-shard aggregation."""
    import re

    import pyarrow.parquet as pq_

    per_shard: dict[int, list[tuple[int, int]]] = {}
    pf = pq_.ParquetFile(f"{sf_dir}/documents.parquet")
    for batch in pf.iter_batches(columns=["doc_id", "text"]):
        for did, text in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("text").to_pylist(),
        ):
            toks = [
                w for w in re.split(PT.PY_WS, (text or "").lower()) if w
            ]
            n = min(len(toks), capacity)
            if n > 0:
                per_shard.setdefault(int(did) % n_shards, []).append(
                    (n, int(did))
                )
    out = []
    for shard in sorted(per_shard):
        items = sorted(per_shard[shard], key=lambda t: (-t[0], t[1]))
        n_bins, fill = 0, 0
        total = 0
        for n, _ in items:
            if n_bins == 0 or fill + n > capacity:
                n_bins += 1
                fill = 0
            fill += n
            total += n
        padding = n_bins * capacity - total
        fill_milli = total * 1000 // (n_bins * capacity)
        out.append((shard, len(items), n_bins, total, padding, fill_milli))
    return out
