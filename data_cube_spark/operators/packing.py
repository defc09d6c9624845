"""Sequence packing: assign documents to fixed-token-budget training
sequences.

Beyond-reference operator for the pretraining pipeline (the reference has
nothing comparable): after cleaning/dedup/sampling, documents are packed
into sequences of ~``capacity`` tokens for the training loader.

Two strategies, mirroring how packing is actually run:

- :func:`pack_concat_chunk` — the GPT-style concat-and-chunk: documents
  are laid out in a deterministic order and the token stream is cut every
  ``capacity`` tokens (documents may straddle a cut; the loader handles
  boundaries). Pure window arithmetic — cumulative sum within a shard —
  and fully SQL-expressible (DuckDB oracle).
- :func:`pack_greedy` — no-split greedy bin packing: a document that
  would overflow the current sequence starts a new one. The running
  "current fill" state is a scan with a data-dependent reset — not a
  window expression — so it runs as an ``applyInPandas`` per shard
  (Arrow-batched, one shuffle on the shard key).

Design for 100 TB: a global document order would be a single-reducer
window, so packing is SHARDED — each document is hash-assigned to one of
``n_shards`` shards (deterministic md5, same expression the sampling
operators use) and packed within its shard. Shards are independent:
n_shards scales with the cluster, each shard's window/state scan is one
partition's work, and the (shard, seq) pair is the stable global sequence
id. Loss vs global packing is at most one partial sequence per shard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_cube_spark.operators.sampling import draw_hex


def with_shard(df: DataFrame, n_shards: int, key: str = "doc_id",
               salt: str = "") -> DataFrame:
    """Deterministic shard assignment: first 8 md5 hex digits mod
    ``n_shards``. Oracle-parity expression (no engine-specific hash)."""
    h = F.conv(F.substring(draw_hex(key, salt), 1, 8), 16, 10).cast("bigint")
    return df.withColumn("shard", (h % n_shards).cast("int"))


def pack_concat_chunk(
    df: DataFrame,
    capacity: int,
    n_shards: int = 64,
    tokens_col: str = "n_tokens",
    key: str = "doc_id",
) -> DataFrame:
    """Concat-and-chunk packing: within each shard, documents ordered by
    ``key`` form one token stream; a document's sequence is the chunk its
    FIRST token lands in: ``seq = floor((cumsum - n_tokens) / capacity)``.
    One shuffle (the per-shard window); emits (doc_id, shard, seq,
    offset) where offset is the document's start position in its shard's
    stream."""
    d = with_shard(df, n_shards, key)
    w = Window.partitionBy("shard").orderBy(key)
    cum = F.sum(tokens_col).over(w)
    start = (cum - F.col(tokens_col)).cast("bigint")
    return d.select(
        F.col(key),
        "shard",
        F.floor(start / capacity).cast("bigint").alias("seq"),
        start.alias("offset"),
        F.col(tokens_col),
    )


def pack_greedy(
    df: DataFrame,
    capacity: int,
    n_shards: int = 64,
    tokens_col: str = "n_tokens",
    key: str = "doc_id",
) -> DataFrame:
    """No-split greedy packing: walk each shard's documents in ``key``
    order, close the current sequence when the next document would
    overflow ``capacity``. Documents longer than ``capacity`` get a
    sequence of their own (the loader truncates). State is two scalars
    per shard — ``applyInPandas`` keeps the scan vectorized per shard
    with ids+counts only (no text) crossing the wire."""
    import pandas as pd

    def pack(pdf: pd.Series) -> pd.DataFrame:
        pdf = pdf.sort_values(key)
        seqs, fills = [], []
        seq, fill = 0, 0
        for t in pdf[tokens_col]:
            t = int(t)
            if fill > 0 and fill + t > capacity:
                seq, fill = seq + 1, 0
            seqs.append(seq)
            fills.append(fill)
            fill += t
        out = pdf[[key, "shard", tokens_col]].copy()
        out["seq"] = seqs
        out["offset"] = fills
        return out[[key, "shard", "seq", "offset", tokens_col]]

    d = with_shard(df, n_shards, key).select(key, "shard", tokens_col)
    schema = (
        f"{key} bigint, shard int, seq bigint, offset bigint, "
        f"{tokens_col} bigint"
    )
    return d.groupBy("shard").applyInPandas(pack, schema=schema)


def packing_stats(packed: DataFrame, capacity: int) -> DataFrame:
    """Per-shard packing efficiency: sequences used, token fill rate —
    the quality metric for a packing run."""
    per_seq = packed.groupBy("shard", "seq").agg(
        F.sum(F.col("n_tokens")).alias("seq_tokens")
    )
    return per_seq.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_seqs"),
        F.sum("seq_tokens").alias("tokens"),
        (F.sum("seq_tokens") / (F.count(F.lit(1)) * capacity))
        .alias("fill_rate"),
    )
