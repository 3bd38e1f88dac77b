"""Training-sequence packing for LLM data pipelines.

Not a reference operator (the reference is a PageRank engine,
``/root/reference/src/pagerank.hxx``); packing is the last mile of a
100-TB webtext pipeline: after extraction, dedup, and quality filtering,
documents must be arranged into fixed-length token windows (training
sequences) deterministically, so every re-run — and every downstream
tokenizer shard — sees the same layout.

Two standard packing disciplines, both implemented shuffle-minimally:

- :func:`pack_concat` — GPT-style *concat-and-split*: documents are
  concatenated in a deterministic order and the stream is cut every
  ``max_tokens``; a document may straddle a window boundary. This is
  pure window arithmetic (one cumulative sum per shard), so the whole
  operator is a single hash-shuffle on ``shard`` followed by JVM-side
  window functions — no Python in the plan at all.
- :func:`pack_greedy` — *first-fit-in-order* bin packing: a document is
  never split; it joins the current window if it fits, otherwise opens
  a new one. The fold is inherently sequential **within** a shard, so
  the operator shards first (one shuffle) and runs the fold per shard in
  an Arrow-batched ``applyInPandas`` (a NumPy pass over the shard's
  token counts — no per-row Python UDF).

Scale shape (the part that must survive 100 TB): *shard* is the unit of
both parallelism and sequential work. ``shard = doc_id % n_shards`` is
a pure arithmetic function (reproducible in any engine — the DuckDB
oracles re-derive it), so packing is embarrassingly parallel across
shards and each shard's window/fold state is O(1). At 10^9 documents,
``n_shards ≈ docs / 1e6`` keeps every per-shard group comfortably in a
task while saturating any executor count. Documents never interact
across shards, so adding data re-packs only the shards it lands in.

Zero-token documents are excluded on both the Spark and oracle sides:
they occupy no window space and would make the straddle arithmetic
(``(cum_end - 1) div max_tokens``) ill-defined.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from .text import tokens

__all__ = ["pack_concat", "pack_greedy", "packing_fill"]


def _token_shards(df: DataFrame, n_shards: int, text_col: str,
                  id_col: str) -> DataFrame:
    """(shard, doc_id, n_tokens) for nonempty docs; shard is arithmetic."""
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.size(tokens(F.col(text_col))).alias("n_tokens"),
        )
        .where(F.col("n_tokens") > 0)
        .withColumn("shard",
                    F.pmod(F.col("doc_id"), F.lit(n_shards)).cast("int"))
    )


def pack_concat(df: DataFrame, max_tokens: int = 512, n_shards: int = 8,
                text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Concat-and-split packing: where each document lands in the
    fixed-``max_tokens`` window stream of its shard.

    Returns one row per document:
      shard, doc_id, n_tokens,
      first_seq     — index of the first window this doc occupies,
      start_offset  — token offset of the doc inside that window,
      n_seqs        — how many windows the doc spans (≥ 1).

    Entirely JVM-side: one shuffle on shard, then a running sum +
    integer div/mod. ``div`` keeps the arithmetic exact in int64 (no
    float floor) — cum sums at 10^12-token scale exceed float53.
    """
    toks = _token_shards(df, n_shards, text_col, id_col)
    w = (Window.partitionBy("shard").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    m = int(max_tokens)
    return (
        toks.withColumn("cum_end", F.sum("n_tokens").over(w))
        .withColumn("cum_start", F.col("cum_end") - F.col("n_tokens"))
        .select(
            "shard", "doc_id", "n_tokens",
            F.expr(f"cum_start div {m}").alias("first_seq"),
            F.pmod("cum_start", F.lit(m)).cast("long").alias("start_offset"),
            (F.expr(f"(cum_end - 1) div {m}")
             - F.expr(f"cum_start div {m}") + F.lit(1)).alias("n_seqs"),
        )
    )


def pack_greedy(df: DataFrame, max_tokens: int = 512, n_shards: int = 8,
                text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """First-fit-in-order packing: per-document window (bin) assignment.

    Within each shard, documents are visited in ``doc_id`` order; a doc
    joins the open window iff it fits (``fill + n_tokens <= max_tokens``),
    else it opens the next window. Documents longer than ``max_tokens``
    get a window of their own (never split, never dropped — the caller
    decides whether to truncate upstream).

    Returns (shard, doc_id, n_tokens, bin) with bins numbered 0.. per
    shard. The fold is a single NumPy pass per shard group inside
    ``applyInPandas`` — the sequential semantics ARE the operator, and
    sharding bounds them; there is no per-row Python UDF.
    """
    toks = _token_shards(df, n_shards, text_col, id_col)
    m = int(max_tokens)

    def _fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id", kind="mergesort")
        t = pdf["n_tokens"].to_numpy(dtype=np.int64)
        bins = np.empty(len(t), dtype=np.int64)
        fill = 0
        b = -1
        for i, ti in enumerate(t):
            if b < 0 or fill + ti > m:
                b += 1
                fill = int(ti)
            else:
                fill += int(ti)
            bins[i] = b
        out = pdf[["shard", "doc_id", "n_tokens"]].copy()
        out["bin"] = bins
        return out

    return toks.groupBy("shard").applyInPandas(
        _fold, schema="shard int, doc_id long, n_tokens int, bin long")


def packing_fill(packed: DataFrame, max_tokens: int = 512) -> DataFrame:
    """Per-window fill report over :func:`pack_greedy` output:
    (shard, bin, n_docs, fill_tokens, fill_ppm).

    ``fill_ppm`` is the fill ratio in parts-per-million as exact integer
    arithmetic (``fill_tokens * 1e6 div max_tokens``) — reproducible
    bit-for-bit by any SQL engine, with no float round-tie hazard."""
    return (
        packed.groupBy("shard", "bin")
        .agg(F.count("*").alias("n_docs"),
             F.sum("n_tokens").cast("long").alias("fill_tokens"))
        .withColumn("fill_ppm",
                    F.expr(f"(fill_tokens * 1000000) div {int(max_tokens)}"))
    )
