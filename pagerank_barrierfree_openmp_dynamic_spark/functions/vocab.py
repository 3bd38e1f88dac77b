"""Vocabulary construction for LLM tokenizer/training pipelines.

Not a reference operator (the reference is a PageRank engine,
``/root/reference/src/pagerank.hxx``); these are the corpus-side
tokenizer-prep passes a webtext pipeline runs after cleaning/dedup:

- :func:`vocab_coverage` — frequency-ranked vocabulary with CUMULATIVE
  corpus coverage per entry ("the top 32k tokens cover 97.1% of the
  corpus"), the number that sizes a tokenizer's vocab. Needs a global
  ordered PREFIX SUM — the naive ``SUM(n) OVER (ORDER BY n DESC)``
  moves the whole vocabulary through one reducer (Spark warns exactly
  this); here it is the classic two-level scan instead: range-partition
  by the sort key, per-partition cumulative window (bounded partitions,
  parallel), and an O(partitions) offset cascade from one small
  collect — the same shape as
  :func:`~..operators.graph.dense_ids`, generalized from positions to
  running sums. Identical output to the ANSI window, no
  single-partition stage.
- :func:`bpe_pair_counts` — the counting kernel of one BPE merge
  iteration (Sennrich et al. 2016) at corpus scale: adjacent
  symbol-pair frequencies weighted by word frequency. The full BPE
  loop is sequential in the merge list (k merges = k passes over the
  O(vocab) word table — NOT the corpus; the corpus is scanned once for
  word counts), and each pass is exactly this distributed aggregation.

Both paths aggregate the corpus to an O(vocab) table first, so every
downstream step runs on rows proportional to distinct words, not
documents — at 100 TB the explode+count scan dominates and is one
map-side-combinable shuffle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from .text import tokens

__all__ = ["vocab_coverage", "bpe_pair_counts", "bpe_learn"]


def vocab_coverage(df: DataFrame, top_v: int = 200,
                   text_col: str = "text") -> DataFrame:
    """Top-``top_v`` tokens by frequency with rank and cumulative
    corpus coverage.

    Returns (token, n, rank, coverage): ``rank`` is 1-based by
    (n DESC, token ASC) — the token tie-break makes the order total —
    and ``coverage`` = (sum of counts through this rank) / (total
    tokens), rounded to 6 dp. Exactly equal to ``ROW_NUMBER()`` /
    ``SUM() OVER (ORDER BY n DESC, token)`` with no global window: the
    final division is one IEEE op on integer-exact cumulative sums, so
    any SQL engine reproduces it bit-for-bit.
    """
    counts = (
        df.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("n"))
    )
    p = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    # Two-level scan. Eager snapshot: repartitionByRange samples its
    # boundaries, so the offset cascade must see the exact partitioning
    # the final plan uses (same invariant as dense_ids).
    sorted_df = (
        counts.withColumn("_neg", -F.col("n"))
        .repartitionByRange(p, F.col("_neg"), F.col("token"))
        .sortWithinPartitions("_neg", "token")
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    per = {
        r["_pid"]: (r["cnt"], r["tot"])
        for r in sorted_df.groupBy("_pid")
        .agg(F.count("*").alias("cnt"), F.sum("n").alias("tot"))
        .collect()
    }
    rank_off, sum_off, racc, sacc = {}, {}, 0, 0
    for pid in sorted(per):
        rank_off[pid], sum_off[pid] = racc, sacc
        racc += per[pid][0]
        sacc += per[pid][1]
    total = sacc
    rmap = F.create_map(*[F.lit(x) for kv in sorted(rank_off.items()) for x in kv])
    smap = F.create_map(*[F.lit(x) for kv in sorted(sum_off.items()) for x in kv])
    w = (
        Window.partitionBy("_pid").orderBy("_neg", "token")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        sorted_df.withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("_pid").orderBy("_neg", "token")
            ).cast("long") + rmap[F.col("_pid")],
        )
        .withColumn("_cum", F.sum("n").over(w) + smap[F.col("_pid")])
        .filter(F.col("rank") <= top_v)
        .select(
            "token", "n", "rank",
            F.round(F.col("_cum").cast("double") / F.lit(float(total)), 6)
            .alias("coverage"),
        )
    )


def bpe_pair_counts(df: DataFrame, top_k: int = 50,
                    text_col: str = "text") -> DataFrame:
    """Adjacent character-pair frequencies over the corpus, weighted by
    word frequency — one BPE merge iteration's argmax candidate table.

    Two aggregations: corpus -> word-frequency table (the only
    corpus-size scan; map-side combine), then words -> per-pair sums
    over ``len(word)-1`` generated pairs per DISTINCT word. Returns the
    ``top_k`` (pair, n) rows ordered by (n DESC, pair ASC) via
    distributed top-k (per-partition heaps, no global sort).
    """
    words = (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("wn"))
        .filter(F.length("word") >= 2)
    )
    pair_idx = F.sequence(F.lit(1), F.length("word") - 1)
    pairs = words.select(
        F.explode(
            F.transform(pair_idx, lambda i: F.col("word").substr(i, F.lit(2)))
        ).alias("pair"),
        "wn",
    )
    return (
        pairs.groupBy("pair").agg(F.sum("wn").alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(top_k)
    )


def bpe_learn(df: DataFrame, n_merges: int = 20,
              text_col: str = "text") -> DataFrame:
    """Learn an ordered BPE merge list over the corpus (Sennrich et al.
    2016). Returns (rank, left, right, n): the ``rank``-th merge joins
    adjacent symbols (left, right) which co-occurred ``n`` times
    (weighted by word frequency) at that iteration.

    Execution shape: the corpus is scanned ONCE (word-frequency
    aggregation, map-side combine); every merge iteration then runs on
    the O(vocab) word-symbol table — a pair-count aggregation (JVM
    array expressions), a driver-side argmax of one row (the greedy
    choice is inherently sequential — this is BPE's algorithmic serial
    term, k scalar argmaxes, not a data-scale bottleneck), and an
    Arrow-batched pandas rewrite of only the words containing the
    winning pair (`filter` first, union back). Lineage is truncated
    per iteration with an eager localCheckpoint like the engine's other
    iterative kernels. Ties break on (left, right) so the merge list is
    a pure function of the corpus.

    Symbols are joined with ``\\x00`` in the pair key (multi-char
    symbols make bare concatenation ambiguous: ('ab','c') vs ('a','bc')).
    """
    from pyspark.sql.types import ArrayType, StringType

    words = (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("wn"))
        .filter(F.length("word") >= 2)
    )
    syms = words.select(
        F.split("word", "").alias("s"), "wn"
    ).localCheckpoint(eager=True)

    spark = df.sparkSession
    merges = []
    sep = "\x00"
    # 0..size-2 only when a pair exists; the empty array otherwise —
    # F.sequence(0, -1) would yield a DESCENDING [0, -1] and index the
    # array at 0/-1 (an error under ANSI, silent nulls otherwise)
    pair_idx = F.when(
        F.size("s") >= 2, F.sequence(F.lit(0), F.size("s") - 2)
    ).otherwise(F.array().cast("array<int>"))
    for rank in range(1, n_merges + 1):
        pc = (
            syms.filter(F.size("s") >= 2)
            .select(
                F.explode(
                    F.transform(
                        pair_idx,
                        lambda i: F.concat(
                            F.element_at("s", i + 1),
                            F.lit(sep),
                            F.element_at("s", i + 2),
                        ),
                    )
                ).alias("pair"),
                "wn",
            )
            .groupBy("pair").agg(F.sum("wn").alias("n"))
            .orderBy(F.desc("n"), F.asc("pair")).limit(1)
            .collect()
        )
        if not pc:
            break
        left, right = pc[0]["pair"].split(sep, 1)
        merges.append((rank, left, right, int(pc[0]["n"])))

        def _make_merge(a: str, b: str):
            @F.pandas_udf(ArrayType(StringType()))
            def _merge(col: pd.Series) -> pd.Series:
                out = []
                for s in col:
                    s = list(s)
                    i, res = 0, []
                    while i < len(s):
                        if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                            res.append(a + b)
                            i += 2
                        else:
                            res.append(s[i])
                            i += 1
                    out.append(res)
                return pd.Series(out)

            return _merge

        _merge = _make_merge(left, right)

        # rewrite only words that contain the winning pair adjacently
        has_pair = F.exists(
            pair_idx,
            lambda i: (F.element_at("s", i + 1) == left)
            & (F.element_at("s", i + 2) == right),
        )
        hit = syms.filter(has_pair)
        miss = syms.filter(~has_pair)
        syms = hit.select(_merge("s").alias("s"), "wn") \
            .unionByName(miss).localCheckpoint(eager=True)

    return spark.createDataFrame(
        pd.DataFrame(merges, columns=["rank", "left", "right", "n"]),
        "rank long, left string, right string, n long",
    )
