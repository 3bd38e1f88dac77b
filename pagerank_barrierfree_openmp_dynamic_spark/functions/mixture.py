"""Training-mixture weighting and curriculum ordering for LLM corpora.

Not a reference operator (the reference is a PageRank engine,
``/root/reference/src/pagerank.hxx``); these are the two standard
corpus-composition knobs a webtext training pipeline applies after
filtering and packing:

- :func:`source_mixture_weights` — temperature-scaled source sampling
  (the public Pile/DoReMi-style recipe): a source's sampling weight is
  proportional to ``tokens^alpha`` with ``alpha < 1``, which upsamples
  small high-value sources relative to raw token share. One map-side-
  combinable hash-agg over the corpus + a scalar normalization — no
  per-row Python, no second scan.
- :func:`curriculum_buckets` — deterministic quality-ordered NTILE
  buckets for curriculum schedules. The order key is ``(quality,
  doc_id)`` so ties cannot reshuffle between runs or engines; NTILE is
  ANSI-standard, so any SQL engine re-derives the same buckets.

Scale shape: mixture weighting aggregates to O(sources) rows (a scalar
problem at any corpus size). Curriculum bucketing needs a GLOBAL
position — the naive ``NTILE() OVER (ORDER BY …)`` would move the whole
corpus to one reducer (Spark warns exactly this), so it is built on
:func:`~..operators.graph.dense_ids` instead: range-repartitioned sort,
per-partition ``row_number``, an O(partitions) offset cascade, then
NTILE's bucket arithmetic applied to the global position as plain
column math. Identical output to ANSI NTILE, no single-partition stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..operators.graph import dense_ids
from .text import quality_score, tokens

__all__ = ["source_mixture_weights", "curriculum_buckets"]


def source_mixture_weights(df: DataFrame, alpha: float = 0.75,
                           text_col: str = "text",
                           source_col: str = "source") -> DataFrame:
    """Per-source token counts and temperature-scaled sampling weights.

    Returns (source, n_docs, n_tokens, token_share, weight): ``weight``
    is ``n_tokens^alpha`` normalized to sum 1 over sources, rounded to
    6 dp (both the Spark and oracle sides round, so the comparison is
    exact).
    """
    per_source = (
        df.select(F.col(source_col).alias("source"),
                  F.size(tokens(F.col(text_col))).alias("n_tok"))
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"),
             F.sum("n_tok").cast("long").alias("n_tokens"))
    )
    w = Window.partitionBy()  # O(sources) rows — scalar normalization
    raw = F.pow(F.col("n_tokens").cast("double"), F.lit(float(alpha)))
    return per_source.select(
        "source", "n_docs", "n_tokens",
        F.round(F.col("n_tokens") / F.sum("n_tokens").over(w), 6)
        .alias("token_share"),
        F.round(raw / F.sum(raw).over(w), 6).alias("weight"),
    )


def curriculum_buckets(df: DataFrame, n_buckets: int = 10,
                       text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Quality-ordered curriculum buckets (1 = lowest quality).

    Returns (doc_id, quality, bucket) equal to ``NTILE(n_buckets) OVER
    (ORDER BY quality, doc_id)`` — the doc_id tie-break makes the
    assignment a pure function of the corpus — but computed WITHOUT a
    single-partition global window: a distributed global position from
    :func:`dense_ids`, then NTILE's first-``n % k``-buckets-are-larger
    arithmetic as column expressions.
    """
    k = int(n_buckets)
    q = quality_score(df, text_col=text_col, id_col=id_col) \
        .select(F.col(id_col), "quality")
    p = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    pos = dense_ids(q, ["quality", id_col], p)
    n = pos.count()  # scalar; dense_ids already materialized the sort
    size, rem = divmod(n, k)
    big = size + 1
    # NTILE: first `rem` buckets hold `size+1` rows, the rest `size`.
    idx = F.col("idx")
    cut = rem * big
    if size == 0:  # fewer rows than buckets: one row per bucket
        bucket = (idx + 1).cast("int")
    else:
        bucket = (
            F.when(idx < F.lit(cut), F.expr(f"idx div {big}"))
            .otherwise(F.lit(rem) + F.expr(f"(idx - {cut}) div {size}"))
            + 1
        ).cast("int")
    return pos.select(F.col(id_col), "quality", bucket.alias("bucket"))
