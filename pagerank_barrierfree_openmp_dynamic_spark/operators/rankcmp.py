"""Rank-vector comparison: Spearman correlation and top-k overlap.

The reference compares rank vectors only by error norms
(``pagerankError``, /root/reference/src/pagerank.hxx lines the norms
module cites); when the QUESTION is "did the ordering change" — static
vs incremental re-rank, rank vs in-degree, this week's crawl vs last
week's — order statistics are the right tool. Two here:

- :func:`spearman` — Pearson correlation of the two vectors' rank
  positions (ties get the average position of their tie block, the
  textbook treatment, so the statistic is permutation-deterministic).
- :func:`topk_overlap` — Jaccard overlap of the two top-k id sets
  (deterministic tie-break by id), the metric that matters when only
  the head of the ranking is consumed (crawl frontiers, serving caches).

Scale shape: rank positions come from :func:`~..operators.graph.dense_ids`
(range-repartition + per-partition row_number + an O(partitions) offset
cascade — NO single-reducer global window), tie-averaging is a window
partitioned by the value (tie blocks are tiny), and the statistic is one
scalar aggregate after an id join. Nothing is collected but the one-row
result. Both are plain column algebra — SQL-reproducible exactly, which
is what the driver oracles check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .graph import dense_ids


def _avg_positions(df: DataFrame, value_col: str, out: str) -> DataFrame:
    """(id, <out>): 1-based position of each row under ascending
    ``value_col``, ties averaged over their block (Spearman's fractional
    ranking). Ties sort adjacent, so their dense_ids positions form a
    consecutive block whose MEAN is deterministic even though the
    within-tie order is not."""
    p = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    pos = dense_ids(df.select("id", value_col), value_col, p)
    w_ties = Window.partitionBy(value_col)
    return (
        pos.withColumn(out, F.avg(F.col("idx") + 1).over(w_ties))
        .select("id", out)
    )


def spearman(
    a: DataFrame,
    b: DataFrame,
    value_col: str = "rank",
) -> DataFrame:
    """One row ``(spearman, n)``: Spearman rank correlation of the two
    ``(id, value_col)`` frames over their INNER-joined id universe.
    Computed as Pearson correlation of average-tie rank positions —
    handles ties exactly (the shortcut 1 − 6Σd²/n(n²−1) does not)."""
    ra = _avg_positions(a, value_col, "_ra")
    rb = _avg_positions(b, value_col, "_rb")
    return (
        ra.join(rb, "id")
        .agg(
            F.corr("_ra", "_rb").alias("spearman"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def topk_overlap(
    a: DataFrame,
    b: DataFrame,
    k: int,
    value_col: str = "rank",
) -> DataFrame:
    """One row ``(intersection, union_size, jaccard, k)`` comparing the
    two top-k id sets under descending ``value_col`` (ties broken by
    ascending id, so the set is deterministic)."""
    if k < 1:
        raise ValueError("k must be >= 1")

    def _top(df: DataFrame) -> DataFrame:
        return (
            df.orderBy(F.col(value_col).desc(), F.col("id").asc())
            .limit(k)
            .select("id")
        )

    ta, tb = _top(a), _top(b)
    inter = ta.intersect(tb).count()
    union = ta.union(tb).distinct().count()
    spark = a.sparkSession
    return spark.createDataFrame(
        [(inter, union, float(inter) / float(union or 1), k)],
        "intersection long, union_size long, jaccard double, k int",
    )


def rrf_fusion(rankings: list[DataFrame], k: int = 60,
               score_col: str = "rank") -> DataFrame:
    """Reciprocal-rank fusion (Cormack-Clarke-Buettcher, SIGIR 2009) of
    several (id, score) rankings: ``rrf(id) = Σ_lists 1/(k + pos_i)``,
    the standard way a search stack combines PageRank-, HITS-, and
    Katz-style signals without calibrating their score scales.

    Positions are 1-based by (score DESC, id ASC) — the id tie-break
    makes each list's ordering total — computed per list with
    :func:`~..operators.graph.dense_ids` (no single-reducer window).
    Ids missing from a list contribute nothing for it (the RRF
    convention for retrieval lists of different coverage); ``n_lists``
    records how many lists ranked the id. The per-list term is a single
    IEEE division and the sum is taken in list order via a left-to-right
    fold, so any SQL engine reproduces the double exactly.
    """
    if not rankings:
        raise ValueError("rrf_fusion needs at least one ranking")
    p = int(rankings[0].sparkSession.conf.get("spark.sql.shuffle.partitions"))
    fused = None
    for i, df in enumerate(rankings):
        pos = dense_ids(
            df.select("id", (-F.col(score_col)).alias("_neg")),
            ["_neg", "id"], p,
        ).select(
            "id",
            (F.lit(1.0) / (F.col("idx") + 1 + k)).alias(f"_t{i}"),
            F.lit(1).alias(f"_c{i}"),
        )
        fused = pos if fused is None else fused.join(pos, "id", "full")
    terms = [F.coalesce(F.col(f"_t{i}"), F.lit(0.0))
             for i in range(len(rankings))]
    acc = terms[0]
    for t in terms[1:]:
        acc = acc + t
    counts = [F.coalesce(F.col(f"_c{i}"), F.lit(0))
              for i in range(len(rankings))]
    cacc = counts[0]
    for c in counts[1:]:
        cacc = cacc + c
    return fused.select(
        "id", acc.alias("rrf"), cacc.cast("int").alias("n_lists"))
