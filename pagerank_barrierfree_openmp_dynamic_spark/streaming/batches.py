"""Structured Streaming skin over the batch-incremental engine.

The reference's "dynamic" is batch-incremental: apply an edge batch, then
incrementally re-rank (``/root/reference/main.cxx:74-124``). This module
exposes the same loop as a Structured Streaming job: a stream of
(src, dst, op) batch files drives ``apply_batch_dense`` + dynamic-frontier
re-rank via ``foreachBatch`` — each micro-batch IS one reference-protocol
batch. Watermarks/stateful operators are unnecessary (SURVEY.md §2.8:
the reference has no continuous-time semantics to mirror).

Recovery contract (precise, because the engine's graph state lives in
the DRIVER, not in the streaming checkpoint): within one live driver,
each micro-batch is applied exactly once (the file-source checkpoint
dedupes redelivery). Across a driver restart the streaming checkpoint
skips already-committed files, so a NEW engine built from the base
graph would silently miss them — after a crash, either replay the full
batch directory into a fresh engine under a FRESH checkpoint_dir, or
rebuild the engine from its own rank/graph checkpoints
(``PageRankOptions.checkpoint_dir`` + ``resume_arrow``) before
reattaching the stream. Reusing a surviving engine object with the OLD
checkpoint_dir is also safe (its graph already reflects the committed
batches and the uncommitted one is redelivered).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.batch import (
    DenseIdSpaceError,
    apply_batch,
    apply_batch_dense,
    batch_endpoints_frontier,
)
from ..operators.graph import LinkGraph
from ..plans.pagerank import PageRankOptions, PageRankResult
from ..plans.pagerank_arrow import DenseGraph, pagerank_arrow

BATCH_SCHEMA = "src long, dst long, op string"


class IncrementalPageRank:
    """Stateful incremental PageRank: holds the current graph snapshot,
    dense view, and converged ranks; every :meth:`update` applies one edge
    batch at O(batch) cost and re-ranks only the affected frontier."""

    # bound on retained per-batch results: older entries are reduced to
    # scalar summaries so a continuous stream cannot pin every batch's
    # DataFrame lineage/broadcasts in memory
    HISTORY_MAX = 8

    def __init__(self, graph: LinkGraph, opts: PageRankOptions | None = None):
        self.opts = opts or PageRankOptions()
        self.graph = graph
        self.dense = DenseGraph(graph).materialize()
        res = pagerank_arrow(graph, self.opts, dense=self.dense, resident=True)
        self.ranks = res.ranks
        self.history: list[PageRankResult] = [res]
        #: scalar per-batch summaries (unbounded but O(1) each)
        self.summaries: list[dict] = [self._summary(res)]

    @staticmethod
    def _summary(res: PageRankResult) -> dict:
        return dict(iterations=res.iterations, err=res.err, time_s=res.time_s)

    def update(self, batch: DataFrame) -> PageRankResult:
        if batch.isEmpty():
            return self.history[-1]
        try:
            new_graph, new_dense = apply_batch_dense(self.graph, self.dense, batch)
        except DenseIdSpaceError:
            # batch introduces new vertices -> full rebuild path. ONLY this
            # error: a bare ValueError would also swallow the weighted
            # zero-out-weight-sum validation and reroute corrupt data into
            # a rebuild that computes NaN ranks silently.
            new_graph = apply_batch(self.graph, batch)
            new_dense = DenseGraph(new_graph).materialize()
        # a grown vertex set changes the teleport term (1-d)/n for EVERY
        # vertex — frontier pruning would leave that global perturbation
        # unpropagated, so re-rank naive-dynamic (init=prev, full sweep)
        frontier = (None
                    if new_graph.num_vertices != self.graph.num_vertices
                    else batch_endpoints_frontier(self.graph, new_graph,
                                                  batch))
        res = pagerank_arrow(
            new_graph, self.opts, init=self.ranks, frontier=frontier,
            dense=new_dense, resident=True,
        )
        self.graph, self.dense, self.ranks = new_graph, new_dense, res.ranks
        self.history.append(res)
        self.summaries.append(self._summary(res))
        del self.history[: -self.HISTORY_MAX]
        return res


def stream_batches(
    spark: SparkSession,
    batch_dir: str,
    engine: IncrementalPageRank,
    checkpoint_dir: str,
    available_now: bool = True,
    sink: str | None = None,
):
    """Stream (src, dst, op) parquet files from ``batch_dir`` into the
    incremental engine. ``available_now=True`` drains what's there and
    stops (test/batch mode); otherwise runs continuously.

    Returns the StreamingQuery; ``query.awaitTermination()`` to block.

    One file per micro-batch (``maxFilesPerTrigger=1``): edge batches are
    ORDERED (a later batch may delete an earlier batch's insertion), so
    coalescing files into one micro-batch would change the net edge set.
    """
    stream = (
        spark.readStream.schema(BATCH_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(batch_dir)
    )

    def handle(df: DataFrame, _batch_id: int) -> None:
        res = engine.update(df)
        if sink:
            res.ranks.write.mode("overwrite").parquet(
                f"{sink}/batch={_batch_id}")

    writer = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
