"""End-to-end streaming re-rank pipeline: the composition the degree-state
tracker promises (``state.py`` docstring) — ::

    edge-event stream
      -> stateful degree tracking (applyInPandasWithState, real state store)
      -> frontier seed (out-neighbors of state-emitted changed sources)
      -> O(batch) delta overlay (apply_batch_dense)
      -> dynamic-frontier incremental re-rank (pagerank_arrow)

One streaming query: the stateful operator runs INSIDE the stream (its
emitted rows carry both the edge payload and the per-source degree state),
and ``foreachBatch`` drives the incremental engine off those rows. The
reference's batch protocol (``/root/reference/main.cxx:74-124``) is thereby
the micro-batch loop of a Structured Streaming job with durable state.

Scale shape: state is O(distinct src) in the streaming state store; each
micro-batch costs O(batch) for the overlay plus the frontier-pruned
supersteps — no graph rescan, no rebuild.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

from ..operators.batch import (
    DenseIdSpaceError,
    apply_batch,
    apply_batch_dense,
    batch_endpoints_frontier,
)
from ..operators.graph import LinkGraph
from ..plans.pagerank import PageRankOptions, PageRankResult
from ..plans.pagerank_arrow import DenseGraph, pagerank_arrow

EDGE_EVENT_SCHEMA = "src long, dst long, op long"

# Emitted per edge EVENT: the edge payload plus the source's post-batch
# degree state — everything the downstream incremental engine needs.
EDGE_STATE_SCHEMA = StructType([
    StructField("src", LongType(), False),
    StructField("dst", LongType(), False),
    StructField("op", LongType(), False),            # +1 insert / -1 delete
    StructField("out_degree", LongType(), False),    # running total (post)
    StructField("events", LongType(), False),        # lifetime event count
])

_STATE_SCHEMA = StructType([
    StructField("out_degree", LongType(), False),
    StructField("events", LongType(), False),
])


def _update_edge_state(
    key: Tuple,
    pdf_iter: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold one source's micro-batch slice into its degree state and emit
    the slice's edge rows annotated with the updated state (vectorized —
    one state read/write per group, no per-row Python)."""
    parts = [pdf[["src", "dst", "op"]] for pdf in pdf_iter]
    pdf = pd.concat(parts, ignore_index=True) if parts else pd.DataFrame(
        columns=["src", "dst", "op"])
    if state.exists:
        deg0, ev0 = state.get
    else:
        deg0, ev0 = 0, 0
    deg = deg0 + int(pdf["op"].sum()) if len(pdf) else deg0
    ev = ev0 + len(pdf)
    state.update((deg, ev))
    if len(pdf):
        out = pdf.copy()
        out["out_degree"] = deg
        out["events"] = ev
        yield out


def streaming_edge_degree_state(edge_events: DataFrame) -> DataFrame:
    """Stateful pass-through: every edge event flows on, annotated with its
    source's updated running out-degree (state store keyed by src). The
    downstream consumer gets the edge payload AND the changed-source set in
    one stream — the composition point for incremental re-ranking."""
    return edge_events.select("src", "dst", "op").groupBy("src") \
        .applyInPandasWithState(
            _update_edge_state,
            outputStructType=EDGE_STATE_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )


class StreamingReRank:
    """Incremental engine driven by state-annotated edge events.

    Holds the current graph snapshot, dense view, and converged ranks;
    every :meth:`handle` call applies one micro-batch of (src, dst, op,
    out_degree, events) rows at O(batch) cost and re-ranks only the
    frontier seeded from the STATE-EMITTED changed sources: out-neighbors
    of deletion sources in the old graph and insertion sources in the new
    (``pagerankAffectedFrontierW``, /root/reference/src/pagerank.hxx:367-410).
    """

    def __init__(self, graph: LinkGraph, opts: PageRankOptions | None = None,
                 dense: DenseGraph | None = None):
        self.opts = opts or PageRankOptions()
        self.graph = graph
        self.dense = (dense or DenseGraph(graph)).materialize()
        res = pagerank_arrow(graph, self.opts, dense=self.dense, resident=True)
        self.ranks = res.ranks
        self.last: PageRankResult = res
        self.summaries: list[dict] = [
            dict(iterations=res.iterations, err=res.err)]

    def handle(self, events: DataFrame, _batch_id: int = -1) -> PageRankResult:
        # pin FIRST, probe emptiness on the pinned data: events is a
        # re-executable plan containing the stateful applyInPandasWithState
        # pass, and isEmpty() on the raw plan would run that whole pass
        # once just to probe, then localCheckpoint would run it again
        batch = events.select(
            "src", "dst",
            F.when(F.col("op") > 0, F.lit("ins")).otherwise(F.lit("del"))
            .alias("op"),
        ).localCheckpoint(eager=True)
        if batch.isEmpty():
            return self.last
        old_graph = self.graph
        try:
            new_graph, new_dense = apply_batch_dense(
                old_graph, self.dense, batch)
        except DenseIdSpaceError:
            # a crawl stream discovering a NEW page is the normal case for
            # a web graph: fall back to the full rebuild instead of killing
            # the streaming query (same contract as IncrementalPageRank)
            new_graph = apply_batch(old_graph, batch)
            new_dense = DenseGraph(new_graph).materialize()
        # frontier seed from the changed sources (the keys whose state the
        # tracker updated): out-neighbors of deletion sources in the OLD
        # graph, insertion sources in the NEW — the shared helper, not a
        # second copy of its semantics. A GROWN vertex set invalidates
        # frontier pruning entirely: the teleport term (1-d)/n changed for
        # EVERY vertex, so re-rank naive-dynamic (init=prev ranks, full
        # sweep) instead — batch endpoints alone would leave the global
        # perturbation unpropagated.
        frontier = (None
                    if new_graph.num_vertices != old_graph.num_vertices
                    else batch_endpoints_frontier(old_graph, new_graph,
                                                  batch))
        res = pagerank_arrow(
            new_graph, self.opts, init=self.ranks, frontier=frontier,
            dense=new_dense, resident=True,
        )
        self.graph, self.dense, self.ranks = new_graph, new_dense, res.ranks
        self.last = res
        self.summaries.append(dict(iterations=res.iterations, err=res.err))
        return res


def stream_rerank(
    spark: SparkSession,
    event_dir: str,
    engine: StreamingReRank,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Run the full pipeline as ONE streaming query: file-sourced edge
    events -> stateful degree tracking -> foreachBatch incremental re-rank.
    One file per micro-batch (event order matters across batches). Returns
    the StreamingQuery. ``checkpoint_dir`` must NOT live inside
    ``event_dir`` (the file source lists it recursively)."""
    import os

    cp = os.path.abspath(checkpoint_dir)
    ev = os.path.abspath(event_dir)
    if cp == ev or cp.startswith(ev + os.sep):
        raise ValueError(
            "checkpoint_dir must be a sibling of event_dir, not inside it "
            "(the file stream's recursive listing would pick up state files)")
    stream = (
        spark.readStream.schema(EDGE_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(event_dir)
    )
    annotated = streaming_edge_degree_state(stream)

    def handle(df: DataFrame, batch_id: int) -> None:
        engine.handle(df, batch_id)

    writer = (
        annotated.writeStream.outputMode("update")
        .foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
