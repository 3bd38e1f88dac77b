"""Custom stateful streaming operator: per-vertex degree/frontier state.

The reference engine's "dynamic" mode applies discrete edge batches and
re-ranks only the affected vertices (``/root/reference/src/main.cxx``
batch loop; frontier seeding in ``src/pagerankBarrierfree.hxx:300-330``).
This module is the continuous-stream analogue of the batch bookkeeping: a
stateful operator (``applyInPandasWithState``) that maintains each source
vertex's running out-degree over an unbounded stream of edge events
(insertions ``op=+1`` / deletions ``op=-1``) and emits, per micro-batch,
the vertices whose degree changed together with the change magnitude.

The emitted rows are the scatter side of a dynamic-frontier seed: the
sources whose out-degree changed are exactly the vertices whose outgoing
contribution must be re-scattered (``pagerank_dynamic_frontier`` seeds
from batch src AND dst endpoints; the dst half needs no state and comes
straight off the raw event stream). ``stream -> degree state ->
incremental re-rank`` therefore composes without a full graph rescan per
micro-batch.

Scale shape: state is one (long, long, long) triple per DISTINCT source
vertex — O(V) across the cluster, hash-partitioned by Spark's streaming
state store on the group key, Arrow-batched in and out of Python. No
per-row Python: each group's micro-batch slice arrives as a pandas
DataFrame and is reduced with vectorized ops.

Semantics note: ``out_degree`` is the SIGNED EVENT SUM (Σ op), not the
graph's set-semantics degree — the tracker holds no edge set, so a
duplicate insertion counts twice (the graph dedupes to one edge) and a
deletion of an absent edge decrements (the graph treats it as a no-op,
and the sum can go negative). That is sufficient for its job here —
"did this source change this micro-batch" seeds the frontier — but do
not use the emitted value as the graph's out-degree; read
``operators.degrees`` off the maintained graph for that.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

# Output: one row per (micro-batch, source vertex) whose state changed.
DEGREE_STATE_SCHEMA = StructType([
    StructField("src", LongType(), False),
    StructField("out_degree", LongType(), False),   # running total
    StructField("delta", LongType(), False),        # this micro-batch's net change
    StructField("events", LongType(), False),       # lifetime event count
])

# State per source vertex: (out_degree, events).
_STATE_SCHEMA = StructType([
    StructField("out_degree", LongType(), False),
    StructField("events", LongType(), False),
])


def _update_degree_state(
    key: Tuple,
    pdf_iter: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold one group's micro-batch slice into its running degree.

    Runs on executors; the slice arrives as Arrow-batched pandas frames.
    Vectorized sum over the ``op`` column — no per-row Python loop.
    """
    delta = 0
    events = 0
    for pdf in pdf_iter:
        delta += int(pdf["op"].sum())
        events += len(pdf)
    if state.exists:
        deg0, ev0 = state.get
    else:
        deg0, ev0 = 0, 0
    deg = deg0 + delta
    state.update((deg, ev0 + events))
    # Emit whenever the group was TOUCHED (events > 0), not only when the
    # net degree moved: a batch like [(u,+1),(u,-1)] leaves deg(u) unchanged
    # but u's out-neighborhood DID change, and the frontier contract
    # (re-scatter every source whose edge set changed) must include u.
    if events > 0:
        yield pd.DataFrame({
            "src": [key[0]],
            "out_degree": [deg],
            "delta": [delta],
            "events": [ev0 + events],
        })


def streaming_degree_state(
    edge_events: DataFrame,
    src_col: str = "src",
    op_col: str = "op",
) -> DataFrame:
    """Per-source-vertex running out-degree over a stream of edge events.

    ``edge_events`` is a streaming DataFrame with at least (``src_col``
    long, ``op_col`` long) where op is +1 for an inserted out-edge and -1
    for a removed one. Emits (src, out_degree, delta, events) in UPDATE
    mode for every vertex that saw any edge event in the micro-batch
    (including net-zero batches — the edge SET changed even when the
    degree didn't) — the frontier seed for incremental re-ranking.

    State never times out: a web-graph vertex stays live for the lifetime
    of the stream (degree must survive arbitrarily long quiet periods).
    Bound is O(distinct src), the same bound as the graph itself.
    """
    cols = [src_col, op_col]
    df = edge_events.select(*cols)
    if src_col != "src":
        df = df.withColumnRenamed(src_col, "src")
    if op_col != "op":
        df = df.withColumnRenamed(op_col, "op")
    return df.groupBy("src").applyInPandasWithState(
        _update_degree_state,
        outputStructType=DEGREE_STATE_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
