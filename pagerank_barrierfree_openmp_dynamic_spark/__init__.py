"""PySpark-native link-graph analytics engine.

A from-scratch Spark engine with the query/data-processing capabilities of
``puzzlef/pagerank-barrierfree-openmp-dynamic`` (reference at
``/root/reference``): link extraction from Common-Crawl-style web pages into a
deduplicated ``(src, dst)`` edge table, damped PageRank with dynamic-frontier
incremental re-ranking after edge-batch updates, connected components, label
propagation, triangle counting — plus the deduplication / similarity /
text-analysis operators a large-scale training-data pipeline needs.

Design: DataFrame/SQL-first so Catalyst plans the physical execution;
Arrow-vectorized (pandas UDF / mapInPandas) kernels only where built-in
operators cannot express the semantics; explicit partitioning, broadcast,
and skew salting for web-graph degree distributions.
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
from .operators.graph import (  # noqa: F401
    LinkGraph,
    build_graph,
    remove_in_edges,
    remove_out_edges,
    remove_vertices,
)
from .plans.pagerank import PageRankOptions, pagerank  # noqa: F401
from .plans.pagerank_arrow import (  # noqa: F401
    DenseGraph,
    dense_state_fits,
    pagerank_arrow,
    pagerank_auto,
)
