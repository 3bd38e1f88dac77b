from .pagerank import (  # noqa: F401
    PageRankOptions,
    PageRankResult,
    pagerank,
    pagerank_dynamic_frontier,
)
from .pagerank_arrow import DenseGraph, pagerank_arrow, resume_arrow  # noqa: F401
from .traversal import pagerank_dynamic_traversal, reachable_set  # noqa: F401
from .components import connected_components  # noqa: F401
from .labelprop import label_propagation  # noqa: F401
from .triangles import triangle_count, triangles_per_vertex  # noqa: F401
