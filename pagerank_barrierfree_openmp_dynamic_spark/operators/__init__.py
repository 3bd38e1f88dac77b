from .graph import LinkGraph, build_graph  # noqa: F401
from .batch import apply_batch, graph_diff  # noqa: F401
from .norms import l1_norm, l2_norm, li_norm  # noqa: F401
from .degrees import graph_stats, in_degrees, out_degrees, top_k  # noqa: F401
