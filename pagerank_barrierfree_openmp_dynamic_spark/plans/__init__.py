from .pagerank import (  # noqa: F401
    PageRankOptions,
    PageRankResult,
    pagerank,
    pagerank_dynamic_frontier,
)
from .pagerank_arrow import DenseGraph, pagerank_arrow, resume_arrow  # noqa: F401
from .traversal import pagerank_dynamic_traversal, reachable_set  # noqa: F401
from .components import (  # noqa: F401
    connected_components,
    connected_components_arrow,
    connected_components_dynamic,
    resume_connected_components_arrow,
)
from .labelprop import (  # noqa: F401
    label_propagation,
    label_propagation_arrow,
    resume_label_propagation_arrow,
)
from .triangles import (  # noqa: F401
    four_cycle_count,
    triangle_count,
    triangle_count_incremental,
    triangles_per_vertex,
)
from .centrality import (  # noqa: F401
    eigenvector_centrality,
    katz_centrality,
)
from .truss import ktruss, ktruss_peel  # noqa: F401
from .trustrank import (  # noqa: F401
    inverse_pagerank,
    select_seeds,
    spam_mass,
    trustrank,
)
from .msf import (  # noqa: F401
    minimum_spanning_forest,
    msf_weight_by_component,
)
