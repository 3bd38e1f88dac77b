from .batches import (  # noqa: F401
    BATCH_SCHEMA,
    IncrementalPageRank,
    stream_batches,
)
from .dedup import streaming_exact_dedup  # noqa: F401
from .joins import interval_attribution  # noqa: F401
from .pipeline import (  # noqa: F401
    EDGE_EVENT_SCHEMA,
    StreamingReRank,
    stream_rerank,
    streaming_edge_degree_state,
)
from .state import (  # noqa: F401
    DEGREE_STATE_SCHEMA,
    streaming_degree_state,
)
from .windows import sessionized_event_counts, windowed_event_counts  # noqa: F401
