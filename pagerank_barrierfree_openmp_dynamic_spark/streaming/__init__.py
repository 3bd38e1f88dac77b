from .batches import (  # noqa: F401
    BATCH_SCHEMA,
    IncrementalPageRank,
    stream_batches,
)
from .windows import windowed_event_counts  # noqa: F401
