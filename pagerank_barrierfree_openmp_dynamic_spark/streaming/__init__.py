from .batches import (  # noqa: F401
    BATCH_SCHEMA,
    IncrementalPageRank,
    stream_batches,
)
