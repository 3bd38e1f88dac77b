"""Streaming count-min sketch — bounded-state frequency counting over an
unbounded key stream.

Exact streaming counts (watermarked ``groupBy(key).count()``) carry
O(distinct keys) state — unbounded on a web event stream. The count-min
sketch caps state at exactly ``depth`` groups × a ``width`` int array,
REGARDLESS of the key space, while never underestimating any key's
count (``functions/sketch.py`` is the batch twin; the hashes are the
same portable LCG family, so streaming and batch sketches are
mergeable by addition and a paused stream's sketch equals the batch
build over everything it consumed — pinned by the test).

Shape: a stateless projection explodes each event into its ``depth``
(row, bucket) probes (the same expression as ``cms_build``), then ONE
``applyInPandasWithState`` keyed by sketch row folds bucket counts into
a width-long int64 array with a vectorized ``np.add.at`` — no per-row
Python, state exactly ``depth`` rows. Each micro-batch emits the
touched rows' full arrays in UPDATE mode; downstream consumers read the
latest emission per row as the live sketch.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.sketch import _P, _hash_params

SKETCH_STATE_SCHEMA = "row int, counts array<long>"
_ROW_STATE_SCHEMA = "counts array<long>"


def _make_update(width: int):
    def _update(
        key: Tuple,
        pdf_iter: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        counts = (np.array(state.get[0], dtype=np.int64)
                  if state.exists else np.zeros(width, dtype=np.int64))
        touched = False
        for pdf in pdf_iter:
            b = pdf["bucket"].to_numpy()
            if len(b):
                touched = True
                np.add.at(counts, b, 1)
        if touched:
            state.update((counts.tolist(),))
            yield pd.DataFrame({"row": [key[0]],
                                "counts": [counts.tolist()]})

    return _update


def streaming_cms(
    events: DataFrame,
    col: str,
    width: int = 1024,
    depth: int = 4,
    seed: int = 7,
) -> DataFrame:
    """Live count-min sketch of a streaming integer column. Emits
    ``(row, counts array<long>)`` in UPDATE mode for every sketch row
    touched by the micro-batch; state is exactly ``depth`` rows of
    ``width`` int64 each, independent of the key space."""
    x = F.col(col).cast("long")
    probes = None
    for i, (a, b) in enumerate(_hash_params(depth, seed)):
        p = events.select(
            F.lit(i).alias("row"),
            F.pmod((x * F.lit(a) + F.lit(b)) % F.lit(_P),
                   F.lit(width)).alias("bucket"),
        )
        probes = p if probes is None else probes.unionByName(p)
    return probes.groupBy("row").applyInPandasWithState(
        _make_update(width),
        outputStructType=SKETCH_STATE_SCHEMA,
        stateStructType=_ROW_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
