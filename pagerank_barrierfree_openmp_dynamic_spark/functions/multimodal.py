"""Multimodal columns: image/audio/video as opaque ``binary`` with typed
metadata. The Spark-side plumbing (schemas, partitioning, ``mapInPandas``
batch shape, Arrow transfer) is real and tested; the actual codec work is
stubbed — the decode libraries (PIL/ffmpeg/soundfile) are not in this
container, so each codec call goes through ``_codec`` which raises
``NotImplementedError`` unless ``fake=True`` substitutes a deterministic
fake (seeded from the content hash) with the correct output shape.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),   # images/video
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),  # audio/video
    ]
)

FEATURES_SCHEMA = "media_id long, feature array<float>, n_bytes long"
FRAMES_SCHEMA = "media_id long, frame_idx int, frame binary"


def _codec(payload: bytes, op: str, fake: bool) -> str:
    """STUB: real decoders are not available in this container. Returns the
    payload's md5 hexdigest — the seed of every deterministic fake output."""
    if not fake:
        raise NotImplementedError(
            f"media codec {op!r} requires image/audio libraries not present "
            "in this environment; pass fake=True for the deterministic stub"
        )
    return hashlib.md5(payload).hexdigest()


def _fake_rng(hexdigest: str) -> np.random.Generator:
    return np.random.default_rng(int(hexdigest[:8], 16))


def fake_feature(hexdigest: str, dim: int) -> np.ndarray:
    """Deterministic fake feature vector from the payload's md5 hexdigest:
    ``f[j] = ((ascii(hex[2j]) * 31 + ascii(hex[2j+1])) % 1000) / 1000`` —
    chosen to be expressible in ANSI SQL (ascii/substring/modulo) so the
    driver's DuckDB oracle can reproduce it exactly; see
    ``__spark_entry__.oracle_sql()['media_features']``."""
    h = hexdigest
    return np.array(
        [((ord(h[(2 * j) % 32]) * 31 + ord(h[(2 * j + 1) % 32])) % 1000) / 1000.0
         for j in range(dim)],
        dtype=np.float32,
    )


def extract_features(media: DataFrame, dim: int = 16, fake: bool = True) -> DataFrame:
    """Decode + feature-extract each payload into a ``dim``-float vector.

    Arrow-batched ``mapInPandas``; the fake path derives the vector
    deterministically from the payload hash so downstream plumbing
    (similarity joins over media features) is fully testable.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats, sizes = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                raw = bytes(payload)
                h = _codec(raw, "feature", fake)
                ids.append(mid)
                feats.append(fake_feature(h, dim))
                sizes.append(len(raw))
            yield pd.DataFrame({"media_id": ids, "feature": feats, "n_bytes": sizes})

    return media.select("media_id", "payload").mapInPandas(fn, schema=FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000, fake: bool = True) -> DataFrame:
    """Frame-sample video payloads: one fake frame per ``every_ms`` of
    duration (bounded at 32). Output partitioning follows the input — no
    shuffle; frame explosion happens inside the Arrow batch."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, kind, payload, dur in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"], pdf["duration_ms"]
            ):
                if payload is None or kind != "video":
                    continue
                raw = bytes(payload)
                n = min(32, max(1, int((dur or 0) // every_ms)))
                rng = _fake_rng(_codec(raw, "frame", fake))
                for i in range(n):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(rng.integers(0, 256, 64, dtype=np.uint8).tobytes())
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return media.select("media_id", "kind", "payload", "duration_ms").mapInPandas(
        fn, schema=FRAMES_SCHEMA
    )


def resize_images(media: DataFrame, width: int = 64, height: int = 64,
                  fake: bool = True) -> DataFrame:
    """Resize image payloads (stubbed decode); schema-preserving transform."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            payloads = []
            for kind, payload in zip(pdf["kind"], pdf["payload"]):
                if payload is None or kind != "image":
                    payloads.append(payload)
                    continue
                rng = _fake_rng(_codec(bytes(payload), "resize", fake))
                payloads.append(rng.integers(0, 256, width * height, dtype=np.uint8).tobytes())
            out["payload"] = payloads
            out["width"] = width
            out["height"] = height
            yield out

    return media.mapInPandas(fn, schema=media.schema)


def media_metadata_stats(media: DataFrame) -> DataFrame:
    """Typed-metadata aggregation — pure JVM (no decode): per kind, count,
    total payload bytes, avg duration."""
    return media.groupBy("kind").agg(
        F.count("*").alias("n"),
        F.sum(F.length("payload")).alias("total_bytes"),
        F.round(F.avg("duration_ms"), 3).alias("avg_duration_ms"),
    )
