"""Multimodal columns: image/audio/video as opaque ``binary`` with typed
metadata. The Spark-side plumbing (schemas, partitioning, ``mapInPandas``
batch shape, Arrow transfer) is real and tested.

Codec status (honest split):

- **Real, pure NumPy** — uncompressed 24-bit BI_RGB BMP
  (:func:`decode_bmp`/:func:`encode_bmp`), 16-bit PCM WAV
  (:func:`decode_wav`/:func:`encode_wav`), COMPRESSED 8-bit
  non-interlaced PNG (:func:`decode_png`/:func:`encode_png` — stdlib
  ``zlib`` inflate + vectorized scanline un-filtering for all five
  PNG filter types, CRC-checked chunks; gray/RGB/RGBA color types),
  and baseline JPEG (``functions/jpeg.py`` — SOF0 Huffman sequential,
  gray/YCbCr, 4:4:4/4:2:2/4:2:0 sampling, restart markers; progressive
  and arithmetic flavors raise).  :func:`image_stats`,
  :func:`image_features`, :func:`audio_stats`, and the image path of
  :func:`resize_images` decode these for real via the
  :func:`decode_image` dispatcher.
- **Stubbed** — formats whose decoders need external libraries
  (MP3/video — ffmpeg/soundfile are not in this container): those
  paths go through ``_codec``, which raises ``NotImplementedError``
  unless ``fake=True`` substitutes a deterministic fake (seeded from
  the content hash) with the correct output shape.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
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


# ---------------------------------------------------------------------------
# real codecs (pure NumPy): uncompressed BMP + PCM WAV


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB array -> 24-bit BI_RGB bottom-up BMP bytes."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_bmp expects an (H, W, 3) uint8 array")
    h, w, _ = pixels.shape
    row = w * 3
    stride = (row + 3) & ~3  # rows padded to 4-byte boundaries
    img_size = stride * h
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + img_size, 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size,
                       2835, 2835, 0, 0)
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :row] = pixels[::-1, :, ::-1].reshape(h, row)  # bottom-up BGR
    return header + info + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP bytes -> (H, W, 3) uint8 RGB array. Raises
    ``ValueError`` on anything that is not exactly this format (so callers
    can fall back to the stub path for compressed formats)."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if hdr_size < 40 or planes != 1 or bpp != 24 or compression != 0:
        raise ValueError("only uncompressed 24-bit BI_RGB is supported")
    if w <= 0 or h == 0:
        raise ValueError("bad BMP dimensions")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    if len(payload) < off + stride * h:
        raise ValueError("truncated BMP payload")
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h,
                         offset=off).reshape(h, stride)
    bgr = rows[:, :w * 3].reshape(h, w, 3)
    rgb = bgr[:, :, ::-1]
    return np.ascontiguousarray(rgb if top_down else rgb[::-1])


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """1-D int16 PCM samples -> mono 16-bit RIFF/WAVE bytes."""
    if samples.ndim != 1 or samples.dtype != np.int16:
        raise ValueError("encode_wav expects a 1-D int16 array")
    data = samples.tobytes()
    fmt = struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                      sample_rate * 2, 2, 16)
    return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
            + b"WAVE" + b"fmt " + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """Mono 16-bit PCM RIFF/WAVE bytes -> (sample_rate, int16 samples).
    Raises ``ValueError`` for anything else (compressed audio falls back
    to the stub path)."""
    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, rate, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos:pos + 4], struct.unpack_from("<I", payload,
                                                             pos + 4)[0]
        body = payload[pos + 8:pos + 8 + size]
        if len(body) != size:
            raise ValueError("truncated WAV chunk")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("short fmt chunk")
            audio_fmt, channels, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise ValueError("only mono 16-bit PCM is supported")
        elif cid == b"data":
            if size % 2:
                raise ValueError("odd-length 16-bit PCM data chunk")
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return rate, np.frombuffer(data, dtype=np.int16)


# ---------------------------------------------------------------------------
# real compressed codec (stdlib zlib + pure NumPy): 8-bit PNG
#
# PNG is the one compressed media format decodable without external
# libraries: DEFLATE is stdlib ``zlib``, and scanline de-filtering
# (PNG spec §9, filters None/Sub/Up/Average/Paeth) is plain byte
# arithmetic. Supported: bit depth 8, color types 0 (gray), 2 (RGB),
# 6 (RGBA), no interlace — the shapes synthetic corpora and most
# web screenshots use. Anything else raises ``ValueError`` so callers
# fall back to the stub path, same contract as :func:`decode_bmp`.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor (PNG spec §9.4) over int arrays."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def encode_png(pixels: np.ndarray, filter_type: int | str = 0,
               level: int = 6) -> bytes:
    """uint8 array -> PNG bytes. ``(H, W)``/``(H, W, 1)`` encodes gray,
    ``(H, W, 3)`` RGB, ``(H, W, 4)`` RGBA; 8-bit, non-interlaced.

    ``filter_type``: a fixed PNG filter 0-4 for every scanline, or
    ``"mixed"`` (row ``y`` uses filter ``y % 5``) — useful to exercise
    every decoder path. Filtering is forward-vectorized (the predictor
    reads RECONSTRUCTED bytes, all available at encode time)."""
    if pixels.dtype != np.uint8:
        raise ValueError("encode_png expects a uint8 array")
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    if pixels.ndim != 3 or pixels.shape[2] not in (1, 3, 4):
        raise ValueError("encode_png expects (H, W[, 1|3|4]) uint8")
    h, w, bpp = pixels.shape
    if h <= 0 or w <= 0:
        raise ValueError("bad PNG dimensions")
    ctype = {1: 0, 3: 2, 6: 6, 4: 6}[bpp]
    rows = pixels.reshape(h, w * bpp).astype(np.int64)
    stride = w * bpp
    out = np.empty((h, 1 + stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        f = (y % 5) if filter_type == "mixed" else int(filter_type)
        cur = rows[y]
        left = np.concatenate([np.zeros(bpp, dtype=np.int64), cur[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, dtype=np.int64), prev[:-bpp]])
        if f == 0:
            filt = cur
        elif f == 1:
            filt = cur - left
        elif f == 2:
            filt = cur - prev
        elif f == 3:
            filt = cur - (left + prev) // 2
        elif f == 4:
            filt = cur - _paeth(left, prev, upleft)
        else:
            raise ValueError("PNG filter type must be 0-4 or 'mixed'")
        out[y, 0] = f
        out[y, 1:] = (filt % 256).astype(np.uint8)
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(out.tobytes(), level))
            + _png_chunk(b"IEND", b""))


def decode_png(payload: bytes) -> np.ndarray:
    """8-bit non-interlaced PNG bytes -> (H, W, C) uint8 array (C = 1,
    3 or 4 for gray/RGB/RGBA). CRC-checks every chunk; raises
    ``ValueError`` on any other PNG flavor or a corrupt stream (callers
    fall back to the stub path, same contract as :func:`decode_bmp`).

    Un-filtering: Up is a whole-row vectorized add; Sub is a per-channel
    prefix sum (``cumsum % 256`` on the (w, bpp) view); Average/Paeth
    carry an intra-row sequential dependency, walked byte-at-a-time —
    deliberately over plain Python ints, ~10x faster than ndarray
    scalar ops at this granularity."""
    if len(payload) < 8 or payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = 8, None, []
    while pos + 12 <= len(payload):
        (ln,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + ln]
        if len(data) != ln or pos + 12 + ln > len(payload):
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + ln)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError("PNG chunk CRC mismatch")
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None or len(ihdr) != 13 or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    w, h, depth, ctype_, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError("only 8-bit non-interlaced PNG is supported")
    bpp = _PNG_CHANNELS.get(ctype_)
    if bpp is None:
        raise ValueError("only gray/RGB/RGBA PNG color types are supported")
    if w <= 0 or h <= 0:
        raise ValueError("bad PNG dimensions")
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise ValueError(f"bad PNG IDAT stream: {e}") from None
    stride = w * bpp
    if len(raw) != h * (1 + stride):
        raise ValueError("PNG scanline data has wrong length")
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + stride)
    filters, rows = arr[:, 0], arr[:, 1:].astype(np.int64)
    recon = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        f, row = int(filters[y]), rows[y]
        if f == 0:
            cur = row
        elif f == 1:
            cur = np.cumsum(row.reshape(w, bpp), axis=0).reshape(stride) % 256
        elif f == 2:
            cur = (row + prev) % 256
        elif f in (3, 4):
            row_l, prev_l = row.tolist(), prev.tolist()
            cur_l = [0] * stride
            if f == 3:
                for x in range(stride):
                    a = cur_l[x - bpp] if x >= bpp else 0
                    cur_l[x] = (row_l[x] + (a + prev_l[x]) // 2) & 0xFF
            else:
                for x in range(stride):
                    a = cur_l[x - bpp] if x >= bpp else 0
                    b = prev_l[x]
                    c = prev_l[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa = p - a if p >= a else a - p
                    pb = p - b if p >= b else b - p
                    pc = p - c if p >= c else c - p
                    pred = (a if (pa <= pb and pa <= pc)
                            else (b if pb <= pc else c))
                    cur_l[x] = (row_l[x] + pred) & 0xFF
            cur = np.array(cur_l, dtype=np.int64)
        else:
            raise ValueError("bad PNG filter byte")
        recon[y] = cur.astype(np.uint8)
        prev = cur
    return recon.reshape(h, w, bpp)


def decode_image(payload: bytes) -> np.ndarray:
    """Dispatch to the real image decoders (BMP, PNG, baseline JPEG) and
    normalize to (H, W, 3) uint8 RGB: grayscale is replicated across
    channels, RGBA drops alpha. Raises ``ValueError`` when no real
    decoder matches (progressive JPEG etc. — the stubbed flavors)."""
    # dispatch on the container magic so a corrupted-but-identified file
    # (e.g. valid PNG signature, bad CRC/IDAT) surfaces its own decoder's
    # error instead of a misleading "not a JPEG payload" from the last
    # fallback in a try-chain
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        px = decode_png(payload)
    else:
        from .jpeg import decode_jpeg

        px = decode_jpeg(payload)  # ValueError propagates: no real decoder
    if px.shape[2] == 1:
        return np.ascontiguousarray(np.repeat(px, 3, axis=2))
    if px.shape[2] == 4:
        return np.ascontiguousarray(px[:, :, :3])
    return px


def _codec(payload: bytes, op: str, fake: bool) -> str:
    """STUB for COMPRESSED formats only (see :func:`decode_bmp` /
    :func:`decode_wav` for the real paths): the decode libraries are not
    available in this container. Returns the payload's md5 hexdigest —
    the seed of every deterministic fake output."""
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
            # explicit dtypes so an all-null batch can't let pandas infer
            # float64 for the list column (Arrow can't cast that)
            yield pd.DataFrame({
                "media_id": pd.Series(ids, dtype="int64"),
                "feature": pd.Series(feats, dtype="object"),
                "n_bytes": pd.Series(sizes, dtype="int64")})

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
    """Resize image payloads; schema-preserving transform.

    BMP and PNG payloads are resized FOR REAL (decode ->
    nearest-neighbor index resize, a vectorized fancy-index ->
    re-encode in the SAME container AND the same color type: PNGs are
    decoded with :func:`decode_png` directly so a gray PNG stays
    1-channel gray and an RGBA PNG keeps its alpha plane —
    :func:`decode_image`'s RGB normalization is for the stats/feature
    paths only); other image formats fall back to the stub path
    (deterministic fake bytes, or ``NotImplementedError`` when
    ``fake=False``)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            payloads = []
            for kind, payload in zip(pdf["kind"], pdf["payload"]):
                if payload is None or kind != "image":
                    payloads.append(payload)
                    continue
                raw = bytes(payload)
                try:
                    if raw[:8] == _PNG_SIG:
                        px, enc = decode_png(raw), encode_png
                    elif raw[:2] == b"\xff\xd8":
                        from .jpeg import decode_jpeg, encode_jpeg

                        px = decode_jpeg(raw)  # gray stays (H, W, 1)
                        enc = lambda p: encode_jpeg(p, quality=95)  # noqa: E731
                    else:
                        px, enc = decode_bmp(raw), encode_bmp
                    ys = (np.arange(height) * px.shape[0]) // height
                    xs = (np.arange(width) * px.shape[1]) // width
                    small = np.ascontiguousarray(px[ys][:, xs])
                    payloads.append(enc(small))
                    continue
                except ValueError:
                    pass
                rng = _fake_rng(_codec(raw, "resize", fake))
                payloads.append(rng.integers(0, 256, width * height, dtype=np.uint8).tobytes())
            out["payload"] = payloads
            out["width"] = width
            out["height"] = height
            yield out

    return media.mapInPandas(fn, schema=media.schema)


IMAGE_STATS_SCHEMA = ("media_id long, width int, height int, "
                      "mean_r double, mean_g double, mean_b double")
AUDIO_STATS_SCHEMA = ("media_id long, sample_rate int, n_samples long, "
                      "rms double")


def image_stats(media: DataFrame) -> DataFrame:
    """REAL decode: per BMP/PNG image payload, dimensions and
    per-channel pixel means (rounded to 6 dp — exact: the sum of <=2^24
    uint8 values divided by a power-of-two-free count is computed
    identically in any IEEE double engine). Payloads with no real
    decoder (the stubbed compressed formats) are skipped."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, mr, mg, mb = [], [], [], [], [], []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"],
                                          pdf["payload"]):
                if payload is None or kind != "image":
                    continue
                try:
                    px = decode_image(bytes(payload))
                except ValueError:
                    continue
                means = px.reshape(-1, 3).mean(axis=0, dtype=np.float64)
                ids.append(mid)
                hs.append(px.shape[0])
                ws.append(px.shape[1])
                mr.append(round(float(means[0]), 6))
                mg.append(round(float(means[1]), 6))
                mb.append(round(float(means[2]), 6))
            yield pd.DataFrame({"media_id": ids, "width": ws, "height": hs,
                                "mean_r": mr, "mean_g": mg, "mean_b": mb})

    return media.select("media_id", "kind", "payload").mapInPandas(
        fn, schema=IMAGE_STATS_SCHEMA)


def audio_stats(media: DataFrame) -> DataFrame:
    """REAL decode: per WAV payload, sample rate, sample count, and RMS
    amplitude (rounded to 6 dp). Non-WAV payloads are skipped."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, rates, ns, rms = [], [], [], []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"],
                                          pdf["payload"]):
                if payload is None or kind != "audio":
                    continue
                try:
                    rate, samples = decode_wav(bytes(payload))
                except ValueError:
                    continue
                ids.append(mid)
                rates.append(rate)
                ns.append(len(samples))
                s = samples.astype(np.float64)
                rms.append(round(float(np.sqrt(np.mean(s * s))), 6)
                           if len(s) else 0.0)
            yield pd.DataFrame({"media_id": ids, "sample_rate": rates,
                                "n_samples": ns, "rms": rms})

    return media.select("media_id", "kind", "payload").mapInPandas(
        fn, schema=AUDIO_STATS_SCHEMA)


def image_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """REAL decode: per BMP/PNG image, a ``dim``-bin normalized
    grayscale histogram (integer luma ``(299r + 587g + 114b) // 1000``,
    bins ``luma * dim // 256``) — a genuine content feature usable for
    embedding near-dup / ANN joins downstream. Rounded to 6 dp.
    Payloads with no real decoder are skipped (stubbed formats)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats, sizes = [], [], []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"],
                                          pdf["payload"]):
                if payload is None or kind != "image":
                    continue
                raw = bytes(payload)
                try:
                    px = decode_image(raw)
                except ValueError:
                    continue
                flat = px.reshape(-1, 3).astype(np.int64)
                luma = (flat[:, 0] * 299 + flat[:, 1] * 587
                        + flat[:, 2] * 114) // 1000
                hist = np.bincount(luma * dim // 256, minlength=dim)
                ids.append(mid)
                feats.append(np.round(hist / len(luma), 6).astype(np.float32))
                sizes.append(len(raw))
            # explicit dtypes: an EMPTY batch (e.g. all-audio) must not let
            # pandas infer float64 for the list column — Arrow can't cast
            # an empty float64 ndarray to list<float>
            yield pd.DataFrame({
                "media_id": pd.Series(ids, dtype="int64"),
                "feature": pd.Series(feats, dtype="object"),
                "n_bytes": pd.Series(sizes, dtype="int64")})

    return media.select("media_id", "kind", "payload").mapInPandas(
        fn, schema=FEATURES_SCHEMA)


def synth_bmp_media(ids: DataFrame, id_col: str = "doc_id",
                    w: int = 8, h: int = 8) -> DataFrame:
    """Deterministic REAL-BMP media table from an id column: pixel
    ``(y, x, c) = (id*31 + (y*w + x)*3 + c*7) mod 256``. The pattern is
    plain arithmetic so an independent SQL engine can recompute any
    pixel statistic in closed form WITHOUT a decoder — that is what the
    driver's ``image_stats`` DuckDB oracle does."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        i = np.arange(h * w * 3, dtype=np.int64)
        for pdf in batches:
            ids_, payloads = [], []
            for did in pdf[id_col]:
                px = ((int(did) * 31 + (i // 3) * 3 + (i % 3) * 7) % 256)
                payloads.append(encode_bmp(
                    px.astype(np.uint8).reshape(h, w, 3)))
                ids_.append(did)
            k = len(ids_)
            yield pd.DataFrame({
                "media_id": ids_, "kind": ["image"] * k,
                "payload": payloads, "mime": ["image/bmp"] * k,
                "width": [w] * k, "height": [h] * k,
                "duration_ms": [None] * k})

    return ids.select(id_col).mapInPandas(fn, schema=MEDIA_SCHEMA)


def synth_png_media(ids: DataFrame, id_col: str = "doc_id",
                    w: int = 8, h: int = 8) -> DataFrame:
    """Deterministic REAL-PNG media table from an id column — the same
    closed-form pixel pattern as :func:`synth_bmp_media`
    (``(id*31 + (y*w + x)*3 + c*7) mod 256``) but DEFLATE-compressed
    through :func:`encode_png` with MIXED scanline filters (row ``y``
    uses filter ``y % 5``), so decoding exercises every un-filter path.
    The driver's DuckDB oracle recomputes pixel statistics from the
    formula without ever touching a decoder."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        i = np.arange(h * w * 3, dtype=np.int64)
        for pdf in batches:
            ids_, payloads = [], []
            for did in pdf[id_col]:
                px = ((int(did) * 31 + (i // 3) * 3 + (i % 3) * 7) % 256)
                payloads.append(encode_png(
                    px.astype(np.uint8).reshape(h, w, 3),
                    filter_type="mixed"))
                ids_.append(did)
            k = len(ids_)
            yield pd.DataFrame({
                "media_id": ids_, "kind": ["image"] * k,
                "payload": payloads, "mime": ["image/png"] * k,
                "width": [w] * k, "height": [h] * k,
                "duration_ms": [None] * k})

    return ids.select(id_col).mapInPandas(fn, schema=MEDIA_SCHEMA)


def synth_jpeg_media(ids: DataFrame, id_col: str = "doc_id",
                     w: int = 16, h: int = 16) -> DataFrame:
    """Deterministic REAL-JPEG media table from an id column: per-8x8-
    block FLAT grayscale (block ``b`` has value ``(id*37 + b*11) mod
    256``) encoded at quality 100 with a restart marker every 2 MCUs.

    Why flat blocks: the DCT of a constant block is a lone DC
    coefficient and the quality-100 quantizers are all ones, so the
    baseline JPEG round-trip is EXACT — the driver's ``jpeg_image_stats``
    DuckDB oracle recomputes the decoded per-channel means from the
    block formula in closed form, the same oracle pattern as
    :func:`synth_png_media`, while the decode exercises the Huffman,
    DC-prediction, IDCT, and restart-resync paths for real."""
    from .jpeg import encode_jpeg

    if w % 8 or h % 8:
        raise ValueError("synth_jpeg_media needs 8-aligned dimensions "
                         "(flat-block exactness argument)")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        by, bx = h // 8, w // 8
        bidx = (np.arange(h)[:, None] // 8) * bx + (np.arange(w)[None, :] // 8)
        for pdf in batches:
            ids_, payloads = [], []
            for did in pdf[id_col]:
                px = ((int(did) * 37 + bidx * 11) % 256).astype(np.uint8)
                payloads.append(encode_jpeg(px, quality=100,
                                            restart_interval=2))
                ids_.append(did)
            k = len(ids_)
            yield pd.DataFrame({
                "media_id": ids_, "kind": ["image"] * k,
                "payload": payloads, "mime": ["image/jpeg"] * k,
                "width": [w] * k, "height": [h] * k,
                "duration_ms": [None] * k})

    return ids.select(id_col).mapInPandas(fn, schema=MEDIA_SCHEMA)


def synth_wav_media(ids: DataFrame, id_col: str = "doc_id",
                    n: int = 256, rate: int = 8000) -> DataFrame:
    """Deterministic REAL-WAV media table from an id column: sample
    ``s[i] = (id*7 + i*13) mod 2048 - 1024`` (int16). Same closed-form
    idea as :func:`synth_bmp_media` — the ``audio_stats`` oracle
    recomputes the RMS from the formula, never touching bytes."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        i = np.arange(n, dtype=np.int64)
        for pdf in batches:
            ids_, payloads = [], []
            for did in pdf[id_col]:
                s = ((int(did) * 7 + i * 13) % 2048 - 1024).astype(np.int16)
                payloads.append(encode_wav(s, rate))
                ids_.append(did)
            k = len(ids_)
            yield pd.DataFrame({
                "media_id": ids_, "kind": ["audio"] * k,
                "payload": payloads, "mime": ["audio/wav"] * k,
                "width": [None] * k, "height": [None] * k,
                "duration_ms": [int(n * 1000 / rate)] * k})

    return ids.select(id_col).mapInPandas(fn, schema=MEDIA_SCHEMA)


def media_metadata_stats(media: DataFrame) -> DataFrame:
    """Typed-metadata aggregation — pure JVM (no decode): per kind, count,
    total payload bytes, avg duration."""
    return media.groupBy("kind").agg(
        F.count("*").alias("n"),
        F.sum(F.length("payload")).alias("total_bytes"),
        F.round(F.avg("duration_ms"), 3).alias("avg_duration_ms"),
    )
