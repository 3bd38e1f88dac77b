"""Real pure-NumPy BMP/WAV codecs: roundtrips, Spark decode operators,
and the closed-form pattern the driver oracles recompute."""

import numpy as np
import pandas as pd
import pytest

from pagerank_barrierfree_openmp_dynamic_spark.functions.multimodal import (
    audio_stats, decode_bmp, decode_wav, encode_bmp, encode_wav,
    image_stats, resize_images, synth_bmp_media, synth_wav_media)


def test_bmp_roundtrip_exact():
    rng = np.random.default_rng(3)
    for h, w in [(1, 1), (3, 5), (8, 8), (7, 2)]:  # odd widths hit padding
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(px)), px)


def test_wav_roundtrip_exact():
    s = (np.arange(-500, 500, 7)).astype(np.int16)
    rate, back = decode_wav(encode_wav(s, 16000))
    assert rate == 16000
    assert np.array_equal(back, s)


def test_decoders_reject_garbage():
    with pytest.raises(ValueError):
        decode_bmp(b"BM but not really a bitmap header at all.....")
    with pytest.raises(ValueError):
        decode_bmp(b"plain text that merely exists")
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxNOPE")
    # malformed chunks must raise ValueError (not struct.error) so the
    # Spark operators' fallback path catches them
    import struct as _s
    short_fmt = (b"RIFF" + _s.pack("<I", 20) + b"WAVE"
                 + b"fmt " + _s.pack("<I", 4) + b"\x01\x00\x01\x00")
    with pytest.raises(ValueError):
        decode_wav(short_fmt)
    truncated = encode_wav(np.zeros(4, dtype=np.int16), 8000)[:-3]
    with pytest.raises(ValueError):
        decode_wav(truncated)


def test_image_stats_matches_pattern(spark):
    ids = spark.createDataFrame(pd.DataFrame({"doc_id": [0, 1, 5, 42]}))
    media = synth_bmp_media(ids, w=8, h=8)
    got = {r["media_id"]: r for r in image_stats(media).collect()}
    assert set(got) == {0, 1, 5, 42}
    i = np.arange(64, dtype=np.int64)
    for did, r in got.items():
        assert (r["width"], r["height"]) == (8, 8)
        for c, col in enumerate(("mean_r", "mean_g", "mean_b")):
            expect = round(float(np.mean((did * 31 + i * 3 + c * 7) % 256)), 6)
            assert r[col] == expect


def test_audio_stats_matches_pattern(spark):
    ids = spark.createDataFrame(pd.DataFrame({"doc_id": [0, 3, 9]}))
    media = synth_wav_media(ids, n=256, rate=8000)
    got = {r["media_id"]: r for r in audio_stats(media).collect()}
    i = np.arange(256, dtype=np.int64)
    for did, r in got.items():
        assert r["sample_rate"] == 8000 and r["n_samples"] == 256
        s = ((did * 7 + i * 13) % 2048 - 1024).astype(np.float64)
        assert r["rms"] == round(float(np.sqrt(np.mean(s * s))), 6)


def test_resize_real_bmp_nearest_neighbor(spark):
    ids = spark.createDataFrame(pd.DataFrame({"doc_id": [7]}))
    media = synth_bmp_media(ids, w=8, h=8)
    out = resize_images(media, width=4, height=4).collect()[0]
    px = decode_bmp(bytes(out["payload"]))
    assert px.shape == (4, 4, 3)
    src = decode_bmp(bytes(media.collect()[0]["payload"]))
    ys = (np.arange(4) * 8) // 4
    xs = (np.arange(4) * 8) // 4
    assert np.array_equal(px, src[ys][:, xs])
