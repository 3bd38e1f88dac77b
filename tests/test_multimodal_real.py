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


def test_image_features_histogram(spark):
    from pagerank_barrierfree_openmp_dynamic_spark.functions.multimodal import (
        image_features)

    ids = spark.createDataFrame(pd.DataFrame({"doc_id": [2, 11]}))
    media = synth_bmp_media(ids, w=8, h=8)
    got = {r["media_id"]: np.array(r["feature"])
           for r in image_features(media, dim=16).collect()}
    i = np.arange(64, dtype=np.int64)
    for did in (2, 11):
        px = np.stack([(did * 31 + i * 3 + c * 7) % 256 for c in range(3)],
                      axis=1)
        luma = (px[:, 0] * 299 + px[:, 1] * 587 + px[:, 2] * 114) // 1000
        hist = np.bincount(luma * 16 // 256, minlength=16) / 64
        assert np.allclose(got[did], np.round(hist, 6), atol=1e-6)


def test_run_media_job_end_to_end(spark, tmp_path):
    """jobs/run_media.py: synth -> real decode -> features -> LSH near-dup
    -> thumbnails. ids 256 apart produce identical images (pattern is
    mod-256), so the near-dup stage has planted true positives."""
    import io
    import json
    import sys
    from contextlib import redirect_stdout

    sys.path.insert(0, "/root/repo/jobs")
    import run_media

    out = str(tmp_path / "media_out")
    buf = io.StringIO()
    with redirect_stdout(buf):
        run_media.main(["--output", out, "--synth", "300",
                        "--synth-size", "16", "--thumb", "4x4"])
    rep = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert rep["input"] == 600  # 300 BMPs + 300 WAVs
    assert rep["images_decoded"] == 300 and rep["audio_decoded"] == 300
    assert rep["feature_rows"] == 300
    # ids (k, k+256) for k < 44 are identical images -> >= 44 dup pairs
    assert rep["near_dup_pairs"] >= 44
    assert rep["thumbnails"] == 300
    pairs = spark.read.parquet(out + "_near_dup")
    planted = pairs.filter("b - a = 256")
    assert planted.count() == 44
    assert planted.filter("sim < 1.0").count() == 0
    thumbs = spark.read.parquet(out + "_thumbs").limit(1).collect()[0]
    assert decode_bmp(bytes(thumbs["payload"])).shape == (4, 4, 3)


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
