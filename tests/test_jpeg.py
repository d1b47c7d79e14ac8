"""Pure-NumPy baseline JPEG codec (pipeline/jpeg.py): round-trips, sampling
modes, container dispatch, and honest failure on unsupported variants."""

from __future__ import annotations

import numpy as np
import pytest

from btrblocks_spark.pipeline.jpeg import decode_jpeg, encode_jpeg
from btrblocks_spark.pipeline.media_codecs import decode_any, sniff


def test_constant_gray_exact():
    img = np.full((16, 24), 130, dtype=np.uint8)
    d = decode_jpeg(encode_jpeg(img))
    assert (d["width"], d["height"]) == (24, 16)
    assert np.array_equal(d["pixels"], img)


def test_per_block_constant_exact():
    # distinct even value per 8x8 block: every DC quantizes losslessly,
    # every AC is zero -> bit-exact decode
    vals = np.arange(12).reshape(3, 4) * 20 + 20
    img = np.kron(vals, np.ones((8, 8))).astype(np.uint8)
    d = decode_jpeg(encode_jpeg(img))
    assert np.array_equal(d["pixels"], img)


def test_gradient_lossy_bounded():
    x = np.linspace(0, 255, 64)
    img = np.tile(x, (32, 1)).astype(np.uint8)
    d = decode_jpeg(encode_jpeg(img))
    err = np.abs(d["pixels"].astype(int) - img.astype(int)).max()
    assert err <= 8  # flat q=16 bounds coefficient error


def test_rgb_444_and_420():
    img = np.zeros((10, 14, 3), dtype=np.uint8)
    img[..., 0], img[..., 1], img[..., 2] = 120, 130, 140
    for subsample in (False, True):
        d = decode_jpeg(encode_jpeg(img, subsample=subsample))
        assert d["pixels"].shape == (10, 14, 3)
        assert np.abs(d["pixels"].astype(int) - img.astype(int)).max() <= 2


def test_odd_dimensions_crop():
    img = np.full((13, 17), 100, dtype=np.uint8)
    d = decode_jpeg(encode_jpeg(img))
    assert d["pixels"].shape == (13, 17)
    assert np.array_equal(d["pixels"], img)


def test_sniff_and_decode_any():
    img = np.full((8, 8), 64, dtype=np.uint8)
    blob = encode_jpeg(img)
    assert sniff(blob) == "jpeg"
    d = decode_any(blob)
    assert d["fmt"] == "jpeg" and d["mean"] == 64.0
    assert (d["width"], d["height"], d["frames"]) == (8, 8, 1)


def test_non_baseline_rejected():
    img = np.full((8, 8), 64, dtype=np.uint8)
    blob = bytearray(encode_jpeg(img))
    i = blob.find(b"\xff\xc0")
    blob[i + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(blob))


def test_not_jpeg_rejected():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01\x02\x03")


def test_avi_mjpeg_roundtrip():
    from btrblocks_spark.pipeline.media_codecs import decode_avi, encode_avi_mjpeg

    frames = [np.full((8, 12), v, dtype=np.uint8) for v in (10, 20, 30, 40)]
    v = decode_avi(encode_avi_mjpeg(frames))
    assert (v["width"], v["height"], v["n_frames"]) == (12, 8, 4)
    for f, orig in zip(v["frames"], frames):
        assert np.array_equal(f, orig)


def test_avi_decode_any():
    from btrblocks_spark.pipeline.media_codecs import decode_any, encode_avi_mjpeg

    frames = [np.full((8, 8), v, dtype=np.uint8) for v in (100, 104)]
    d = decode_any(encode_avi_mjpeg(frames))
    assert d == {"fmt": "avi", "width": 8, "height": 8, "frames": 2, "mean": 102.0}


def test_avi_not_riff_rejected():
    from btrblocks_spark.pipeline.media_codecs import decode_avi

    with pytest.raises(ValueError):
        decode_avi(b"JUNKJUNKJUNKJUNK")


def test_gif_roundtrip_and_interlace_parse():
    from btrblocks_spark.pipeline.media_codecs import decode_gif, encode_gif

    img = np.zeros((6, 9, 3), dtype=np.uint8)
    img[..., 0] = 200
    img[2:4, 3:6, 1] = 99
    d = decode_gif(encode_gif(img))
    assert (d["width"], d["height"], d["n_frames"]) == (9, 6, 1)
    assert np.array_equal(d["frames"][0], img)
    # gray input widens to RGB
    g = np.arange(48, dtype=np.uint8).reshape(6, 8) * 5
    d2 = decode_gif(encode_gif(g))
    assert np.array_equal(d2["frames"][0], np.stack([g] * 3, axis=-1))


def test_gif_too_many_colors_rejected():
    from btrblocks_spark.pipeline.media_codecs import encode_gif

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
    with pytest.raises(ValueError):
        encode_gif(img)


def test_gif_not_gif_rejected():
    from btrblocks_spark.pipeline.media_codecs import decode_gif

    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF")
