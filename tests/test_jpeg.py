"""From-scratch baseline JPEG codec tests (sciscraper_ray/stages/jpeg.py)."""
import numpy as np
import pytest

from sciscraper_ray.stages.jpeg import (
    JpegError,
    decode_jpeg,
    encode_jpeg,
)


def _grad(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.clip(xx * 2 + yy, 0, 255).astype(np.uint8)


def test_constant_gray_dc_roundtrip_formula():
    # constant image -> DC-only blocks -> exactly predictable round trip
    for v in (0, 7, 63, 128, 129, 200, 255):
        img = np.full((16, 24), v, np.uint8)
        out = decode_jpeg(encode_jpeg(img))
        x = 8 * (v - 128) / 16.0
        dc = np.trunc(x + (0.5 if x > 0 else -0.5 if x < 0 else 0))
        exp = min(255, max(0, int(np.floor(16 * dc / 8 + 128 + 0.5))))
        assert out.shape == (16, 24)
        assert (out == exp).all(), (v, np.unique(out), exp)


def test_smooth_gradient_psnr():
    img = _grad(40, 56)
    out = decode_jpeg(encode_jpeg(img))
    err = np.abs(out.astype(int) - img.astype(int))
    assert out.shape == img.shape
    assert err.max() <= 8 and err.mean() < 2


def test_odd_dimensions_crop_back():
    img = _grad(37, 51)
    out = decode_jpeg(encode_jpeg(img))
    assert out.shape == (37, 51)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 8


def test_rgb_444_and_420():
    yy, xx = np.mgrid[0:32, 0:48]
    rgb = np.stack(
        [np.clip(xx * 3, 0, 255), np.clip(yy * 4, 0, 255), np.full_like(xx, 90)],
        -1,
    ).astype(np.uint8)
    o444 = decode_jpeg(encode_jpeg(rgb))
    assert o444.shape == rgb.shape
    assert np.abs(o444.astype(int) - rgb.astype(int)).max() <= 12
    o420 = decode_jpeg(encode_jpeg(rgb, subsample="420"))
    assert o420.shape == rgb.shape
    # chroma is subsampled: luma stays tight, chroma channels looser
    assert np.abs(o420.astype(int) - rgb.astype(int)).max() <= 24


def test_restart_markers():
    img = _grad(24, 80)  # 30 MCUs
    payload = encode_jpeg(img, restart_interval=4)
    assert b"\xff\xdd" in payload  # DRI present
    assert b"\xff\xd0" in payload  # at least one RST0
    out = decode_jpeg(payload)
    ref = decode_jpeg(encode_jpeg(img))
    # restart segmentation must not change decoded pixels
    assert (out == ref).all()


def test_high_detail_exercises_ac_and_zrl():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(32, 32), dtype=np.int64).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img))  # noise: just must round-trip legally
    assert out.shape == img.shape


def test_error_paths():
    img = np.full((8, 8), 50, np.uint8)
    good = encode_jpeg(img)
    with pytest.raises(JpegError, match="SOI"):
        decode_jpeg(b"\x89PNG" + good)
    with pytest.raises(JpegError):
        decode_jpeg(good[:30])  # truncated mid-segment
    # progressive SOF2 rejected explicitly
    bad = bytearray(good)
    i = bad.find(b"\xff\xc0")
    bad[i + 1] = 0xC2
    with pytest.raises(JpegError, match="non-baseline"):
        decode_jpeg(bytes(bad))


def test_decode_image_payload_routes_jpeg():
    from sciscraper_ray.stages.multimodal import decode_image_payload

    img = np.full((8, 16), 200, np.uint8)
    arr, status = decode_image_payload(encode_jpeg(img))
    assert status == "ok"
    assert arr.shape == (8, 16, 1)
    assert (arr == 200).all()
