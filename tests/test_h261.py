"""H.261-class intra codec: round-trip, syntax-element coverage, declared
rejections. Spec anchors: ITU-T H.261 TCOEFF VLC (shared with MPEG-1
Table B.14), rec = q*(2L+1) [-1 when q even], 8-bit intra-DC FLC."""

import numpy as np
import pytest

from sciscraper_ray.stages.h261 import (
    H261Error,
    _dequant_ac,
    _EOB,
    _ESC,
    _TCOEFF,
    decode_h261_intra,
    encode_h261_intra,
)


def _gradient(h, w):
    return ((np.arange(w)[None, :] + 2 * np.arange(h)[:, None]) % 256).astype(
        np.uint8
    )


def test_vlc_table_prefix_free():
    codes = list(_TCOEFF.values()) + [_EOB, _ESC]
    for a in codes:
        for b in codes:
            assert a == b or not b.startswith(a), (a, b)


def test_dequant_reconstruction_rule():
    lv = np.array([3, -3, 0, 1, -1])
    assert list(_dequant_ac(lv, 5)) == [35, -35, 0, 15, -15]  # odd q
    assert list(_dequant_ac(lv, 4)) == [27, -27, 0, 11, -11]  # even q: -1


def test_constant_frames_exact():
    frames = [np.full((144, 176), v, np.uint8) for v in (0, 7, 128, 255)]
    w, h, dec = decode_h261_intra(encode_h261_intra(frames, q=8))
    assert (w, h) == (176, 144) and len(dec) == 4
    for v, d in zip((0, 7, 128, 255), dec):
        # intra-DC index clamps to 1..254: rec = clamp(v, 1, 254)
        assert np.all(d == min(254, max(1, v)))


def test_gradient_roundtrip_within_quant_noise():
    y = _gradient(144, 176)
    for q in (2, 4, 8):
        _, _, d = decode_h261_intra(encode_h261_intra([y], q=q))
        err = np.abs(d[0].astype(int) - y.astype(int))
        # the 255->0 wrap row is a step edge: ringing there scales with
        # quant; elsewhere the error is sub-quant (mean ~1)
        assert err.mean() < 2.0 and err.max() <= 16 * q, q


def test_noise_frame_exercises_escape_path():
    rng = np.random.default_rng(3)
    y = rng.integers(0, 256, (144, 176)).astype(np.uint8)
    bs = encode_h261_intra([y], q=2)
    _, _, d = decode_h261_intra(bs)
    assert np.abs(d[0].astype(int) - y.astype(int)).max() <= 16
    # high-energy noise at low quant must have used 20-bit escapes:
    # every VLC level is <= 15, so levels beyond need ESC
    from sciscraper_ray.stages.jpeg import _fdct_blocks

    blocks = y.reshape(18, 8, 22, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    lv = np.trunc(_fdct_blocks(blocks.astype(float)) / 4.0)
    assert np.abs(lv[:, 1:, :]).max() > 15


def test_cif_and_multiframe():
    c = [np.full((288, 352), 77, np.uint8), np.full((288, 352), 9, np.uint8)]
    w, h, dec = decode_h261_intra(encode_h261_intra(c))
    assert (w, h) == (352, 288)
    assert np.all(dec[0] == 77) and np.all(dec[1] == 9)


def test_declared_rejections():
    with pytest.raises(H261Error, match="declared rejection"):
        encode_h261_intra([np.zeros((100, 100), np.uint8)])
    with pytest.raises(H261Error):
        encode_h261_intra([], q=8)
    with pytest.raises(H261Error):
        encode_h261_intra([np.zeros((144, 176), np.uint8)], q=0)
    with pytest.raises(H261Error):
        decode_h261_intra(b"\x00\x00\x00\x00\xff\xff\xff\xff")
