"""From-scratch GIF codec: LZW round-trips (width growth, KwKwK, 4096
table resets), a hand-packed byte fixture independent of the encoder,
error paths, extension skipping, and decode_image_payload routing."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from sciscraper_ray.stages.gif import (
    GifError,
    decode_gif,
    encode_gif,
    lzw_decode,
    lzw_encode,
)
from sciscraper_ray.stages.multimodal import (
    decode_image_payload,
    synth_gif_payload,
)


def test_hand_packed_stream_independent_of_encoder():
    """min_code_size=2: CLEAR(4), 0, EOI(5) at 3 bits LSB-first packs to
    0x44 0x01 — computed by hand from the spec's appendix-F packing."""
    assert lzw_encode(np.array([0], np.uint8), 2) == bytes([0x44, 0x01])
    assert lzw_decode(bytes([0x44, 0x01]), 2).tolist() == [0]


@pytest.mark.parametrize("mcs,alphabet", [(2, 4), (4, 16), (8, 256)])
@pytest.mark.parametrize("n", [1, 7, 1000, 30000])
def test_lzw_roundtrip(mcs, alphabet, n):
    rng = np.random.default_rng(n * 31 + mcs)
    seq = rng.integers(0, alphabet, n).astype(np.uint8)
    assert np.array_equal(lzw_decode(lzw_encode(seq, mcs), mcs), seq)


def test_lzw_width_growth_to_12_bits_and_reset():
    """120k symbols from a 4-letter alphabet force the code width through
    every size 3..12 and multiple 4096-entry table resets."""
    rng = np.random.default_rng(5)
    seq = rng.integers(0, 4, 120_000).astype(np.uint8)
    enc = lzw_encode(seq, 2)
    assert np.array_equal(lzw_decode(enc, 2), seq)
    assert len(enc) < len(seq)  # it actually compresses


def test_lzw_kwkwk_case():
    seq = np.array([0, 1, 0, 1, 0, 1, 0, 1], np.uint8)
    assert np.array_equal(lzw_decode(lzw_encode(seq, 2), 2), seq)


def test_container_roundtrip_and_palette_mapping():
    rng = np.random.default_rng(11)
    idx = rng.integers(0, 250, (37, 53)).astype(np.uint8)
    i = np.arange(250)
    pal = np.stack([i, 255 - i, i ^ 0x55], 1).astype(np.uint8)
    rgb, n_colors = decode_gif(encode_gif(idx, pal))
    assert n_colors == 256  # padded to the next power of two
    assert rgb.shape == (37, 53, 3)
    pal_pad = np.zeros((256, 3), np.uint8)
    pal_pad[:250] = pal
    assert np.array_equal(rgb, pal_pad[idx])


def test_extension_blocks_are_skipped():
    """The encoder emits a GCE; bolt an extra comment extension onto the
    stream and the decoder must walk past both."""
    idx = np.arange(12, dtype=np.uint8).reshape(3, 4)
    pal = np.tile(np.arange(16, dtype=np.uint8)[:, None], (1, 3))
    g = bytearray(encode_gif(idx, pal))
    insert_at = 6 + 7 + 16 * 3  # header + LSD + GCT
    comment = b"\x21\xfe\x05hello\x00"
    g[insert_at:insert_at] = comment
    rgb, _ = decode_gif(bytes(g))
    assert np.array_equal(rgb[:, :, 0], idx)


def test_bad_signature_rejected_loudly():
    idx = np.zeros((2, 2), np.uint8)
    pal = np.zeros((4, 3), np.uint8)
    g = bytearray(encode_gif(idx, pal))
    with pytest.raises(GifError):
        decode_gif(b"NOTGIF" + bytes(g[6:]))


@pytest.mark.parametrize("dims", [(1, 1), (2, 3), (7, 5), (8, 8), (13, 17), (31, 9)])
def test_interlace_and_local_palette_roundtrip(dims):
    """Four-pass interlace row scatter (spec appendix E) and the local
    color table override, in all four combinations. The LCT fixture
    writes DECOY ZEROS as the global table — a decoder that ignores the
    LCT decodes all-black, so parity here proves the override path."""
    h, w = dims
    rng = np.random.default_rng(h * 37 + w)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (h, w), dtype=np.uint8)
    for interlace in (False, True):
        for local in (False, True):
            rgb, n = decode_gif(
                encode_gif(idx, pal, interlace=interlace, local_palette=local)
            )
            assert n == 16
            assert (rgb == pal[idx]).all(), (interlace, local)


def test_truncated_stream_rejected():
    idx = np.arange(64, dtype=np.uint8).reshape(8, 8)
    pal = np.tile(np.arange(256, dtype=np.uint8)[:, None], (1, 3))
    g = encode_gif(idx, pal)
    with pytest.raises((ValueError, IndexError, struct.error)):
        # GifError is a ValueError; a cut inside the color table surfaces
        # as numpy's buffer-too-small ValueError — loud either way
        decode_gif(g[: len(g) // 2])


def test_decode_image_payload_routes_gif():
    img, status = decode_image_payload(synth_gif_payload(123))
    assert status == "ok"
    w, h, base = 6 + 123 % 59, 5 + 123 % 53, 123 % 90
    assert img.shape == (h, w, 3)
    # channel 0 is the identity-palette index gradient
    assert img[0, 0, 0] == base
    assert img[h - 1, w - 1, 0] == base + w - 1 + h - 1
    assert float(img[:, :, 0].mean()) == base + (w - 1) / 2 + (h - 1) / 2


def test_synth_gif_payload_mean_formula():
    for doc_id in (0, 1, 57, 89, 199, 500):
        img, _ = decode_image_payload(synth_gif_payload(doc_id))
        w, h, base = 6 + doc_id % 59, 5 + doc_id % 53, doc_id % 90
        assert img.shape == (h, w, 3)
        assert float(img[:, :, 0].astype(np.float64).mean()) == (
            base + (w - 1) / 2 + (h - 1) / 2
        )
        # green/blue channels follow the palette transforms
        assert (img[:, :, 1] == 255 - img[:, :, 0]).all()
        assert (img[:, :, 2] == img[:, :, 0] ^ 0x55).all()


def test_final_code_on_width_growth_boundary():
    """Regression: when the decoder's phantom entry for the FINAL data
    code lands exactly on the width-growth boundary, EOI must be written
    one bit wider (doc_ids 246/496 of the sf0.01 fixtures hit this).
    Brute-force a window of lengths so every boundary alignment occurs."""
    for doc_id in (246, 496):
        img, status = decode_image_payload(synth_gif_payload(doc_id))
        assert status == "ok"
        w, h = 6 + doc_id % 59, 5 + doc_id % 53
        assert img.shape == (h, w, 3)
    rng = np.random.default_rng(3)
    for n in range(240, 320):  # sweeps across the 512-entry boundary
        seq = rng.integers(0, 256, n).astype(np.uint8)
        assert np.array_equal(lzw_decode(lzw_encode(seq, 8), 8), seq), n
    for n in range(1, 80):  # min_code_size=2: boundaries at 8/16/32/64
        seq = rng.integers(0, 4, n).astype(np.uint8)
        assert np.array_equal(lzw_decode(lzw_encode(seq, 2), 2), seq), n


def test_animation_composite_disposal_transparency():
    """Three-frame animation: full-screen base, offset rect with a
    transparent ring (disposal 2), then a corner patch — checks GCE
    parsing, transparency skip, compositing, and restore-to-background."""
    from sciscraper_ray.stages.gif import decode_gif_frames, encode_gif_frames

    k = np.arange(16)
    pal = np.stack(
        [(5 * k + 1) % 256, (7 * k + 2) % 256, (11 * k + 3) % 256], axis=1
    ).astype(np.uint8)
    w, h = 10, 9
    c1, c2, c3, T = 1, 5, 9, 12
    f1 = np.full((h, w), c1, np.uint8)
    rect = np.full((h - 4, w - 4), T, np.uint8)
    rect[1:-1, 1:-1] = c2
    f3 = np.full((2, 2), c3, np.uint8)
    payload = encode_gif_frames(
        (w, h),
        [
            dict(indices=f1, disposal=0),
            dict(indices=rect, left=2, top=2, disposal=2, transparent=T),
            dict(indices=f3, disposal=0),
        ],
        pal,
    )
    frames = decode_gif_frames(payload)
    assert len(frames) == 3

    def P(i):
        return (5 * i + 1) % 256

    assert frames[0][:, :, 0].sum() == P(c1) * w * h
    inner = (w - 6) * (h - 6)
    assert frames[1][:, :, 0].sum() == P(c2) * inner + P(c1) * (w * h - inner)
    r2 = (w - 4) * (h - 4)
    assert frames[2][:, :, 0].sum() == P(c3) * 4 + P(0) * r2 + P(c1) * (
        w * h - r2 - 4
    )


def test_animation_disposal3_rejected():
    from sciscraper_ray.stages.gif import decode_gif_frames, encode_gif_frames

    pal = np.zeros((4, 3), np.uint8)
    f = np.zeros((2, 2), np.uint8)
    payload = bytearray(
        encode_gif_frames((2, 2), [dict(indices=f, disposal=3)], pal)
    )
    with pytest.raises(GifError, match="disposal 3"):
        decode_gif_frames(bytes(payload))


def test_single_frame_animation_matches_decode_gif():
    from sciscraper_ray.stages.gif import decode_gif_frames

    rng = np.random.default_rng(8)
    pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    idx = rng.integers(0, 8, (6, 7), dtype=np.uint8)
    payload = encode_gif(idx, pal)
    frames = decode_gif_frames(payload)
    assert len(frames) == 1
    assert (frames[0] == decode_gif(payload)[0]).all()
