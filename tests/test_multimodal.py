"""Multimodal stages: fake-format decode plumbing, resize, frame sampling,
and the import-gated real-codec boundary."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from sciscraper_ray.stages.multimodal import (
    AudioFrameSampleStage,
    ImageDecodeStage,
    ImageFeatureStage,
    ImageResizeStage,
    decode_audio_payload,
    decode_image_payload,
    encode_fake_audio,
    encode_fake_image,
    synth_media_batch,
)


def test_image_roundtrip_constant_fill():
    img, st = decode_image_payload(encode_fake_image(10, 4, [7, 8, 9]))
    assert st == "ok" and img.shape == (4, 10, 3)
    assert (img[:, :, 0] == 7).all() and (img[:, :, 2] == 9).all()


def test_image_gradient_payload():
    img, _ = decode_image_payload(encode_fake_image(5, 3, [100], gradient=True))
    assert img[0, 0, 0] == 100 and img[2, 4, 0] == (100 + 6) % 256


def test_real_codec_paths_are_gated():
    # PNG, baseline JPEG, GIF, and RIFF/WAVE decode for real now
    # (stages/png.py, jpeg.py, gif.py, wav.py); formats still needing
    # out-of-container codecs (BMP/TIFF, OGG) keep the dependency gate.
    with pytest.raises(NotImplementedError, match="Pillow"):
        decode_image_payload(b"BM..........")
    with pytest.raises(NotImplementedError, match="libsndfile"):
        decode_audio_payload(b"OggS........")
    # GIF routes to the real codec; malformed bytes fail LOUDLY there
    with pytest.raises(Exception):
        decode_image_payload(b"GIF89a......")


def test_decode_stage_degrades_on_garbage():
    batch = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "payload": pa.array([encode_fake_image(4, 4, [1, 2, 3]), b"JUNK"], pa.binary()),
        }
    )
    out = ImageDecodeStage()(batch)
    assert out["decode_status"].to_pylist() == ["ok", "error: NotImplementedError"]
    assert out["pixels"][1].as_py() is None


def test_resize_nearest_neighbor_gradient():
    batch = pa.table(
        {
            "doc_id": pa.array([1], pa.int64()),
            "payload": pa.array(
                [encode_fake_image(8, 8, [0], gradient=True)], pa.binary()
            ),
        }
    )
    decoded = ImageDecodeStage()(batch)
    resized = ImageResizeStage(target_w=4, target_h=4)(decoded)
    img = np.frombuffer(resized["pixels"][0].as_py(), np.uint8).reshape(4, 4, 1)
    # nearest-neighbor: output (y, x) samples source (2y, 2x) -> value 2y+2x
    yy, xx = np.mgrid[0:4, 0:4]
    assert (img[:, :, 0] == (2 * yy + 2 * xx) % 256).all()


def test_feature_stage_mean_std():
    batch = pa.table(
        {
            "doc_id": pa.array([5], pa.int64()),
            "payload": pa.array([encode_fake_image(6, 2, [10, 200, 30])], pa.binary()),
        }
    )
    feats = ImageFeatureStage()(ImageDecodeStage()(batch))
    assert feats["mean"][0].as_py() == [10.0, 200.0, 30.0]
    assert feats["std"][0].as_py() == [0.0, 0.0, 0.0]


def test_audio_frame_sampling_matches_formula():
    payload = encode_fake_audio(16_000, 1000, seed=11)
    batch = pa.table(
        {"doc_id": pa.array([3], pa.int64()), "payload": pa.array([payload], pa.binary())}
    )
    out = AudioFrameSampleStage(hop=100, max_frames=5)(batch)
    t = np.arange(1000)
    samples = ((11 + t) % 251) - 125
    assert out["frames"][0].as_py() == samples[::100][:5].tolist()
    assert out["duration_s"][0].as_py() == pytest.approx(1000 / 16_000)
    assert out["rms"][0].as_py() == pytest.approx(np.sqrt((samples.astype(float) ** 2).mean()))


def test_synth_media_is_deterministic_and_typed():
    docs = pa.table({"doc_id": pa.array([0, 1, 97], pa.int64())})
    a, b = synth_media_batch(docs, "image"), synth_media_batch(docs, "image")
    assert a.equals(b)
    assert a.schema.field("payload").type == pa.binary()
    assert a["media_type"].to_pylist() == ["image"] * 3


def test_stages_compose_in_ray(ray_session):
    import ray.data

    docs = pa.table({"doc_id": pa.array(list(range(40)), pa.int64())})
    ds = (
        ray.data.from_arrow(docs)
        .map_batches(lambda b: synth_media_batch(b, "image"), batch_format="pyarrow")
        .map_batches(ImageDecodeStage, batch_format="pyarrow", batch_size=8,
                     concurrency=2)
        .map_batches(ImageResizeStage,
                     fn_constructor_kwargs={"target_w": 8, "target_h": 8},
                     batch_format="pyarrow", concurrency=2)
    )
    out = ds.take_all()
    assert len(out) == 40
    assert all(len(r["pixels"]) == 8 * 8 * 3 for r in out)


def test_feature_stage_null_pixels_degrade():
    batch = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "payload": pa.array(
                [encode_fake_image(4, 4, [9, 9, 9]), b"JUNK"], pa.binary()
            ),
        }
    )
    feats = ImageFeatureStage()(ImageDecodeStage()(batch))
    assert feats["mean"][1].as_py() is None
    assert feats["mean"][0].as_py() == [9.0, 9.0, 9.0]


def test_video_frame_sampling_matches_formula():
    from sciscraper_ray.stages.multimodal import (
        VideoFrameSampleStage,
        decode_video_payload,
        encode_fake_video,
    )

    payload = encode_fake_video(32, 18, 100, 30, seed=250)
    w, h, n, fps, frame = decode_video_payload(payload)
    assert (w, h, n, fps) == (32, 18, 100, 30)
    assert frame(10).shape == (18, 32) and frame(10)[0, 0] == (250 + 10) % 256

    batch = pa.table(
        {"doc_id": pa.array([1], pa.int64()), "payload": pa.array([payload], pa.binary())}
    )
    out = VideoFrameSampleStage(stride=30, max_frames=2)(batch)
    assert out["frame_idx"][0].as_py() == [0, 30]
    assert out["frame_mean_luma"][0].as_py() == [250.0, (250 + 30) % 256]
    assert out["duration_s"][0].as_py() == pytest.approx(100 / 30)


def test_video_real_codec_gated():
    from sciscraper_ray.stages.multimodal import decode_video_payload

    with pytest.raises(NotImplementedError, match="PyAV"):
        decode_video_payload(b"\x00\x00\x00\x18ftypmp42....")


# ---------------------------------------------------------------------------
# RIFF/WAVE codec (stages/wav.py — real-format audio path)
# ---------------------------------------------------------------------------


def test_wav_roundtrip_16bit_stereo():
    import numpy as np
    from sciscraper_ray.stages.wav import decode_wav, encode_wav

    rng = np.random.default_rng(7)
    samples = rng.integers(-32768, 32767, size=(333, 2), dtype=np.int64)
    out, rate, bits = decode_wav(encode_wav(samples, 44_100, bits=16))
    assert (rate, bits) == (44_100, 16)
    assert out.shape == (333, 2)
    assert (out == samples).all()


def test_wav_roundtrip_8bit_mono_odd_data():
    # odd-length 8-bit mono data chunk exercises the pad byte
    import numpy as np
    from sciscraper_ray.stages.wav import decode_wav, encode_wav

    samples = np.array([-128, -1, 0, 1, 127], dtype=np.int64)[:, None]
    out, rate, bits = decode_wav(encode_wav(samples, 8000, bits=8))
    assert (rate, bits) == (8000, 8)
    assert out[:, 0].tolist() == [-128, -1, 0, 1, 127]


def test_wav_junk_chunk_walk_and_errors():
    import numpy as np
    import pytest
    from sciscraper_ray.stages.wav import WavError, decode_wav, encode_wav

    samples = np.ones((10, 2), dtype=np.int64) * 5
    payload = encode_wav(samples, 16_000, bits=16, junk_chunks=True)
    out, rate, _ = decode_wav(payload)
    assert out.shape == (10, 2) and (out == 5).all()

    with pytest.raises(WavError, match="RIFF"):
        decode_wav(b"OggS" + payload[4:])
    with pytest.raises(WavError, match="overruns"):
        decode_wav(payload[:-6])
    # non-PCM format code rejected
    bad = bytearray(encode_wav(samples, 16_000))
    bad[20] = 3  # fmt.audio_format = IEEE float
    with pytest.raises(WavError, match="non-PCM"):
        decode_wav(bytes(bad))


def test_wav_feature_stage_degrades_on_garbage():
    import pyarrow as pa
    from sciscraper_ray.stages.multimodal import WavFeatureStage, synth_wav_payload

    batch = pa.table(
        {
            "doc_id": pa.array([3, 4], pa.int64()),
            "payload": pa.array(
                [synth_wav_payload(3), b"RIFF\x00\x00\x00\x00JUNK"], pa.binary()
            ),
        }
    )
    out = WavFeatureStage()(batch)
    assert out["decode_status"][0].as_py() == "ok"
    # doc 3: 8-bit, amp_c0 = 20 + 3 = 23, amp_c1 = 10 + 9 = 19
    assert out["mean_abs"][0].as_py() == [23.0, 19.0]
    assert out["decode_status"][1].as_py().startswith("error:")
    assert out["mean_abs"][1].as_py() is None


# ---------------------------------------------------------------------------
# ISO BMFF (MP4) container parser (stages/mp4.py — video metadata tier)
# ---------------------------------------------------------------------------


def test_mp4_roundtrip_and_box_walk():
    from sciscraper_ray.stages.mp4 import encode_mp4_stub, parse_mp4

    payload = encode_mp4_stub(600, 9000, 1280, 720, brand=b"mp42", mdat_size=33)
    meta = parse_mp4(payload)
    assert meta["brand"] == "mp42"
    assert meta["timescale"] == 600 and meta["duration"] == 9000
    assert meta["duration_s"] == 15.0
    assert (meta["width"], meta["height"]) == (1280, 720)


def test_mp4_largesize_and_unknown_boxes():
    import struct as _s
    from sciscraper_ray.stages.mp4 import encode_mp4_stub, parse_mp4

    base = encode_mp4_stub(1000, 5000, 320, 240)
    # prepend an unknown box after ftyp and wrap free data in a largesize box
    ftyp_len = _s.unpack(">I", base[:4])[0]
    junk = _s.pack(">I", 16) + b"skip" + b"\x00" * 8
    big = _s.pack(">I", 1) + b"free" + _s.pack(">Q", 24) + b"\x00" * 8
    payload = base[:ftyp_len] + junk + big + base[ftyp_len:]
    meta = parse_mp4(payload)
    assert meta["duration_s"] == 5.0 and meta["width"] == 320


def test_mp4_errors():
    import pytest
    from sciscraper_ray.stages.mp4 import Mp4Error, encode_mp4_stub, parse_mp4

    with pytest.raises(Mp4Error, match="ftyp"):
        parse_mp4(b"RIFF....WAVE")
    good = encode_mp4_stub(600, 600, 64, 64)
    with pytest.raises(Mp4Error, match="overruns"):
        parse_mp4(good[:-10])


def test_mp4_stage_degrades():
    import pyarrow as pa
    from sciscraper_ray.stages.multimodal import Mp4MetadataStage, synth_mp4_payload

    batch = pa.table(
        {
            "doc_id": pa.array([4, 5], pa.int64()),
            "payload": pa.array([synth_mp4_payload(4), b"JUNKJUNKJUNK"], pa.binary()),
        }
    )
    out = Mp4MetadataStage()(batch)
    assert out["decode_status"][0].as_py() == "ok"
    assert out["brand"][0].as_py() == "isom"
    assert out["width"][0].as_py() == 160 * 5
    assert out["decode_status"][1].as_py().startswith("error:")
