"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, processed by actor-pool ``map_batches`` stages.

The container has no image/audio codecs (no PIL/libsndfile/ffmpeg), so the
REAL decoders are import-gated stubs that raise ``NotImplementedError``
with the dependency named — while the Ray-side plumbing (schemas, actor
signatures, batch sizing, output layout) is real and tested against the
deterministic FAKE container formats below:

    FIMG: b"FIMG" | u16 width | u16 height | u8 channels | u8 fill...
          (one fill byte per channel; pixel[c][y][x] == fill[c] + trailing
          gradient flag: if the last header byte is 1, pixel = (fill[c]
          + x + y) % 256 instead)
    FAUD: b"FAUD" | u32 sample_rate | u32 n_samples | i16 seed
          (sample[t] == ((seed + t) % 251) - 125, int16)

Scale notes: payloads are multi-MB in real crawls -> decode stages take
SMALL batches (default 32) and ``num_cpus=1`` each; features/resize output
fixed-size vectors so downstream blocks are compact. Nothing here holds
more than one batch in memory.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

IMAGE_MAGIC = b"FIMG"
AUDIO_MAGIC = b"FAUD"

DECODED_IMAGE_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("channels", pa.int32()),
        ("pixels", pa.binary()),  # C-order uint8 [h][w][c]
        ("decode_status", pa.string()),
    ]
)


def encode_fake_image(
    width: int, height: int, fills: list[int], gradient: bool = False
) -> bytes:
    return (
        IMAGE_MAGIC
        + struct.pack("<HHB", width, height, len(fills))
        + bytes(f % 256 for f in fills)
        + bytes([1 if gradient else 0])
    )


def encode_fake_audio(sample_rate: int, n_samples: int, seed: int) -> bytes:
    return AUDIO_MAGIC + struct.pack("<IIh", sample_rate, n_samples, seed)


def decode_image_payload(payload: bytes) -> tuple[np.ndarray, str]:
    """binary -> (h, w, c) uint8 array. PNG and baseline JPEG decode for
    real (from-scratch codecs, stages/png.py and stages/jpeg.py)."""
    from sciscraper_ray.stages.png import PNG_SIGNATURE, decode_png

    if payload[:8] == PNG_SIGNATURE:
        return decode_png(payload), "ok"
    if payload[:2] == b"\xff\xd8":
        from sciscraper_ray.stages.jpeg import decode_jpeg

        img = decode_jpeg(payload)
        if img.ndim == 2:
            img = img[:, :, None]
        return img, "ok"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from sciscraper_ray.stages.gif import decode_gif

        rgb, _n_colors = decode_gif(payload)
        return rgb, "ok"
    if payload[:4] == IMAGE_MAGIC:
        w, h, c = struct.unpack("<HHB", payload[4:9])
        fills = np.frombuffer(payload[9 : 9 + c], np.uint8)
        grad = payload[9 + c] == 1
        img = np.broadcast_to(fills, (h, w, c)).astype(np.uint8)
        if grad:
            yy, xx = np.mgrid[0:h, 0:w]
            img = ((img.astype(np.int32) + (xx + yy)[:, :, None]) % 256).astype(
                np.uint8
            )
        return np.ascontiguousarray(img), "ok"
    # Real JPEG/PNG path: PIL is not installed in this environment.
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "real image decode requires Pillow (not in this container); "
            "payloads must use the FIMG fake format here"
        ) from exc
    raise NotImplementedError("non-FIMG decode path not implemented")


def decode_audio_payload(payload: bytes) -> tuple[np.ndarray, int]:
    """binary -> (samples: int16 ndarray, sample_rate). RIFF/WAVE decodes
    for real (stages/wav.py); multi-channel payloads yield channel 0 (the
    frame-sampling stage is mono — WavFeatureStage keeps all channels)."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        from sciscraper_ray.stages.wav import decode_wav

        samples, sr, _bits = decode_wav(payload)
        return samples[:, 0], sr
    if payload[:4] == AUDIO_MAGIC:
        sr, n, seed = struct.unpack("<IIh", payload[4:14])
        t = np.arange(n, dtype=np.int64)
        return (((seed + t) % 251) - 125).astype(np.int16), int(sr)
    try:
        import soundfile  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "real audio decode requires libsndfile (not in this container); "
            "payloads must use the FAUD fake format here"
        ) from exc
    raise NotImplementedError("non-FAUD decode path not implemented")


class ImageDecodeStage:
    """Actor-pool stage: (doc_id, payload) -> DECODED_IMAGE_SCHEMA rows.

    Decode errors degrade to null pixels + status, never crash the task
    (same error contract as PayloadExtractor)."""

    def __init__(self, payload_col: str = "payload"):
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ws, hs, cs, px, status = [], [], [], [], []
        for payload in batch[self.payload_col].to_pylist():
            try:
                img, st = decode_image_payload(bytes(payload))
                hs.append(img.shape[0])
                ws.append(img.shape[1])
                cs.append(img.shape[2])
                px.append(img.tobytes())
                status.append(st)
            except (NotImplementedError, Exception) as exc:  # noqa: BLE001
                ws.append(0)
                hs.append(0)
                cs.append(0)
                px.append(None)
                status.append(f"error: {type(exc).__name__}")
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "width": pa.array(ws, pa.int32()),
                "height": pa.array(hs, pa.int32()),
                "channels": pa.array(cs, pa.int32()),
                "pixels": pa.array(px, pa.binary()),
                "decode_status": pa.array(status, pa.string()),
            }
        )


class ImageResizeStage:
    """Actor-pool stage over decoded rows: nearest-neighbor resize to a
    fixed (target_w, target_h) — vectorized index take, no Python pixel
    loops."""

    def __init__(self, target_w: int = 32, target_h: int = 32):
        self.tw = target_w
        self.th = target_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for w, h, c, px in zip(
            batch["width"].to_pylist(),
            batch["height"].to_pylist(),
            batch["channels"].to_pylist(),
            batch["pixels"].to_pylist(),
        ):
            if px is None or w == 0:
                out.append(None)
                continue
            img = np.frombuffer(px, np.uint8).reshape(h, w, c)
            ys = (np.arange(self.th) * h // self.th).astype(np.int64)
            xs = (np.arange(self.tw) * w // self.tw).astype(np.int64)
            out.append(img[ys][:, xs].tobytes())
        return (
            batch.drop_columns(["pixels", "width", "height"])
            .append_column("width", pa.array([self.tw] * len(batch), pa.int32()))
            .append_column("height", pa.array([self.th] * len(batch), pa.int32()))
            .append_column("pixels", pa.array(out, pa.binary()))
        )


class ImageFeatureStage:
    """Actor-pool stage: per-channel mean/std features from decoded pixels."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        means, stds = [], []
        for w, h, c, px in zip(
            batch["width"].to_pylist(),
            batch["height"].to_pylist(),
            batch["channels"].to_pylist(),
            batch["pixels"].to_pylist(),
        ):
            if px is None or w == 0:
                means.append(None)
                stds.append(None)
                continue
            img = np.frombuffer(px, np.uint8).reshape(h * w, c).astype(np.float64)
            means.append(img.mean(axis=0).tolist())
            stds.append(img.std(axis=0).tolist())
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "width": batch["width"],
                "height": batch["height"],
                "channels": batch["channels"],
                "mean": pa.array(means, pa.list_(pa.float64())),
                "std": pa.array(stds, pa.list_(pa.float64())),
                "decode_status": batch["decode_status"],
            }
        )


class AudioFrameSampleStage:
    """Actor-pool stage: decode FAUD payloads and sample fixed-hop frames
    (every ``hop``-th sample, first ``max_frames``), emitting the frame
    vector plus rms/duration metadata."""

    def __init__(self, payload_col: str = "payload", hop: int = 160, max_frames: int = 64):
        self.payload_col = payload_col
        self.hop = hop
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        frames, rms, dur, status = [], [], [], []
        for payload in batch[self.payload_col].to_pylist():
            try:
                samples, sr = decode_audio_payload(bytes(payload))
                sel = samples[:: self.hop][: self.max_frames]
                frames.append(sel.astype(np.int32).tolist())
                x = samples.astype(np.float64)
                rms.append(float(np.sqrt(np.mean(x * x))) if len(x) else 0.0)
                dur.append(len(samples) / sr if sr else 0.0)
                status.append("ok")
            except (NotImplementedError, Exception) as exc:  # noqa: BLE001
                frames.append(None)
                rms.append(None)
                dur.append(None)
                status.append(f"error: {type(exc).__name__}")
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "frames": pa.array(frames, pa.list_(pa.int32())),
                "rms": pa.array(rms, pa.float64()),
                "duration_s": pa.array(dur, pa.float64()),
                "decode_status": pa.array(status, pa.string()),
            }
        )


def synth_media_batch(batch: pa.Table, kind: str = "image") -> pa.Table:
    """documents batch -> (doc_id, payload, media_type) with deterministic
    fake payloads keyed on doc_id (the multimodal test fixture):

    image: width = 16 + doc_id % 48, height = 8 + doc_id % 24, 3 channels
           filled with (doc_id % 256, (doc_id*3) % 256, (doc_id*7) % 256)
    png:   REAL PNG bytes (stages/png.py encoder): w = 8 + doc_id % 57,
           h = 4 + doc_id % 60, channels 1/3/4 by doc_id % 3, pixel
           value[k][y][x] = doc_id % 100 + x + y + 10*k (never wraps),
           scanline y filtered with type (doc_id + y) % 5 so every
           decode exercises all five PNG filters
    gif:   REAL GIF89a bytes (stages/gif.py encoder, formula on
           synth_gif_payload)
    audio: sample_rate 16000, n = 1600 + (doc_id % 100) * 16, seed doc_id % 97
    video: 32x18, n_frames = 60 + doc_id % 240, fps 30, seed doc_id % 251
    """
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    payloads = []
    for i in ids:
        i = int(i)
        if kind == "image":
            payloads.append(
                encode_fake_image(
                    16 + i % 48, 8 + i % 24, [i % 256, (i * 3) % 256, (i * 7) % 256]
                )
            )
        elif kind == "png":
            payloads.append(synth_png_payload(i))
        elif kind == "gif":
            payloads.append(synth_gif_payload(i))
        elif kind == "audio":
            payloads.append(encode_fake_audio(16_000, 1600 + (i % 100) * 16, i % 97))
        elif kind == "wav":
            payloads.append(synth_wav_payload(i))
        elif kind == "jpeg":
            payloads.append(synth_jpeg_payload(i))
        elif kind == "mp4":
            payloads.append(synth_mp4_payload(i))
        elif kind == "avi":
            payloads.append(synth_avi_payload(i))
        elif kind == "h261":
            payloads.append(synth_h261_payload(i))
        else:
            payloads.append(
                encode_fake_video(32, 18, 60 + i % 240, 30, i % 251)
            )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "payload": pa.array(payloads, pa.binary()),
            "media_type": pa.array([kind] * len(ids), pa.string()),
        }
    )


def synth_png_payload(doc_id: int) -> bytes:
    """Deterministic REAL PNG for ``doc_id`` (formula documented on
    synth_media_batch). Channel-k mean is exactly
    doc_id % 100 + (w-1)/2 + (h-1)/2 + 10*k — oracle-expressible."""
    from sciscraper_ray.stages.png import encode_png

    w = 8 + doc_id % 57
    h = 4 + doc_id % 60
    c = (1, 3, 4)[doc_id % 3]
    base = doc_id % 100
    yy, xx = np.mgrid[0:h, 0:w]
    img = (
        base
        + xx[:, :, None]
        + yy[:, :, None]
        + 10 * np.arange(c)[None, None, :]
    ).astype(np.uint8)
    return encode_png(img, filter_type=[(doc_id + y) % 5 for y in range(h)])


def synth_gif_payload(doc_id: int) -> bytes:
    """Deterministic REAL GIF89a for ``doc_id`` (stages/gif.py encoder):
    w = 6 + doc_id % 59, h = 5 + doc_id % 53, 256-entry identity-red
    palette (r=i, g=255-i, b=i^0x55), pixel index[y][x] =
    doc_id % 90 + x + y (max 199, never wraps), so decoded channel-0
    mean is exactly doc_id % 90 + (w-1)/2 + (h-1)/2 — any LZW
    bit-unpacking or dictionary bug shifts indices and breaks it."""
    from sciscraper_ray.stages.gif import encode_gif

    w = 6 + doc_id % 59
    h = 5 + doc_id % 53
    base = doc_id % 90
    yy, xx = np.mgrid[0:h, 0:w]
    idx = (base + xx + yy).astype(np.uint8)
    i = np.arange(256)
    palette = np.stack([i, 255 - i, i ^ 0x55], axis=1).astype(np.uint8)
    return encode_gif(idx, palette)


def synth_mp4_payload(doc_id: int) -> bytes:
    """Deterministic REAL ISO BMFF container for ``doc_id``
    (stages/mp4.py writer):

        brand     = isom / mp42 by doc_id % 2
        timescale = 600 (even doc_id) | 1000 (odd)
        duration  = 1000 * (1 + doc_id % 60) ticks
        width     = 160 * (1 + doc_id % 8), height = 120 * (1 + doc_id % 6)
        mdat      = (doc_id % 50) zero bytes (never parsed)
    """
    from sciscraper_ray.stages.mp4 import encode_mp4_stub

    return encode_mp4_stub(
        timescale=600 if doc_id % 2 == 0 else 1000,
        duration=1000 * (1 + doc_id % 60),
        width=160 * (1 + doc_id % 8),
        height=120 * (1 + doc_id % 6),
        brand=b"isom" if doc_id % 2 == 0 else b"mp42",
        mdat_size=doc_id % 50,
    )


class Mp4MetadataStage:
    """Actor-pool stage: REAL MP4 box-walk (stages/mp4.py) -> container
    metadata rows. Frame decode stays import-gated (H.264 needs a real
    codec); the container harvest is what a crawl-wide video inventory
    pass runs. Errors degrade to null metadata + status."""

    def __init__(self, payload_col: str = "payload"):
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from sciscraper_ray.stages.mp4 import Mp4Error, parse_mp4

        brand, dur_s, ws, hs, status = [], [], [], [], []
        for payload in batch[self.payload_col].to_pylist():
            try:
                meta = parse_mp4(bytes(payload))
                brand.append(meta["brand"])
                dur_s.append(meta["duration_s"])
                ws.append(meta["width"])
                hs.append(meta["height"])
                status.append("ok")
            except (Mp4Error, struct.error) as exc:
                brand.append(None)
                dur_s.append(None)
                ws.append(None)
                hs.append(None)
                status.append(f"error: {type(exc).__name__}")
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "brand": pa.array(brand, pa.string()),
                "duration_s": pa.array(dur_s, pa.float64()),
                "width": pa.array(ws, pa.int32()),
                "height": pa.array(hs, pa.int32()),
                "decode_status": pa.array(status, pa.string()),
            }
        )


def synth_jpeg_payload(doc_id: int) -> bytes:
    """Deterministic REAL baseline JPEG for ``doc_id`` (stages/jpeg.py
    encoder): constant-gray image, value v = doc_id % 256,
    w = 8*(1 + doc_id % 6), h = 8*(1 + doc_id % 4). A constant image is
    DC-only, so the lossy round trip is exactly predictable: with the
    Annex-K luma table (q00 = 16), decoded value =
    clamp(2 * round_half_away((v - 128) / 2) + 128) — the oracle states
    it in SQL, and the value only comes out right if the whole pipeline
    (marker parse, Huffman decode, DC prediction, dequant, IDCT,
    reconstruction rounding) ran correctly."""
    from sciscraper_ray.stages.jpeg import encode_jpeg

    v = doc_id % 256
    w = 8 * (1 + doc_id % 6)
    h = 8 * (1 + doc_id % 4)
    return encode_jpeg(np.full((h, w), v, np.uint8))


def synth_wav_payload(doc_id: int) -> bytes:
    """Deterministic REAL-format stereo WAV for ``doc_id`` (stages/wav.py
    writer, odd-length junk LIST chunk included so decode must chunk-walk):

        bits     = 8 if doc_id % 3 == 0 else 16
        rate     = 8000 + (doc_id % 8) * 500
        frames   = 40 + doc_id % 80
        amp_c0   = 20 + doc_id % 100   (8-bit)  | 100 + doc_id % 900 (16-bit)
        amp_c1   = 10 + 3*doc_id % 90  (8-bit)  | 50 + 3*doc_id % 400 (16-bit)
        sample[c][t] = +amp_c if t even else -amp_c

    The alternating-sign square wave makes per-channel mean(|x|) exactly
    amp_c — oracle-expressible from doc_id arithmetic, and any chunk-walk
    / alignment / re-centering bug in the decoder shifts it."""
    from sciscraper_ray.stages.wav import encode_wav

    bits = 8 if doc_id % 3 == 0 else 16
    rate = 8000 + (doc_id % 8) * 500
    frames = 40 + doc_id % 80
    if bits == 8:
        a0, a1 = 20 + doc_id % 100, 10 + (doc_id * 3) % 90
    else:
        a0, a1 = 100 + doc_id % 900, 50 + (doc_id * 3) % 400
    sign = np.where(np.arange(frames) % 2 == 0, 1, -1)
    samples = np.stack([sign * a0, sign * a1], axis=1)
    return encode_wav(samples, rate, bits=bits, junk_chunks=True)


class WavFeatureStage:
    """Actor-pool stage: REAL RIFF/WAVE decode (stages/wav.py) ->
    per-channel mean-absolute amplitude + container metadata. Decode
    errors degrade to null features + status (PayloadExtractor error
    contract), never crash the task."""

    def __init__(self, payload_col: str = "payload"):
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from sciscraper_ray.stages.wav import WavError, decode_wav

        rate, frames, chans, bits_out, mean_abs, status = [], [], [], [], [], []
        for payload in batch[self.payload_col].to_pylist():
            try:
                samples, sr, bits = decode_wav(bytes(payload))
                rate.append(sr)
                frames.append(samples.shape[0])
                chans.append(samples.shape[1])
                bits_out.append(bits)
                mean_abs.append(
                    np.abs(samples.astype(np.float64)).mean(axis=0).tolist()
                )
                status.append("ok")
            except (WavError, ValueError, struct.error) as exc:
                rate.append(None)
                frames.append(None)
                chans.append(None)
                bits_out.append(None)
                mean_abs.append(None)
                status.append(f"error: {type(exc).__name__}")
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "sample_rate": pa.array(rate, pa.int32()),
                "n_frames": pa.array(frames, pa.int32()),
                "channels": pa.array(chans, pa.int32()),
                "bits": pa.array(bits_out, pa.int32()),
                "mean_abs": pa.array(mean_abs, pa.list_(pa.float64())),
                "decode_status": pa.array(status, pa.string()),
            }
        )


VIDEO_MAGIC = b"FVID"


def encode_fake_video(
    width: int, height: int, n_frames: int, fps: int, seed: int
) -> bytes:
    """FVID: b"FVID" | u16 w | u16 h | u16 n_frames | u16 fps | u8 seed —
    frame t is a constant fill of (seed + t) % 256."""
    return VIDEO_MAGIC + struct.pack("<HHHHB", width, height, n_frames, fps, seed)


def decode_video_payload(payload: bytes):
    """binary -> (w, h, n_frames, fps, frame_fn(t) -> (h, w) uint8)."""
    if len(payload) >= 3 and payload[:2] == b"\x00\x01" and (payload[2] & 0xF0) == 0:
        # H.261-class PSC (0x00010 in the top 20 bits): real DCT decode
        from sciscraper_ray.stages.h261 import decode_h261_intra

        w, h, frames = decode_h261_intra(payload)

        def frame261(t: int) -> np.ndarray:
            return frames[t]

        return w, h, len(frames), 30, frame261
    if payload[:4] == VIDEO_MAGIC:
        w, h, n, fps, seed = struct.unpack("<HHHHB", payload[4:13])

        def frame(t: int) -> np.ndarray:
            return np.full((h, w), (seed + t) % 256, np.uint8)

        return w, h, n, fps, frame
    try:
        import av  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "H.264/H.265 payload decode requires PyAV/ffmpeg (not in this "
            "container); H.261-class intra streams (stages/h261.py) and the "
            "FVID fake format decode for real here"
        ) from exc
    raise NotImplementedError("non-FVID decode path not implemented")


class VideoFrameSampleStage:
    """Actor-pool stage: decode video metadata and sample every
    ``stride``-th frame (up to ``max_frames``), emitting per-frame mean
    luma plus duration metadata — the frame-sample shape a real embedding
    or captioning stage would consume."""

    def __init__(self, payload_col: str = "payload", stride: int = 30, max_frames: int = 16):
        self.payload_col = payload_col
        self.stride = stride
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        idxs, lumas, durs, status = [], [], [], []
        for payload in batch[self.payload_col].to_pylist():
            try:
                w, h, n, fps, frame = decode_video_payload(bytes(payload))
                sel = list(range(0, n, self.stride))[: self.max_frames]
                idxs.append(sel)
                lumas.append([float(frame(t).mean()) for t in sel])
                durs.append(n / fps if fps else 0.0)
                status.append("ok")
            except (NotImplementedError, Exception) as exc:  # noqa: BLE001
                idxs.append(None)
                lumas.append(None)
                durs.append(None)
                status.append(f"error: {type(exc).__name__}")
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "frame_idx": pa.array(idxs, pa.list_(pa.int32())),
                "frame_mean_luma": pa.array(lumas, pa.list_(pa.float64())),
                "duration_s": pa.array(durs, pa.float64()),
                "decode_status": pa.array(status, pa.string()),
            }
        )


def synth_h261_payload(doc_id: int) -> bytes:
    """Deterministic REAL H.261-class all-intra stream for ``doc_id``
    (stages/h261.py encoder — picture/GOB/MB/block syntax, TCOEFF VLC):

        n_frames = 2 + doc_id % 3, QCIF 176x144, q = 8
        frame k  = constant luma (doc_id * 13 + 29 * k) % 256

    Constant frames make the transform round trip exactly predictable:
    intra DC index = clamp(v, 1, 254), rec = idx*8, IDCT -> idx — so
    decoded mean luma is least(254, greatest(1, v)) in plain doc_id
    arithmetic an oracle can state."""
    from sciscraper_ray.stages.h261 import encode_h261_intra

    n_frames = 2 + doc_id % 3
    frames = [
        np.full((144, 176), (doc_id * 13 + 29 * k) % 256, np.uint8)
        for k in range(n_frames)
    ]
    return encode_h261_intra(frames, q=8)


class H261FrameStage:
    """Actor-pool stage: H.261-class intra bitstream decode
    (stages/h261.py) -> one row per frame with mean luma — the DCT-video
    twin of AviFrameStage. Errors degrade to a null row + status."""

    def __init__(self, payload_col: str = "payload"):
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from sciscraper_ray.stages.h261 import H261Error, decode_h261_intra

        ids, fnos, ws, hs, means, status = [], [], [], [], [], []
        for doc_id, payload in zip(
            batch["doc_id"].to_pylist(), batch[self.payload_col].to_pylist()
        ):
            try:
                w, h, frames = decode_h261_intra(bytes(payload))
                for k, px in enumerate(frames):
                    ids.append(doc_id)
                    fnos.append(k)
                    ws.append(w)
                    hs.append(h)
                    means.append(float(px.mean()))
                    status.append("ok")
            except H261Error as exc:
                ids.append(doc_id)
                fnos.append(None)
                ws.append(None)
                hs.append(None)
                means.append(None)
                status.append(f"error: {type(exc).__name__}")
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "frame_no": pa.array(fnos, pa.int64()),
                "width": pa.array(ws, pa.int32()),
                "height": pa.array(hs, pa.int32()),
                "mean_luma": pa.array(means, pa.float64()),
                "decode_status": pa.array(status, pa.string()),
            }
        )


def synth_avi_payload(doc_id: int) -> bytes:
    """Deterministic REAL AVI/MJPEG container for ``doc_id``
    (stages/avi.py writer; frames from the stages/jpeg.py encoder):

        n_frames = 2 + doc_id % 4, fps = 10 + doc_id % 20, 16x16 frames
        frame k  = constant gray (doc_id + 40*k) % 256

    Constant frames make the lossy MJPEG round trip exactly predictable
    (same DC formula as synth_jpeg_payload), so an oracle can state every
    sampled frame's mean from doc_id arithmetic."""
    from sciscraper_ray.stages.avi import encode_avi_mjpeg
    from sciscraper_ray.stages.jpeg import encode_jpeg

    n_frames = 2 + doc_id % 4
    fps = 10 + doc_id % 20
    frames = [
        encode_jpeg(np.full((16, 16), (doc_id + 40 * k) % 256, np.uint8))
        for k in range(n_frames)
    ]
    return encode_avi_mjpeg(frames, 16, 16, fps)


class AviFrameStage:
    """Actor-pool stage: REAL AVI/MJPEG frame decode (stages/avi.py RIFF
    walk + stages/jpeg.py entropy decode) -> one row per SAMPLED frame
    (every ``stride``-th, the standard frame-sampling shape for video
    featurization). Errors degrade to a single null row + status, so a
    corrupt container never kills the batch."""

    def __init__(self, payload_col: str = "payload", stride: int = 2):
        self.payload_col = payload_col
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        from sciscraper_ray.stages.avi import AviError, decode_avi_frames
        from sciscraper_ray.stages.jpeg import JpegError

        ids, fnos, ws, hs, means, durs, status = [], [], [], [], [], [], []
        for doc_id, payload in zip(
            batch["doc_id"].to_pylist(), batch[self.payload_col].to_pylist()
        ):
            try:
                info, frames = decode_avi_frames(
                    bytes(payload), stride=self.stride
                )
                for k, px in frames:
                    ids.append(doc_id)
                    fnos.append(k)
                    ws.append(px.shape[1])
                    hs.append(px.shape[0])
                    means.append(float(px.mean()))
                    durs.append(info["duration_s"])
                    status.append("ok")
            except (AviError, JpegError, struct.error) as exc:
                ids.append(doc_id)
                fnos.append(None)
                ws.append(None)
                hs.append(None)
                means.append(None)
                durs.append(None)
                status.append(f"error: {type(exc).__name__}")
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "frame_no": pa.array(fnos, pa.int64()),
                "width": pa.array(ws, pa.int32()),
                "height": pa.array(hs, pa.int32()),
                "mean_c0": pa.array(means, pa.float64()),
                "duration_s": pa.array(durs, pa.float64()),
                "decode_status": pa.array(status, pa.string()),
            }
        )
