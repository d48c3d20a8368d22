"""Pure-Python media codecs for the multimodal operators.

The container has no Pillow/opencv/pyav, but several production formats
are simple enough to speak directly — which turns part of the
multimodal surface from "stubbed contract" into "real decode", with the
compressed formats (JPEG pixel data, PNG pixel data, MP3/AAC) still
gated behind optional libraries:

- image DIMENSIONS for JPEG/PNG/BMP/GIF: header parsing only, no pixel
  decode needed (JPEG needs a segment scan for SOF; PNG/BMP/GIF are
  fixed offsets);
- BMP (24-bit uncompressed): full decode to an ndarray, nearest-
  neighbor resize, re-encode — a complete real resize path;
- WAV (PCM 8/16-bit): stdlib ``wave`` + numpy for sample rate,
  duration, channel count and real RMS/loudness features.

Everything here is per-payload pure functions; the Spark side (Arrow
batches via mapInPandas) lives in ``multimodal.py``.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

# ---------------------------------------------------------------------------
# image dimensions (header-only, no pixel decode)
# ---------------------------------------------------------------------------


def parse_image_dims(payload: bytes) -> tuple[str, int | None, int | None]:
    """(format, width, height) from container headers.  Unknown or
    truncated payloads return ("unknown", None, None) rather than raise
    — corrupt blobs are data, not errors, at corpus scale."""
    if payload is None or len(payload) < 10:
        return ("unknown", None, None)
    try:
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            # IHDR is always the first chunk: width/height at 16..24
            w, h = struct.unpack(">II", payload[16:24])
            return ("png", w, h)
        if payload[:2] == b"BM":
            w, h = struct.unpack("<ii", payload[18:26])
            return ("bmp", w, abs(h))  # negative h = top-down rows
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            w, h = struct.unpack("<HH", payload[6:10])
            return ("gif", w, h)
        if payload[:2] == b"\xff\xd8":
            return ("jpeg", *_jpeg_dims(payload))
    except (struct.error, IndexError):
        pass
    return ("unknown", None, None)


def _jpeg_dims(payload: bytes) -> tuple[int | None, int | None]:
    """Scan JPEG segments for the first SOFn frame header (the baseline/
    progressive markers that carry dimensions)."""
    i = 2
    n = len(payload)
    while i + 9 < n:
        if payload[i] != 0xFF:
            i += 1
            continue
        marker = payload[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2  # standalone markers have no length
            continue
        seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
        # SOF0..SOF15 except DHT(C4)/JPG(C8)/DAC(CC)
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
            return (w, h)
        i += 2 + seg_len
    return (None, None)


# ---------------------------------------------------------------------------
# BMP: 24-bit uncompressed decode / encode / resize
# ---------------------------------------------------------------------------


def decode_bmp(payload: bytes) -> np.ndarray:
    """24bpp uncompressed BMP -> (height, width, 3) uint8 RGB array."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack("<I", payload[10:14])[0]
    w, h = struct.unpack("<ii", payload[18:26])
    bpp = struct.unpack("<H", payload[28:30])[0]
    compression = struct.unpack("<I", payload[30:34])[0]
    if bpp != 24 or compression != 0:
        raise ValueError(
            f"only 24bpp uncompressed BMP supported (got {bpp}bpp, "
            f"compression {compression}); compressed formats need Pillow"
        )
    top_down = h < 0
    h = abs(h)
    row_stride = (w * 3 + 3) & ~3  # rows pad to 4 bytes
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_stride * h, offset=data_offset
    ).reshape(h, row_stride)[:, : w * 3]
    img = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    return img if top_down else img[::-1]


def encode_bmp(img: np.ndarray) -> bytes:
    """(height, width, 3) uint8 RGB -> 24bpp uncompressed BMP bytes."""
    h, w, _ = img.shape
    row_stride = (w * 3 + 3) & ~3
    body = np.zeros((h, row_stride), dtype=np.uint8)
    body[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # RGB->BGR, bottom-up
    raw = body.tobytes()
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(raw), 0, 0, 14 + 40
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raw), 2835, 2835, 0, 0)
    return header + raw


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample via index gather (vectorized)."""
    h, w = img.shape[:2]
    ys = (np.arange(height) * (h / height)).astype(np.int64).clip(0, h - 1)
    xs = (np.arange(width) * (w / width)).astype(np.int64).clip(0, w - 1)
    return img[ys][:, xs]


# ---------------------------------------------------------------------------
# WAV: PCM decode + features
# ---------------------------------------------------------------------------


def decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """RIFF/WAVE PCM -> (sample_rate, n_channels, float64 samples in
    [-1, 1] shaped (frames, channels))."""
    with wave.open(io.BytesIO(payload)) as f:
        rate, channels = f.getframerate(), f.getnchannels()
        width = f.getsampwidth()
        frames = f.readframes(f.getnframes())
    if width == 2:
        samples = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:  # 8-bit WAV is unsigned
        samples = (
            np.frombuffer(frames, dtype=np.uint8).astype(np.float64) - 128.0
        ) / 128.0
    elif width == 4:
        samples = (
            np.frombuffer(frames, dtype="<i4").astype(np.float64) / 2147483648.0
        )
    else:
        raise ValueError(f"unsupported PCM sample width {width}")
    return rate, channels, samples.reshape(-1, channels)


def wav_features(payload: bytes, dim: int = 8) -> dict:
    """Real audio features from PCM: duration, rms, peak, zero-crossing
    rate, and a dim-bucket mean-abs envelope (a crude but genuine
    spectral stand-in that needs no FFT library choice)."""
    rate, channels, samples = decode_wav(payload)
    mono = samples.mean(axis=1)
    n = len(mono)
    rms = float(np.sqrt(np.mean(mono**2))) if n else 0.0
    peak = float(np.max(np.abs(mono))) if n else 0.0
    # signbit transitions count each crossing once (np.sign would count
    # twice when a sample lands exactly on zero)
    sb = np.signbit(mono)
    zcr = float(np.mean(sb[1:] != sb[:-1])) if n > 1 else 0.0
    if n:
        cuts = np.array_split(np.abs(mono), dim)
        envelope = [float(c.mean()) if len(c) else 0.0 for c in cuts]
    else:
        envelope = [0.0] * dim
    return {
        "sample_rate": rate,
        "n_channels": channels,
        "duration_ms": int(n * 1000 / rate) if rate else 0,
        "rms": rms,
        "peak": peak,
        "zero_crossing_rate": zcr,
        "envelope": envelope,
    }


def encode_wav(
    samples: np.ndarray, sample_rate: int = 16000, n_channels: int = 1
) -> bytes:
    """float [-1,1] -> 16-bit PCM WAV (tests / stream simulation)."""
    pcm = (np.asarray(samples, dtype=np.float64).clip(-1, 1) * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(n_channels)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(pcm.tobytes())
    return buf.getvalue()
