"""Pure-Python media codecs for the multimodal operators.

The container has no Pillow/opencv/pyav, but several production formats
are simple enough to speak directly — which turns most of the
multimodal surface from "stubbed contract" into "real decode", with
only the formats that genuinely need big codec libraries (WebP, TIFF,
MP3/AAC, MP4) still gated behind optional imports.  Baseline JPEG
lives in the sibling ``functions/jpeg.py`` (numpy DCT math):

- image DIMENSIONS for JPEG/PNG/BMP/GIF: header parsing only, no pixel
  decode needed (JPEG needs a segment scan for SOF; PNG/BMP/GIF are
  fixed offsets);
- BMP (24-bit uncompressed): full decode to an ndarray, nearest-
  neighbor resize, re-encode — a complete real resize path;
- PNG (8-bit): full decode via stdlib zlib + numpy scanline
  unfiltering, and filter-0 encode;
- GIF (87a/89a incl. animation): full LZW decode of composited RGB
  frames (interlace, transparency, disposal) and exact-palette
  encode — the one animation format needing no external codec;
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
# PNG: 8-bit decode / encode (stdlib zlib + numpy unfiltering)
# ---------------------------------------------------------------------------

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_chunks(payload: bytes):
    i = 8
    n = len(payload)
    while i + 8 <= n:
        (length,) = struct.unpack(">I", payload[i : i + 4])
        ctype = payload[i + 4 : i + 8]
        yield ctype, payload[i + 8 : i + 8 + length]
        i += 12 + length  # length + type + data + crc
        if ctype == b"IEND":
            break


def decode_png(payload: bytes) -> np.ndarray:
    """8-bit PNG -> (height, width, channels) uint8 array.

    Real decode via stdlib ``zlib`` + numpy scanline unfiltering —
    no Pillow.  Supported: color types 0 (gray), 2 (RGB), 3 (palette;
    + tRNS alpha -> RGBA), 4 (gray+alpha), 6 (RGBA), non-interlaced.
    16-bit depth and Adam7 interlacing raise (genuinely need a full
    imaging library).  Filters: None/Up are whole-row vectorized; Sub
    is a per-lane uint8 cumulative sum; Average/Paeth fall back to a
    per-pixel loop along the row (sequential by definition)."""
    import zlib

    payload = bytes(payload)
    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    ihdr = plte = trns = None
    idat: list[bytes] = []
    for ctype, data in _png_chunks(payload):
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"tRNS":
            trns = data
        elif ctype == b"IDAT":
            idat.append(data)
    if ihdr is None or not idat:
        raise ValueError("corrupt PNG: missing IHDR/IDAT")
    w, h, depth, color_type, _comp, _filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if depth != 8:
        raise ValueError(
            f"only 8-bit PNG supported (got depth {depth}); 16-bit needs Pillow"
        )
    if interlace != 0:
        raise ValueError("Adam7-interlaced PNG needs Pillow")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        raise ValueError(f"unknown PNG color type {color_type}")
    bpp = channels
    stride = w * bpp
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("corrupt PNG pixel data")
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters = arr[:, 0]
    rows = arr[:, 1:]
    recon = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = int(filters[y])
        row = rows[y]
        if f == 0:
            cur = row.copy()
        elif f == 1:  # Sub: per-byte-lane cumsum, uint8 wrap = mod 256
            cur = np.add.accumulate(
                row.reshape(w, bpp), axis=0, dtype=np.uint8
            ).reshape(stride)
        elif f == 2:  # Up
            cur = row + prev  # uint8 wraps
        elif f == 3:  # Average
            cur = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                cur[x] = (int(row[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            cur = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (int(row[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {f}")
        recon[y] = cur
        prev = cur
    if color_type == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE chunk")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = recon.reshape(h, w)
        img = pal[idx]
        if trns is not None:
            alpha_lut = np.full(pal.shape[0], 255, dtype=np.uint8)
            alpha_lut[: len(trns)] = np.frombuffer(trns, dtype=np.uint8)
            img = np.concatenate([img, alpha_lut[idx][..., None]], axis=2)
        return img
    return recon.reshape(h, w, channels)


def encode_png(img: np.ndarray) -> bytes:
    """(h, w[, channels]) uint8 -> 8-bit PNG bytes (filter 0 rows,
    one zlib stream; gray / gray+alpha / RGB / RGBA by channel count)."""
    import zlib

    img = np.ascontiguousarray(np.asarray(img, dtype=np.uint8))
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, channels = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}.get(channels)
    if color_type is None:
        raise ValueError(f"unsupported channel count {channels}")
    body = np.zeros((h, w * channels + 1), dtype=np.uint8)
    body[:, 1:] = img.reshape(h, w * channels)
    idat = zlib.compress(body.tobytes(), 6)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def to_rgb(img: np.ndarray) -> np.ndarray:
    """Normalize a decoded image to (h, w, 3) RGB: replicate gray,
    drop alpha (training-pipeline convention: alpha is metadata, not
    signal, and compositing policy belongs to the caller)."""
    if img.ndim == 2:
        img = img[:, :, None]
    c = img.shape[2]
    if c == 1:
        return np.repeat(img, 3, axis=2)
    if c == 2:  # gray + alpha
        return np.repeat(img[:, :, :1], 3, axis=2)
    if c == 3:
        return img
    if c == 4:
        return img[:, :, :3]
    raise ValueError(f"unsupported channel count {c}")


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

# ---------------------------------------------------------------------------
# GIF: LZW decode / encode (pure Python, animated frames supported)
# ---------------------------------------------------------------------------

_GIF_MAGICS = (b"GIF87a", b"GIF89a")


def _gif_lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF-variant LZW -> uint8 palette-index array of length n_pixels.

    Codes are packed LSB-first; the dictionary starts at
    2**min_code_size entries, grows to 12-bit codes, and resets on the
    CLEAR code (GIF89a spec appendix F)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0

    acc = 0  # bit accumulator, LSB-first
    n_bits = 0
    pos = 0
    code_size = min_code_size + 1
    # dictionary as (prefix_code, tail_byte) pairs; -1 prefix = root
    prefix = [0] * 4096
    tail = [0] * 4096
    lengths = [1] * 4096
    next_code = end + 1
    prev_code = -1

    def emit(code: int) -> int:
        """Write the expansion of `code` into out; return its first byte."""
        nonlocal n_out
        ln = lengths[code]
        if n_out + ln > n_pixels:
            raise ValueError("GIF LZW output overruns image size")
        i = n_out + ln
        c = code
        while c >= clear:
            i -= 1
            out[i] = tail[c]
            c = prefix[c]
        i -= 1
        out[i] = c
        first = out[n_out]
        n_out += ln
        return int(first)

    while n_out < n_pixels:
        while n_bits < code_size:
            if pos >= len(data):
                raise ValueError("truncated GIF LZW stream")
            acc |= data[pos] << n_bits
            n_bits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        n_bits -= code_size
        if code == clear:
            next_code = end + 1
            code_size = min_code_size + 1
            prev_code = -1
            continue
        if code == end:
            break
        if prev_code < 0:
            if code >= clear:
                raise ValueError("GIF LZW stream starts with a non-root code")
            prev_first = emit(code)
            prev_code = code
            continue
        if code < next_code:
            first = emit(code)
        elif code == next_code:  # KwKwK case
            first = emit(prev_code)
            if n_out >= n_pixels:
                raise ValueError("GIF LZW output overruns image size")
            out[n_out] = prev_first
            n_out += 1
        else:
            raise ValueError("corrupt GIF LZW code")
        if next_code < 4096:
            prefix[next_code] = prev_code
            tail[next_code] = first
            lengths[next_code] = lengths[prev_code] + 1
            next_code += 1
            if next_code < 4096 and next_code == (1 << code_size):
                code_size += 1
        prev_code = code
        prev_first = first
    return out


def _gif_lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """uint8 palette indices -> GIF-variant LZW bytes (LSB-first)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    n_bits = 0
    code_size = min_code_size + 1

    def push(code: int):
        nonlocal acc, n_bits
        acc |= code << n_bits
        n_bits += code_size
        while n_bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n_bits -= 8

    table: dict[tuple[int, int], int] = {}
    next_code = end + 1
    push(clear)
    prev = -1
    for v in indices.tolist():
        if prev < 0:
            prev = v
            continue
        key = (prev, v)
        got = table.get(key)
        if got is not None:
            prev = got
            continue
        push(prev)
        if next_code < 4096:
            table[key] = next_code
            next_code += 1
            if next_code - 1 == (1 << code_size) and code_size < 12:
                code_size += 1
        else:  # table full: reset (keeps decoder dictionaries bounded)
            push(clear)
            table.clear()
            next_code = end + 1
            code_size = min_code_size + 1
        prev = v
    if prev >= 0:
        push(prev)
    push(end)
    if n_bits:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_subblocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate data sub-blocks starting at pos; return (data, next_pos)."""
    chunks = []
    while True:
        size = payload[pos]
        pos += 1
        if size == 0:
            break
        chunks.append(payload[pos : pos + size])
        pos += size
    return b"".join(chunks), pos


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif_frames(payload: bytes) -> list[np.ndarray]:
    """Animated (or still) GIF -> list of (h, w, 3) uint8 RGB frames,
    composited onto the logical screen with disposal methods 0/1
    (keep), 2 (restore to background) and 3 (restore to previous), and
    transparent-index holes showing the prior canvas — a real decoder
    for the one animation format that needs no external codec."""
    payload = bytes(payload)
    if payload[:6] not in _GIF_MAGICS:
        raise ValueError("not a GIF payload")
    w, h, packed, bg_index, _aspect = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8).reshape(-1, 3)
        pos += 3 * n

    if gct is not None and bg_index < len(gct):
        canvas = np.tile(gct[bg_index], (h, w, 1)).astype(np.uint8)
    else:
        canvas = np.zeros((h, w, 3), dtype=np.uint8)
    background = canvas.copy()

    frames: list[np.ndarray] = []
    transparent = -1
    disposal = 0
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = payload[pos]
            pos += 1
            data, pos = _gif_subblocks(payload, pos)
            if label == 0xF9 and len(data) >= 4:  # graphic control
                flags = data[0]
                disposal = (flags >> 2) & 0x07
                transparent = data[3] if flags & 0x01 else -1
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        left, top, fw, fh, fpacked = struct.unpack("<HHHHB", payload[pos : pos + 9])
        pos += 9
        palette = gct
        if fpacked & 0x80:
            n = 2 << (fpacked & 0x07)
            palette = np.frombuffer(
                payload[pos : pos + 3 * n], dtype=np.uint8
            ).reshape(-1, 3)
            pos += 3 * n
        if palette is None:
            raise ValueError("GIF frame without any color table")
        min_code_size = payload[pos]
        pos += 1
        lzw, pos = _gif_subblocks(payload, pos)
        idx = _gif_lzw_decode(lzw, min_code_size, fw * fh).reshape(fh, fw)
        if fpacked & 0x40:  # interlaced: rows arrive in 4 passes
            ordered = np.empty_like(idx)
            src = 0
            for start, step in _GIF_INTERLACE_PASSES:
                n_rows = len(range(start, fh, step))
                ordered[start::step] = idx[src : src + n_rows]
                src += n_rows
            idx = ordered
        prior = canvas.copy()
        patch = canvas[top : top + fh, left : left + fw]
        rgb = palette[np.minimum(idx, len(palette) - 1)]
        if transparent >= 0:
            mask = (idx != transparent)[:, :, None]
            patch[:] = np.where(mask, rgb, patch)
        else:
            patch[:] = rgb
        frames.append(canvas.copy())
        if disposal == 2:
            canvas[top : top + fh, left : left + fw] = background[
                top : top + fh, left : left + fw
            ]
        elif disposal == 3:
            canvas = prior
        disposal = 0
        transparent = -1
    if not frames:
        raise ValueError("GIF contains no image data")
    return frames


def decode_gif(payload: bytes) -> np.ndarray:
    """First (or only) frame of a GIF as (h, w, 3) uint8 RGB."""
    return decode_gif_frames(payload)[0]


def encode_gif(
    frames, delay_cs: int = 10, loop: bool = True
) -> bytes:
    """(h, w, 3) uint8 RGB frame or list of frames -> GIF89a bytes.

    Exact (lossless) palette encoding: the union of colors across
    frames must fit a 256-entry global color table, else this raises —
    quantization policy belongs to the caller (GIF is the wrong sink
    for photographic data; use PNG/BMP)."""
    if isinstance(frames, np.ndarray) and frames.ndim == 3:
        frames = [frames]
    frames = [np.ascontiguousarray(np.asarray(f, dtype=np.uint8)) for f in frames]
    h, w, _ = frames[0].shape
    if any(f.shape != (h, w, 3) for f in frames):
        raise ValueError("all GIF frames must be (h, w, 3) and same size")
    flat = np.concatenate([f.reshape(-1, 3) for f in frames])
    colors = np.unique(flat, axis=0)
    if len(colors) > 256:
        raise ValueError(
            f"GIF needs <=256 distinct colors (got {len(colors)}); "
            "quantize first or encode PNG/BMP"
        )
    # palette size = power of two >= len(colors), minimum 2
    size_exp = 1
    while (1 << size_exp) < len(colors):
        size_exp += 1
    pal = np.zeros((1 << size_exp, 3), dtype=np.uint8)
    pal[: len(colors)] = colors
    # color -> index lookup via a packed-int dict (exact, no quantizing)
    packed = (
        colors[:, 0].astype(np.int64) << 16
        | colors[:, 1].astype(np.int64) << 8
        | colors[:, 2].astype(np.int64)
    )
    lut = {int(p): i for i, p in enumerate(packed)}
    min_code_size = max(2, size_exp)

    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | ((size_exp - 1) & 0x07), 0, 0)
    out += pal.tobytes()
    if loop and len(frames) > 1:  # NETSCAPE2.0 infinite-loop extension
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for f in frames:
        if len(frames) > 1:
            out += b"\x21\xf9\x04" + struct.pack("<BHB", 0, delay_cs, 0) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        fp = (
            f[:, :, 0].astype(np.int64) << 16
            | f[:, :, 1].astype(np.int64) << 8
            | f[:, :, 2].astype(np.int64)
        ).reshape(-1)
        idx = np.array([lut[int(p)] for p in fp], dtype=np.uint8)
        out.append(min_code_size)
        lzw = _gif_lzw_encode(idx, min_code_size)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out += b"\x3b"
    return bytes(out)


def wav_spectral_features(
    payload: bytes,
    n_bands: int = 16,
    frame: int = 512,
    hop: int = 256,
) -> dict:
    """Real spectral features from PCM via numpy FFT — no librosa.

    Hann-windowed STFT power spectrum, then:
    - ``bands``: mean log-power in ``n_bands`` log-spaced frequency
      bands (a mel-ish filterbank without the mel constant — the
      log spacing is what matters for band separation);
    - ``centroid_hz``: power-weighted mean frequency;
    - ``rolloff_hz``: frequency below which 85% of power sits;
    - ``flatness``: geometric/arithmetic mean ratio (1.0 = white
      noise, ->0 = pure tone).
    """
    rate, _channels, samples = decode_wav(payload)
    mono = samples.mean(axis=1)
    n = len(mono)
    if n < frame:
        mono = np.pad(mono, (0, frame - n))
        n = frame
    window = np.hanning(frame)
    starts = range(0, n - frame + 1, hop)
    frames = np.stack([mono[s : s + frame] * window for s in starts])
    spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2  # (n_frames, frame/2+1)
    power = spec.mean(axis=0)  # average over time
    freqs = np.fft.rfftfreq(frame, d=1.0 / rate)

    # log-spaced band edges from ~30 Hz to Nyquist
    lo = max(30.0, freqs[1])
    edges = np.geomspace(lo, freqs[-1], n_bands + 1)
    bands = []
    for b in range(n_bands):
        mask = (freqs >= edges[b]) & (freqs < edges[b + 1])
        bands.append(
            float(np.log1p(power[mask].mean())) if mask.any() else 0.0
        )
    total = power.sum()
    if total > 0:
        centroid = float((freqs * power).sum() / total)
        cum = np.cumsum(power)
        rolloff = float(freqs[np.searchsorted(cum, 0.85 * total)])
        pos = power[power > 0]
        flatness = float(
            np.exp(np.log(pos).mean()) / pos.mean()
        ) if len(pos) else 0.0
    else:
        centroid = rolloff = flatness = 0.0
    return {
        "sample_rate": rate,
        "bands": bands,
        "centroid_hz": centroid,
        "rolloff_hz": rolloff,
        "flatness": flatness,
    }
