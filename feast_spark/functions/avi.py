"""Minimal AVI (RIFF) container parser + MJPEG video support.

With the baseline JPEG decoder in ``functions/jpeg.py``, Motion-JPEG
AVI — the classic codec-free video container (each frame is an
independent baseline JPEG) — decodes with zero external libraries, and
uncompressed 24-bit DIB AVI decodes with plain numpy.  That upgrades
``sample_video_frames`` from a byte-window fake to real frames for the
two AVI flavors that don't need ffmpeg.

Container layout (public MSDN 'AVI RIFF File Reference'):

    RIFF('AVI '
      LIST('hdrl' avih LIST('strl' strh strf ...))
      LIST('movi' {'00dc'|'00db'} ...)
      ['idx1'])

``00dc``/``00db`` = stream-0 compressed/uncompressed frame chunks; the
``strh`` fccHandler / ``strf`` biCompression identify MJPG vs raw DIB.

The writer emits MJPEG or DIB AVI for tests and stream simulation —
same spirit as ``codecs.encode_wav``/``encode_gif``.
"""

from __future__ import annotations

import struct

import numpy as np


def _riff_chunks(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_size) within [start, end)."""
    pos = start
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        yield fourcc, pos + 8, size
        pos += 8 + size + (size & 1)  # chunks pad to even offsets


def parse_avi(payload: bytes) -> dict:
    """AVI container -> {"codec", "width", "height", "fps", "frames":
    [bytes, ...]} without decoding pixel data.

    ``codec`` is "mjpeg", "dib" (uncompressed bottom-up BGR), or the
    raw fourcc lowercased for anything else (frames still extracted —
    callers can hash/ship them even without a decoder)."""
    payload = bytes(payload)
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    width = height = None
    fps = None
    codec = "unknown"
    bit_count = None
    frames: list[bytes] = []

    in_video_stream = False

    def walk(start: int, end: int):
        nonlocal width, height, fps, codec, bit_count, in_video_stream
        for fourcc, p, size in _riff_chunks(payload, start, end):
            if fourcc == b"LIST":
                walk(p + 4, p + size)  # skip the list-type fourcc
            elif fourcc == b"avih" and size >= 40:
                (us_per_frame,) = struct.unpack("<I", payload[p : p + 4])
                if us_per_frame:
                    fps = 1_000_000 / us_per_frame
                width, height = struct.unpack("<II", payload[p + 32 : p + 40])
            elif fourcc == b"strh" and size >= 8:
                # an strf belongs to the stream whose strh preceded it;
                # only a 'vids' strf is a BITMAPINFOHEADER (an audio
                # stream's strf is WAVEFORMATEX and must not be parsed
                # as video)
                in_video_stream = payload[p : p + 4] == b"vids"
                if in_video_stream:
                    handler = payload[p + 4 : p + 8].strip(b"\x00 ").upper()
                    if handler in (b"MJPG", b"MJPEG"):
                        codec = "mjpeg"
                    elif handler in (b"", b"DIB"):
                        codec = "dib"
                    else:
                        codec = handler.decode("ascii", "replace").lower()
            elif fourcc == b"strf" and size >= 20 and in_video_stream:
                # BITMAPINFOHEADER: biCompression at +16, biBitCount at +14
                (bit_count,) = struct.unpack("<H", payload[p + 14 : p + 16])
                (compression,) = struct.unpack("<I", payload[p + 16 : p + 20])
                if compression == 0:
                    codec = "dib"
                elif payload[p + 16 : p + 20] in (b"MJPG", b"GPJM"):
                    codec = "mjpeg"
            elif fourcc[2:4] in (b"dc", b"db") and fourcc[:2].isdigit():
                frames.append(payload[p : p + size])

    walk(12, len(payload))
    return {
        "codec": codec,
        "width": width,
        "height": height,
        "fps": fps,
        "bit_count": bit_count,
        "frames": frames,
    }


def decode_avi_frames(payload: bytes) -> list[np.ndarray]:
    """AVI -> list of (h, w, 3) uint8 RGB frames.

    MJPEG frames go through ``jpeg.decode_jpeg``; uncompressed DIB
    frames are bottom-up BGR rows with 4-byte stride padding (the BMP
    pixel-array layout without the file header).  Other codecs raise —
    that's ffmpeg territory."""
    info = parse_avi(payload)
    if not info["frames"]:
        raise ValueError("AVI contains no video frames")
    if info["codec"] == "mjpeg":
        from feast_spark.functions.jpeg import decode_jpeg

        return [decode_jpeg(f) for f in info["frames"]]
    if info["codec"] == "dib":
        w, h = info["width"], info["height"]
        if not w or not h or info.get("bit_count") not in (24, None):
            raise ValueError("only 24-bit uncompressed DIB AVI supported")
        stride = (w * 3 + 3) & ~3
        out = []
        for f in info["frames"]:
            rows = np.frombuffer(f, dtype=np.uint8, count=stride * h).reshape(
                h, stride
            )[:, : w * 3]
            out.append(rows.reshape(h, w, 3)[::-1, :, ::-1].copy())  # BGR up
        return out
    raise ValueError(
        f"AVI codec {info['codec']!r} needs ffmpeg/pyav; only MJPEG and "
        "uncompressed DIB decode natively"
    )


def encode_avi(
    frames,
    fps: float = 30.0,
    codec: str = "mjpeg",
    quality: int = 90,
) -> bytes:
    """List of (h, w, 3) uint8 RGB frames -> AVI bytes (MJPEG or
    uncompressed DIB)."""
    frames = [np.ascontiguousarray(np.asarray(f, dtype=np.uint8)) for f in frames]
    if not frames:
        raise ValueError("no frames")
    h, w, _ = frames[0].shape
    if any(f.shape != (h, w, 3) for f in frames):
        raise ValueError("all AVI frames must be (h, w, 3) and same size")

    if codec == "mjpeg":
        from feast_spark.functions.jpeg import encode_jpeg

        payloads = [encode_jpeg(f, quality) for f in frames]
        handler, compression = b"MJPG", b"MJPG"
    elif codec == "dib":
        stride = (w * 3 + 3) & ~3
        payloads = []
        for f in frames:
            rows = np.zeros((h, stride), dtype=np.uint8)
            rows[:, : w * 3] = f[::-1, :, ::-1].reshape(h, w * 3)
            payloads.append(rows.tobytes())
        handler, compression = b"DIB ", struct.pack("<I", 0)
    else:
        raise ValueError("codec must be 'mjpeg' or 'dib'")

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(list_type: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", list_type + body)

    us_per_frame = int(round(1_000_000 / fps))
    max_bytes = max(len(p) for p in payloads)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        us_per_frame, max_bytes * int(fps) if fps else 0, 0, 0x10,
        len(payloads), 0, 1, max_bytes, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + handler
        + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, int(round(fps)), 0,
                      len(payloads), max_bytes, 0, 0, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHH", 40, w, h, 1, 24) + (
        compression if isinstance(compression, bytes) and len(compression) == 4
        else compression
    ) + struct.pack("<IiiII", len(payloads[0]), 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(
        b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)
    ))
    movi_body = b"".join(chunk(b"00dc", p) for p in payloads)
    movi = lst(b"movi", movi_body)
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
