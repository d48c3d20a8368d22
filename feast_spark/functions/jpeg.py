"""Pure-Python baseline JPEG codec (numpy DCT math, stdlib bit I/O).

The container has no Pillow/libjpeg, but baseline sequential JPEG
(SOF0, the overwhelming majority of stored JPEGs) is specified fully
in ITU-T T.81 and decodable with nothing beyond numpy:

- marker segment parse (DQT/DHT/SOF0/SOS/DRI, APPn skipped),
- canonical Huffman decode of the entropy-coded stream (byte
  unstuffing, restart markers),
- dequantize + de-zigzag + 8x8 inverse DCT as one batched matrix
  multiply over all blocks of a component (no per-pixel loops),
- chroma upsampling (4:4:4 / 4:2:2 / 4:2:0) and YCbCr -> RGB.

The encoder emits 4:4:4 baseline with the T.81 Annex K example quant
and Huffman tables — not for production (use libjpeg), but it makes
the decoder testable end-to-end with controlled inputs: JPEG is lossy,
so tests assert PSNR bounds and exact reconstruction of DC-only
(smooth) content rather than byte equality.

Progressive (SOF2), arithmetic coding, and 12-bit depth raise — those
genuinely warrant libjpeg.  Reference parity note: the reference
(gojek/feast v0.11) has no media codecs at all; this exists for the
training-data pipeline surface (multimodal.py image contracts).

Performance posture, stated honestly: the Huffman entropy decode is a
per-bit Python loop — correct and dependency-free, but ~100x slower
than libjpeg; the IDCT/color stages are vectorized numpy.  Fine for
thumbnails, tests, and moderate-resolution corpus work (Arrow
batching spreads images across all cores); a production 100 TB image
pipeline should drop Pillow/libjpeg-turbo into the same
``decode_jpeg`` slot in ``multimodal.py`` — the Spark-side plumbing
(schemas, batching, routing) is unchanged by that swap.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag order: index i of this array = position in the 8x8 block
# (row-major) of the i-th coefficient in scan order
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# orthonormal 8-point DCT-II matrix: X = C @ x, x = C.T @ X
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos(np.pi * _k * (2 * _n + 1) / 16) * (
            np.sqrt(1 / 8) if _k == 0 else np.sqrt(2 / 8)
        )


def _idct_blocks(coef: np.ndarray) -> np.ndarray:
    """(n, 8, 8) DCT coefficients -> (n, 8, 8) samples, batched."""
    return _C.T @ coef @ _C


def _dct_blocks(blocks: np.ndarray) -> np.ndarray:
    return _C @ blocks @ _C.T


# --------------------------------------------------------------------------
# Annex K example tables (public spec tables, used by the encoder and by
# virtually every camera/encoder as defaults)
# --------------------------------------------------------------------------

_QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

_QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

# (bits-per-length counts, symbol values) — T.81 tables K.3-K.6
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _build_huffman(bits: list[int], vals: list[int]):
    """Canonical Huffman -> {(length, code): symbol} plus the same as
    fast nested dict for decode, and {symbol: (code, length)} for
    encode."""
    decode: dict[tuple[int, int], int] = {}
    encode: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            decode[(length, code)] = vals[k]
            encode[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return decode, encode


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with 0xFF00
    unstuffing; stops at any real marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self):
        d = self.data
        while self.n <= 24:
            if self.pos >= len(d):
                # pad with zeros past the end (spec allows); must shift acc
                # like the marker branch or consumed bits get re-delivered
                self.acc = (self.acc << 8) & 0xFFFFFFFF
                self.n += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:  # stuffed byte
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:  # restart marker: caller resets
                    return
                else:  # real marker (EOI/next segment): pad
                    self.acc = (self.acc << 8) & 0xFFFFFFFF
                    self.n += 8
                    continue
            else:
                self.pos += 1
            self.acc = ((self.acc << 8) | b) & 0xFFFFFFFF
            self.n += 8

    def read_bit(self) -> int:
        if self.n == 0:
            self._fill()
            if self.n == 0:
                raise ValueError("truncated JPEG entropy stream")
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_restart(self):
        """Skip to just past the next RSTn marker and clear the
        accumulator."""
        self.acc = 0
        self.n = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("missing JPEG restart marker")

    def decode_huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t-bit magnitude to signed value."""
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG -> (h, w, 3) uint8 RGB (grayscale replicated).

    Supports SOF0 (baseline sequential), 1-3 components, sampling
    factors up to 2x2 (4:4:4, 4:2:2, 4:2:0), restart intervals.
    SOF2/progressive and arithmetic coding raise."""
    payload = bytes(payload)
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    restart_interval = 0
    frame = None
    i = 2
    n = len(payload)
    while i + 4 <= n:
        if payload[i] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = payload[i + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
            i += 2
            continue
        if marker == 0xD9:  # EOI
            break
        seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
        seg = payload[i + 4 : i + 2 + seg_len]
        if marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc_th = seg[p]
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nv])
                table, _ = _build_huffman(bits, vals)
                if tc_th >> 4 == 0:
                    huff_dc[tc_th & 0x0F] = table
                else:
                    huff_ac[tc_th & 0x0F] = table
                p += 17 + nv
        elif marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq_tq = seg[p]
                if pq_tq >> 4 == 0:
                    q = np.array(list(seg[p + 1 : p + 65]), dtype=np.int64)
                    p += 65
                else:  # 16-bit table
                    q = np.array(
                        list(struct.unpack(">64H", seg[p + 1 : p + 129])),
                        dtype=np.int64,
                    )
                    p += 129
                tbl = np.zeros(64, dtype=np.int64)
                tbl[_ZIGZAG] = q
                quant[pq_tq & 0x0F] = tbl.reshape(8, 8)
        elif marker == 0xC0:  # SOF0 baseline
            _prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"only baseline JPEG (SOF0) supported, got SOF marker "
                f"0xFF{marker:02X}; progressive/arithmetic needs libjpeg"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS: entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF0")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, td_ta = seg[1 + 2 * c : 3 + 2 * c]
                comp = next(x for x in frame["comps"] if x["id"] == cs)
                scan.append((comp, td_ta >> 4, td_ta & 0x0F))
            return _decode_scan(
                payload, i + 2 + seg_len, frame, scan, quant, huff_dc,
                huff_ac, restart_interval,
            )
        i += 2 + seg_len
    raise ValueError("JPEG has no scan data")


def _decode_scan(payload, pos, frame, scan, quant, huff_dc, huff_ac,
                 restart_interval):
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c, _, _ in scan)
    vmax = max(c["v"] for c, _, _ in scan)
    if hmax > 2 or vmax > 2:
        raise ValueError("JPEG sampling factors beyond 2x2 unsupported")
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    # per-component coefficient planes in block units
    planes = []
    for comp, _, _ in scan:
        bw = mcus_x * comp["h"]
        bh = mcus_y * comp["v"]
        planes.append(np.zeros((bh, bw, 8, 8), dtype=np.int64))
    reader = _BitReader(payload, pos)
    pred = [0] * len(scan)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.align_to_restart()
                pred = [0] * len(scan)
            for ci, (comp, td, ta) in enumerate(scan):
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        blk = np.zeros(64, dtype=np.int64)
                        t = reader.decode_huff(huff_dc[td])
                        diff = _extend(reader.read_bits(t), t) if t else 0
                        pred[ci] += diff
                        blk[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = reader.decode_huff(huff_ac[ta])
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL: 16 zeros
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            blk[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        out = np.zeros(64, dtype=np.int64)
                        out[_ZIGZAG] = blk
                        planes[ci][
                            my * comp["v"] + by, mx * comp["h"] + bx
                        ] = out.reshape(8, 8)
            mcu_count += 1
    # dequantize + batched IDCT + reassemble per component
    channels = []
    for ci, (comp, _, _) in enumerate(scan):
        q = quant[comp["tq"]]
        bh, bw = planes[ci].shape[:2]
        coef = planes[ci].reshape(-1, 8, 8) * q
        pix = _idct_blocks(coef.astype(np.float64)) + 128.0
        pix = pix.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(
            bh * 8, bw * 8
        )
        # upsample to full resolution (nearest; sampling <= 2)
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1 or rx > 1:
            pix = np.repeat(np.repeat(pix, ry, axis=0), rx, axis=1)
        channels.append(pix[:h, :w])
    if len(channels) == 1:
        y = np.clip(channels[0], 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    y, cb, cr = channels[0], channels[1] - 128.0, channels[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# encoder (4:4:4 baseline, Annex K tables) — test harness for the decoder
# --------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        for k in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> k) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self):
        if self.n:
            self.acc = (self.acc << (8 - self.n)) | ((1 << (8 - self.n)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0


def _scale_quant(tbl: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-compatible quality scaling of a quant table."""
    quality = min(max(quality, 1), 100)
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = (tbl * s + 50) // 100
    return np.clip(out, 1, 255)


def _encode_block(wr, blk, q, dc_enc, ac_enc, pred):
    coef = np.round(_dct_blocks(blk.astype(np.float64) - 128.0) / q).astype(
        np.int64
    )
    zz = coef.reshape(-1)[_ZIGZAG]  # scan order
    diff = int(zz[0]) - pred

    def magnitude(v: int) -> tuple[int, int]:
        if v == 0:
            return 0, 0
        a = abs(v)
        t = a.bit_length()
        return t, (v if v > 0 else v + (1 << t) - 1)

    t, bitsv = magnitude(diff)
    code, ln = dc_enc[t]
    wr.write(code, ln)
    if t:
        wr.write(bitsv, t)
    run = 0
    last_nz = 0
    for k in range(1, 64):
        if zz[k] != 0:
            last_nz = k
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_enc[0xF0]
            wr.write(code, ln)
            run -= 16
        t, bitsv = magnitude(v)
        code, ln = ac_enc[(run << 4) | t]
        wr.write(code, ln)
        wr.write(bitsv, t)
        run = 0
    if last_nz < 63:
        code, ln = ac_enc[0x00]  # EOB
        wr.write(code, ln)
    return int(zz[0])


def encode_jpeg(
    img: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """(h, w, 3) uint8 RGB (or (h, w) gray) -> baseline JPEG.

    ``subsampling``: "444" (one block per component per MCU) or "420"
    (2x2 luma blocks + 1 Cb + 1 Cr per MCU — the common camera
    layout).  ``restart_interval`` > 0 emits DRI + RSTn markers every
    N MCUs (the resync path real encoders use for error resilience)."""
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    if gray:
        img = img[:, :, None]
    h, w = img.shape[:2]
    if gray:
        planes = [img[:, :, 0].astype(np.float64)]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
    q_luma = _scale_quant(_QUANT_LUMA, quality)
    q_chroma = _scale_quant(_QUANT_CHROMA, quality)
    _, dc_l = _build_huffman(_DC_LUMA_BITS, _DC_LUMA_VALS)
    _, ac_l = _build_huffman(_AC_LUMA_BITS, _AC_LUMA_VALS)
    _, dc_c = _build_huffman(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    _, ac_c = _build_huffman(_AC_CHROMA_BITS, _AC_CHROMA_VALS)

    out = bytearray(b"\xff\xd8")  # SOI

    def segment(marker: int, body: bytes):
        out.extend(b"\xff" + bytes([marker]))
        out.extend(struct.pack(">H", len(body) + 2))
        out.extend(body)

    def zz_bytes(q):
        return bytes(int(q.reshape(-1)[z]) for z in _ZIGZAG)

    segment(0xDB, b"\x00" + zz_bytes(q_luma))
    if not gray:
        segment(0xDB, b"\x01" + zz_bytes(q_chroma))
    nc = 1 if gray else 3
    sub420 = subsampling == "420" and not gray
    luma_hv = 0x22 if sub420 else 0x11
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for c in range(nc):
        sof += bytes([c + 1, luma_hv if c == 0 else 0x11, 0 if c == 0 else 1])
    segment(0xC0, sof)

    def dht(tc, th, bits, vals):
        segment(0xC4, bytes([tc << 4 | th]) + bytes(bits) + bytes(vals))

    dht(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS)
    dht(1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS)
    if not gray:
        dht(0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS)
        dht(1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS)
    if restart_interval:
        segment(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nc])
    for c in range(nc):
        sos += bytes([c + 1, 0x00 if c == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    segment(0xDA, sos)

    # MCU geometry: 4:2:0 packs 2x2 luma blocks per MCU with chroma
    # box-averaged to half resolution; 4:4:4 is one block per component
    if sub420:
        mcu_px = 16
        ph = -(-h // 16) * 16
        pw = -(-w // 16) * 16
        y_pad = np.pad(planes[0], ((0, ph - h), (0, pw - w)), mode="edge")
        chroma = []
        for p in planes[1:]:
            cp = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
            chroma.append(
                cp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            )
        mcus_y, mcus_x = ph // 16, pw // 16
    else:
        mcu_px = 8
        ph = -(-h // 8) * 8
        pw = -(-w // 8) * 8
        padded = [
            np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge") for p in planes
        ]
        mcus_y, mcus_x = ph // 8, pw // 8

    wr = _BitWriter()
    pred = [0] * nc
    mcu_count = 0
    rst = 0
    for by in range(mcus_y):
        for bx in range(mcus_x):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                wr.flush()
                wr.out.extend(b"\xff" + bytes([0xD0 + rst]))
                rst = (rst + 1) % 8
                pred = [0] * nc
            if sub420:
                for sy in range(2):
                    for sx in range(2):
                        blk = y_pad[
                            by * 16 + sy * 8 : by * 16 + sy * 8 + 8,
                            bx * 16 + sx * 8 : bx * 16 + sx * 8 + 8,
                        ]
                        pred[0] = _encode_block(
                            wr, blk, q_luma, dc_l, ac_l, pred[0]
                        )
                for ci, cp in enumerate(chroma, start=1):
                    blk = cp[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                    pred[ci] = _encode_block(
                        wr, blk, q_chroma, dc_c, ac_c, pred[ci]
                    )
            else:
                for ci in range(nc):
                    q = q_luma if ci == 0 else q_chroma
                    dc_enc = dc_l if ci == 0 else dc_c
                    ac_enc = ac_l if ci == 0 else ac_c
                    blk = padded[ci][
                        by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8
                    ]
                    pred[ci] = _encode_block(wr, blk, q, dc_enc, ac_enc, pred[ci])
            mcu_count += 1
    wr.flush()
    out.extend(wr.out)
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)
