"""Baseline JPEG codec — pure Python + numpy, no codec library.

Decoder: general baseline (SOF0) sequential DCT JPEG — quantization and
huffman tables are read from the FILE's own DQT/DHT segments, so any
conforming baseline payload decodes regardless of which tables produced
it. Supports multi-component scans with arbitrary sampling factors
(4:4:4, 4:2:2, 4:2:0), byte stuffing, and restart intervals.
Progressive (SOF2), arithmetic coding, and 12-bit precision return None.

Encoder: sequential baseline with 4:4:4 or 4:2:0 chroma subsampling and
self-describing simple canonical huffman tables (all DC categories at 4
bits, all AC run/size symbols at 9 bits) — valid JPEG, chosen so the
tables can be CONSTRUCTED rather than transcribed; compression ratio is
not the point, correctness is.

The entropy loops are Python-speed: this is a correctness-complete
fallback for modest images (the same stance as the GIF LZW path); wire a
codec library for bulk corpora.

No reference counterpart (net-new per the project north star).
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

import numpy as np


def _zigzag_order() -> np.ndarray:
    """The JPEG zigzag scan as flat indices into a row-major 8x8 block."""
    order = []
    for d in range(15):
        rng = range(d, -1, -1) if d % 2 == 0 else range(0, d + 1)
        for r in rng:
            c = d - r
            if r < 8 and c < 8:
                order.append(r * 8 + c)
    return np.array(order, dtype=np.int64)


ZIGZAG = _zigzag_order()
_C = np.array([[np.sqrt((1 if u == 0 else 2) / 8.0)
                * np.cos((2 * x + 1) * u * np.pi / 16.0)
                for x in range(8)] for u in range(8)])


def _idct2(block: np.ndarray) -> np.ndarray:
    return _C.T @ block @ _C


def _dct2(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


# ---------------------------------------------------------------------------
# Huffman
# ---------------------------------------------------------------------------


def _canonical_codes(bits: List[int],
                     values: List[int]) -> Dict[int, Tuple[int, int]]:
    """symbol -> (code, length) per JPEG canonical assignment."""
    out: Dict[int, Tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitReader:
    """MSB-first reader over entropy-coded data with FF00 unstuffing;
    stops at any non-RST marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bit = 0

    def read_bit(self) -> int:
        d, p = self.data, self.pos
        if p >= len(d):
            raise EOFError
        byte = d[p]
        if byte == 0xFF:
            nxt = d[p + 1] if p + 1 < len(d) else None
            if nxt != 0x00:
                raise EOFError  # marker reached
        bit = (byte >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 2 if byte == 0xFF else 1
        return bit

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_marker(self) -> Optional[int]:
        """Skip to the next marker (used for RSTn); returns the marker
        byte or None."""
        if self.bit:
            self.bit = 0
            self.pos += 1
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and d[self.pos + 1] != 0x00:
                m = d[self.pos + 1]
                self.pos += 2
                return m
            self.pos += 1
        return None


def _decode_huffman(reader: _BitReader,
                    table: Dict[Tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | reader.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid huffman code")


def _extend(v: int, s: int) -> int:
    """JPEG signed-magnitude: s-bit value v -> signed coefficient."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def decode_jpeg(data: Optional[bytes]) -> Optional[np.ndarray]:
    """Decode a baseline (SOF0) JPEG payload to RGB uint8
    (height, width, 3); grayscale JPEGs are replicated across channels.
    Returns None for progressive/arithmetic/12-bit or corrupt payloads."""
    if not data or data[:2] != b"\xff\xd8":
        return None
    try:
        return _decode_jpeg_inner(data)
    except (EOFError, ValueError, IndexError, KeyError, struct.error,
            ZeroDivisionError):
        return None


def _decode_jpeg_inner(data: bytes) -> Optional[np.ndarray]:
    qt: Dict[int, np.ndarray] = {}
    huff: Dict[Tuple[int, int], Dict[Tuple[int, int], int]] = {}
    frame = None
    restart_interval = 0
    i = 2
    while i + 4 <= len(data):
        if data[i] != 0xFF:
            return None
        marker = data[i + 1]
        if marker == 0xD9:                          # EOI
            return None
        seg_len = struct.unpack(">H", data[i + 2:i + 4])[0]
        seg = data[i + 4:i + 2 + seg_len]
        if marker == 0xDB:                          # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0x0F
                if pq != 0:
                    return None                     # 16-bit tables: no
                tbl = np.zeros(64)
                tbl[ZIGZAG] = np.frombuffer(seg, np.uint8, 64, j + 1)
                qt[tq] = tbl.reshape(8, 8)
                j += 65
        elif marker == 0xC4:                        # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0x0F
                bits = list(seg[j + 1:j + 17])
                n = sum(bits)
                values = list(seg[j + 17:j + 17 + n])
                codes = _canonical_codes(bits, values)
                huff[(tc, th)] = {(ln, code): sym
                                  for sym, (code, ln) in codes.items()}
                j += 17 + n
        elif marker == 0xC0 or marker == 0xC1:      # SOF0/1 baseline
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                return None
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + c * 3:9 + c * 3]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            return None                             # non-baseline
        elif marker == 0xDD:                        # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:                        # SOS
            if frame is None:
                return None
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tt = seg[1 + c * 2], seg[2 + c * 2]
                comp = next(x for x in frame["comps"] if x["id"] == cs)
                scan.append((comp, tt >> 4, tt & 0x0F))
            return _decode_scan(data, i + 2 + seg_len, frame, scan, qt,
                                huff, restart_interval)
        i += 2 + seg_len
    return None


def _decode_scan(data, pos, frame, scan, qt, huff, restart_interval):
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c, _, _ in scan)
    vmax = max(c["v"] for c, _, _ in scan)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = []
    for comp, _, _ in scan:
        planes.append(np.zeros((mcus_y * comp["v"] * 8,
                                mcus_x * comp["h"] * 8)))
    reader = _BitReader(data, pos)
    pred = [0] * len(scan)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count == restart_interval:
                m = reader.align_to_marker()
                if m is None or not (0xD0 <= m <= 0xD7):
                    raise ValueError("missing restart marker")
                pred = [0] * len(scan)
                mcu_count = 0
            for ci, (comp, dc_id, ac_id) in enumerate(scan):
                dct = huff[(0, dc_id)]
                act = huff[(1, ac_id)]
                q = qt[comp["tq"]]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        coef = np.zeros(64)
                        s = _decode_huffman(reader, dct)
                        diff = _extend(reader.read_bits(s), s)
                        pred[ci] += diff
                        coef[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _decode_huffman(reader, act)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break               # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC overflow")
                            coef[ZIGZAG[k]] = _extend(
                                reader.read_bits(s), s)
                            k += 1
                        block = _idct2(coef.reshape(8, 8) * q) + 128.0
                        y0 = (my * comp["v"] + by) * 8
                        x0 = (mx * comp["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = block
            mcu_count += 1
    # upsample to full resolution and crop
    full = []
    for (comp, _, _), plane in zip(scan, planes):
        plane = np.repeat(np.repeat(plane, vmax // comp["v"], axis=0),
                          hmax // comp["h"], axis=1)
        full.append(plane[:h, :w])
    if len(full) == 1:
        g = np.clip(full[0], 0, 255).astype(np.uint8)
        return np.stack([g] * 3, axis=-1)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Encoder (tables constructed, embedded in the stream)
# ---------------------------------------------------------------------------

# All 12 DC categories as 4-bit codes; all 162 AC run/size symbols as
# 9-bit codes. Canonical, prefix-free, and the all-ones max-length code
# stays unused — a valid (if deliberately simple) JPEG table pair.
_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_VALUES = list(range(12))
_AC_VALUES = ([0x00, 0xF0]
              + [(r << 4) | s for r in range(16) for s in range(1, 11)])
_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 0, len(_AC_VALUES), 0, 0, 0, 0, 0, 0, 0]

_QUANT = np.full((8, 8), 8.0)                      # flat, mild


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        for b in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> b) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)          # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.write(1, 1)                        # pad with 1s


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _encode_block(writer, coef, pred, dc_codes, ac_codes):
    zz = coef.reshape(64)[ZIGZAG]
    dc = int(zz[0])
    diff = dc - pred
    s = _category(diff)
    code, ln = dc_codes[s]
    writer.write(code, ln)
    if s:
        writer.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]
            writer.write(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ac_codes[(run << 4) | s]
        writer.write(code, ln)
        writer.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        code, ln = ac_codes[0x00]
        writer.write(code, ln)
    return dc


def encode_jpeg(pixels: np.ndarray, subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """Encode RGB (h, w, 3) or grayscale (h, w) uint8 as baseline JPEG
    (4:2:0 when ``subsample``, else 4:4:4), flat quant tables, simple
    canonical huffman tables embedded via DQT/DHT; ``restart_interval``
    emits DRI + RSTn markers every N MCUs."""
    px = np.asarray(pixels, dtype=np.float64)
    if px.ndim == 2:
        px = np.stack([px] * 3, axis=-1)
    h, w = px.shape[:2]
    r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b

    sh, sv = (2, 2) if subsample else (1, 1)
    mcu_w, mcu_h = 8 * sh, 8 * sv
    pw = -(-w // mcu_w) * mcu_w
    ph = -(-h // mcu_h) * mcu_h

    def pad(plane, tw, th):
        out = np.empty((th, tw))
        ph_, pw_ = plane.shape
        out[:ph_, :pw_] = plane
        out[ph_:, :pw_] = plane[-1:, :]
        out[:, pw_:] = out[:, pw_ - 1:pw_]
        return out

    ypl = pad(y, pw, ph)
    if subsample:
        cbp = pad(cb, pw, ph).reshape(ph // 2, 2, pw // 2, 2).mean((1, 3))
        crp = pad(cr, pw, ph).reshape(ph // 2, 2, pw // 2, 2).mean((1, 3))
    else:
        cbp, crp = pad(cb, pw, ph), pad(cr, pw, ph)

    dc_codes = _canonical_codes(_DC_BITS, _DC_VALUES)
    ac_codes = _canonical_codes(_AC_BITS, _AC_VALUES)

    writer = _BitWriter()
    preds = [0, 0, 0]
    mcus_x, mcus_y = pw // mcu_w, ph // mcu_h
    comps = [(ypl, sh, sv), (cbp, 1, 1), (crp, 1, 1)]
    mcu_count, rst = 0, 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count == restart_interval:
                writer.flush()
                writer.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0, 0, 0]
                mcu_count = 0
            mcu_count += 1
            for ci, (plane, ch, cv) in enumerate(comps):
                for by in range(cv):
                    for bx in range(ch):
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        block = plane[y0:y0 + 8, x0:x0 + 8] - 128.0
                        coef = np.round(_dct2(block) / _QUANT)
                        preds[ci] = _encode_block(
                            writer, coef, preds[ci], dc_codes, ac_codes)
    writer.flush()

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(payload) + 2) + payload

    # DQT carries the table in zigzag order: entry k is the quantizer at
    # natural position ZIGZAG[k] (mirrors the decoder's tbl[ZIGZAG] = raw).
    qbytes = np.empty(64, dtype=np.uint8)
    flat = _QUANT.reshape(64)
    for k in range(64):
        qbytes[k] = int(flat[ZIGZAG[k]])
    dqt = seg(0xDB, bytes([0x00]) + qbytes.tobytes())
    sof = seg(0xC0, struct.pack(">BHHB", 8, h, w, 3)
              + bytes([1, (sh << 4) | sv, 0,
                       2, 0x11, 0,
                       3, 0x11, 0]))
    dht = seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALUES)) \
        + seg(0xC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALUES))
    sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    dri = (seg(0xDD, struct.pack(">H", restart_interval))
           if restart_interval else b"")
    return (b"\xff\xd8" + dqt + sof + dht + dri + sos + bytes(writer.out)
            + b"\xff\xd9")
