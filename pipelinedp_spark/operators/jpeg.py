"""Baseline + progressive JPEG codec — pure Python + numpy, no codec
library.

Decoder: general baseline (SOF0/1) sequential DCT JPEG and progressive
(SOF2) DCT JPEG (ITU T.81 Annex G: spectral selection + successive
approximation — DC first/refine, AC first/refine with EOB runs) —
quantization and huffman tables are read from the FILE's own DQT/DHT
segments, so any conforming payload decodes regardless of which tables
produced it. Supports multi-component scans with arbitrary sampling
factors (4:4:4, 4:2:2, 4:2:0), byte stuffing, and restart intervals.
Arithmetic coding, hierarchical, and 12-bit precision return None.

Encoder: sequential baseline (encode_jpeg) or progressive
(encode_jpeg_progressive — DC-first/AC-first/DC-refine/AC-refine scan
script with cross-block EOB runs and buffered correction bits, the
libjpeg scan shape) with 4:4:4 or 4:2:0 chroma subsampling and
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
    """Decode a baseline (SOF0/1) or progressive (SOF2) JPEG payload to
    RGB uint8 (height, width, 3); grayscale JPEGs are replicated across
    channels. Returns None for arithmetic/hierarchical/12-bit or corrupt
    payloads."""
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
    progressive = False
    coefs = None
    restart_interval = 0
    i = 2
    while i + 4 <= len(data):
        if data[i] != 0xFF:
            return None
        marker = data[i + 1]
        if marker == 0xD9:                          # EOI
            break
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
        elif marker == 0xC2:                        # SOF2 progressive
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                return None
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + c * 3:9 + c * 3]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
            progressive = True
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            return None                             # non-DCT/arithmetic
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
            if not progressive:
                return _decode_scan(data, i + 2 + seg_len, frame, scan,
                                    qt, huff, restart_interval)
            if coefs is None:
                coefs = _alloc_coefs(frame)
            ss, se = seg[1 + ns * 2], seg[2 + ns * 2]
            ahal = seg[3 + ns * 2]
            i = _decode_progressive_scan(
                data, i + 2 + seg_len, frame, scan, ss, se,
                ahal >> 4, ahal & 0x0F, huff, restart_interval, coefs)
            continue
        i += 2 + seg_len
    if progressive and coefs is not None:
        return _reconstruct_progressive(frame, coefs, qt)
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
    return _planes_to_rgb([c for c, _, _ in scan], planes, h, w,
                          hmax, vmax)


def _planes_to_rgb(comps, planes, h, w, hmax, vmax) -> np.ndarray:
    """Upsample component planes to full resolution, crop, and convert
    YCbCr (or replicate grayscale) to RGB uint8 — shared by the baseline
    and progressive reconstruction paths."""
    full = []
    for comp, plane in zip(comps, planes):
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
# Progressive decoder (T.81 Annex G: spectral selection + successive
# approximation). Coefficients accumulate across scans in per-component
# int32 block grids; dequantize + IDCT happen once at EOI.
# ---------------------------------------------------------------------------


def _frame_geometry(frame):
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcus_x = -(-frame["w"] // (8 * hmax))
    mcus_y = -(-frame["h"] // (8 * vmax))
    return hmax, vmax, mcus_x, mcus_y


def _comp_blocks(frame, comp):
    """Non-interleaved block count of one component: blocks over the
    component's own (sampled) dimensions, per T.81 A.2.2."""
    hmax, vmax, _, _ = _frame_geometry(frame)
    cw = -(-frame["w"] * comp["h"] // hmax)
    ch = -(-frame["h"] * comp["v"] // vmax)
    return -(-ch // 8), -(-cw // 8)


def _alloc_coefs(frame):
    _, _, mcus_x, mcus_y = _frame_geometry(frame)
    return [np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64), np.int32)
            for c in frame["comps"]]


def _refine_nonzero(reader, coef, z, p1, m1):
    """One correction bit for an already-nonzero coefficient."""
    if reader.read_bit():
        if (int(coef[z]) & p1) == 0:
            coef[z] += p1 if coef[z] >= 0 else m1


def _prog_ac_first(reader, coef, act, ss, se, al, eobrun):
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _decode_huffman(reader, act)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:                             # ZRL
                k += 16
                continue
            eobrun = 1 << r
            if r:
                eobrun += reader.read_bits(r)
            return eobrun - 1                       # covers this block
        k += r
        if k > se:
            raise ValueError("AC overflow")
        coef[ZIGZAG[k]] = _extend(reader.read_bits(s), s) << al
        k += 1
    return 0


def _prog_ac_refine(reader, coef, act, ss, se, al, eobrun):
    p1, m1 = 1 << al, -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _decode_huffman(reader, act)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read_bits(r)
                    break
                val = 0                             # ZRL: skip 16 zeros
            else:
                if s != 1:
                    raise ValueError("bad refine size")
                val = p1 if reader.read_bit() else m1
            while k <= se:
                z = ZIGZAG[k]
                if coef[z] != 0:
                    _refine_nonzero(reader, coef, z, p1, m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                coef[ZIGZAG[k]] = val
            k += 1
    if eobrun > 0:
        while k <= se:                              # EOB: refine the rest
            z = ZIGZAG[k]
            if coef[z] != 0:
                _refine_nonzero(reader, coef, z, p1, m1)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_progressive_scan(data, pos, frame, scan, ss, se, ah, al,
                             huff, restart_interval, coefs):
    """Decode one progressive SOS; returns the offset of the next marker
    (pointing at its 0xFF)."""
    reader = _BitReader(data, pos)
    hmax, vmax, mcus_x, mcus_y = _frame_geometry(frame)
    comp_idx = {c["id"]: i for i, c in enumerate(frame["comps"])}
    ns = len(scan)
    state = {"preds": [0] * ns, "eobrun": 0, "mcus": 0}

    def maybe_restart():
        if restart_interval and state["mcus"] == restart_interval:
            m = reader.align_to_marker()
            if m is None or not (0xD0 <= m <= 0xD7):
                raise ValueError("missing restart marker")
            state["preds"] = [0] * ns
            state["eobrun"] = 0
            state["mcus"] = 0

    if ss == 0:                                     # DC scan
        if se != 0:
            raise ValueError("DC scan with Se != 0")

        def dc_block(ci, dct, coef):
            if ah == 0:
                s = _decode_huffman(reader, dct)
                state["preds"][ci] += _extend(reader.read_bits(s), s)
                coef[0] = state["preds"][ci] << al
            elif reader.read_bit():
                coef[0] |= 1 << al

        if ns == 1:
            comp, dc_id, _ = scan[0]
            arr = coefs[comp_idx[comp["id"]]]
            dct = huff[(0, dc_id)] if ah == 0 else None
            nb_y, nb_x = _comp_blocks(frame, comp)
            for by in range(nb_y):
                for bx in range(nb_x):
                    maybe_restart()
                    dc_block(0, dct, arr[by, bx])
                    state["mcus"] += 1
        else:
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    maybe_restart()
                    for ci, (comp, dc_id, _) in enumerate(scan):
                        arr = coefs[comp_idx[comp["id"]]]
                        dct = huff[(0, dc_id)] if ah == 0 else None
                        for by in range(comp["v"]):
                            for bx in range(comp["h"]):
                                dc_block(ci, dct,
                                         arr[my * comp["v"] + by,
                                             mx * comp["h"] + bx])
                    state["mcus"] += 1
    else:                                           # AC scan
        if ns != 1:
            raise ValueError("interleaved AC scan")
        comp, _, ac_id = scan[0]
        act = huff[(1, ac_id)]
        arr = coefs[comp_idx[comp["id"]]]
        nb_y, nb_x = _comp_blocks(frame, comp)
        fn = _prog_ac_first if ah == 0 else _prog_ac_refine
        for by in range(nb_y):
            for bx in range(nb_x):
                maybe_restart()
                state["eobrun"] = fn(reader, arr[by, bx], act, ss, se,
                                     al, state["eobrun"])
                state["mcus"] += 1

    # Skip any pad bits, then find the next marker.
    if reader.bit:
        reader.bit = 0
        reader.pos += 1
    d, p = data, reader.pos
    while p + 1 < len(d):
        if d[p] == 0xFF and d[p + 1] != 0x00 \
                and not (0xD0 <= d[p + 1] <= 0xD7):
            return p
        p += 1
    return len(d)


def _reconstruct_progressive(frame, coefs, qt):
    h, w = frame["h"], frame["w"]
    hmax, vmax, _, _ = _frame_geometry(frame)
    planes = []
    for comp, arr in zip(frame["comps"], coefs):
        q = qt[comp["tq"]]
        by, bx = arr.shape[:2]
        deq = arr.astype(np.float64).reshape(by, bx, 8, 8) * q
        out = _C.T @ deq @ _C + 128.0               # batched IDCT
        planes.append(out.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8))
    return _planes_to_rgb(frame["comps"], planes, h, w, hmax, vmax)


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


# ---------------------------------------------------------------------------
# Progressive encoder (T.81 Annex G dual of the decoder above; scan
# script and EOB-run/correction-bit buffering follow the public libjpeg
# structure: DC first -> AC first per component -> DC refine -> AC
# refine per component).
# ---------------------------------------------------------------------------

# Progressive AC table: every (run, size) symbol including the EOBn
# symbols (r<<4 | 0 for r in 0..14) and ZRL (0xF0), all at 9 bits.
_AC_PROG_VALUES = [(r << 4) | s for r in range(16) for s in range(11)]
_AC_PROG_BITS = [0, 0, 0, 0, 0, 0, 0, 0, len(_AC_PROG_VALUES),
                 0, 0, 0, 0, 0, 0, 0]


class _AcScanState:
    """Cross-block AC-scan state: the pending EOB run, its owned
    correction bits (``be`` — emitted right after the EOBn symbol), and
    the current block's bits since the last symbol (``br``). Each br
    entry is ``(zeros_before, bit)`` — the zero-run length preceding the
    coefficient — because a ZRL's decoder-side window covers only the
    positions up to its 16th zero: correction bits for coefficients
    beyond that window belong to the NEXT symbol, not the ZRL."""

    def __init__(self, writer: "_BitWriter", ac_codes):
        self.w = writer
        self.ac = ac_codes
        self.eobrun = 0
        self.be: List[int] = []
        self.br: List[Tuple[int, int]] = []

    def emit_eobrun(self):
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            code, ln = self.ac[nbits << 4]
            self.w.write(code, ln)
            if nbits:
                self.w.write(self.eobrun & ((1 << nbits) - 1), nbits)
            self.eobrun = 0
        for b in self.be:
            self.w.write(b, 1)
        self.be = []

    def flush_br(self):
        for _, b in self.br:
            self.w.write(b, 1)
        self.br = []

    def flush_br_zrl(self):
        """Flush only the correction bits inside a ZRL's window (the
        coefficients the decoder traverses while consuming its 16
        zeros); retain the rest, rebased past the consumed run."""
        for z, b in self.br:
            if z <= 15:
                self.w.write(b, 1)
        self.br = [(z - 16, b) for z, b in self.br if z > 15]

    def end_block(self, had_pending: bool):
        """Nothing (more) coded in this block's band: fold it into the
        EOB run, handing its correction bits to the run."""
        if had_pending:
            self.eobrun += 1
            self.be.extend(b for _, b in self.br)
            self.br = []
            if self.eobrun == 0x7FFF:
                self.emit_eobrun()


def _enc_ac_first(st: _AcScanState, zz, ss, se, al):
    k = ss
    r = 0
    coded = False
    while k <= se:
        v = int(zz[k])
        m = (-v if v < 0 else v) >> al
        if m == 0:
            r += 1
            k += 1
            continue
        if st.eobrun > 0:
            st.emit_eobrun()
        while r > 15:
            code, ln = st.ac[0xF0]
            st.w.write(code, ln)
            r -= 16
        s = m.bit_length()
        code, ln = st.ac[(r << 4) | s]
        st.w.write(code, ln)
        bits = m if v > 0 else ((1 << s) - 1 - m)
        st.w.write(bits, s)
        r = 0
        coded = True
        k += 1
    st.end_block(r > 0 or not coded)


def _enc_ac_refine(st: _AcScanState, zz, ss, se, al):
    mags = [((-int(zz[k]) if zz[k] < 0 else int(zz[k])) >> al)
            for k in range(ss, se + 1)]
    eob = ss - 1
    for k in range(ss, se + 1):
        if mags[k - ss] == 1:
            eob = k
    r = 0
    for k in range(ss, se + 1):
        m = mags[k - ss]
        if m == 0:
            r += 1
            continue
        if m > 1:                       # already significant: one bit
            st.br.append((r, m & 1))
            continue
        while r > 15 and k <= eob:      # ZRLs not foldable into EOB
            st.emit_eobrun()
            code, ln = st.ac[0xF0]
            st.w.write(code, ln)
            r -= 16
            st.flush_br_zrl()
        st.emit_eobrun()
        code, ln = st.ac[(r << 4) | 1]
        st.w.write(code, ln)
        st.w.write(1 if zz[k] > 0 else 0, 1)
        st.flush_br()
        r = 0
    st.end_block(r > 0 or bool(st.br))


def encode_jpeg_progressive(pixels: np.ndarray,
                            subsample: bool = False,
                            restart_interval: int = 0,
                            dc_al: int = 1,
                            ac_al: int = 1) -> bytes:
    """Encode RGB (h, w, 3) or grayscale (h, w) uint8 as a progressive
    (SOF2) JPEG with the standard successive-approximation script:
    DC first (Al=dc_al, interleaved) -> AC first per component
    (Ss=1..63, Al=ac_al) -> DC refine scans down to Al=0 -> AC refine
    scans down to Al=0. Same flat quant and constructed huffman tables
    as `encode_jpeg`, so baseline and progressive encodings of the same
    pixels carry identical coefficients and decode identically."""
    px = np.asarray(pixels, dtype=np.float64)
    if px.ndim == 2:
        px = np.stack([px] * 3, axis=-1)
    h, w = px.shape[:2]
    r_, g_, b_ = px[:, :, 0], px[:, :, 1], px[:, :, 2]
    y = 0.299 * r_ + 0.587 * g_ + 0.114 * b_
    cb = 128.0 - 0.168736 * r_ - 0.331264 * g_ + 0.5 * b_
    cr = 128.0 + 0.5 * r_ - 0.418688 * g_ - 0.081312 * b_

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

    comps = [{"id": 1, "h": sh, "v": sv, "tq": 0},
             {"id": 2, "h": 1, "v": 1, "tq": 0},
             {"id": 3, "h": 1, "v": 1, "tq": 0}]
    frame = {"h": h, "w": w, "comps": comps}

    # Quantized coefficients in zigzag order, full interleaved grid.
    zzs = []
    for plane in (ypl, cbp, crp):
        gby, gbx = plane.shape[0] // 8, plane.shape[1] // 8
        blocks = (plane.reshape(gby, 8, gbx, 8).transpose(0, 2, 1, 3)
                  - 128.0)
        coef = np.round((_C @ blocks @ _C.T) / _QUANT).astype(np.int64)
        zzs.append(coef.reshape(gby, gbx, 64)[:, :, ZIGZAG])

    dc_codes = _canonical_codes(_DC_BITS, _DC_VALUES)
    ac_codes = _canonical_codes(_AC_PROG_BITS, _AC_PROG_VALUES)

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(payload) + 2) + payload

    def sos_header(scan_comps, ss, se, ah, al):
        body = bytes([len(scan_comps)])
        for ci, tdc, tac in scan_comps:
            body += bytes([comps[ci]["id"], (tdc << 4) | tac])
        return seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    def with_restarts(n_units, encode_unit, on_restart):
        """Drive encode_unit over n_units, inserting RSTn markers every
        ``restart_interval`` units (writer-flushed, state reset)."""
        out = bytearray()
        w = _BitWriter()
        state = {"w": w, "rst": 0, "count": 0}
        for u in range(n_units):
            if restart_interval and state["count"] == restart_interval:
                state["w"].flush()
                out += bytes(state["w"].out)
                out += bytes([0xFF, 0xD0 + state["rst"]])
                state["rst"] = (state["rst"] + 1) % 8
                state["w"] = _BitWriter()
                state["count"] = 0
                on_restart(state)
            encode_unit(u, state)
            state["count"] += 1
        state["w"].flush()
        out += bytes(state["w"].out)
        return bytes(out)

    mcus_x, mcus_y = pw // mcu_w, ph // mcu_h
    stream = bytearray()

    # --- scan 1: DC first, interleaved, Al=dc_al ---
    def dc_first_scan():
        preds = [0, 0, 0]

        def unit(u, state):
            my, mx = divmod(u, mcus_x)
            for ci, comp in enumerate(comps):
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        dc = int(zzs[ci][my * comp["v"] + by,
                                         mx * comp["h"] + bx, 0]) >> dc_al
                        diff = dc - preds[ci]
                        preds[ci] = dc
                        s = _category(diff)
                        code, ln = dc_codes[s]
                        state["w"].write(code, ln)
                        if s:
                            state["w"].write(
                                diff if diff > 0 else diff + (1 << s) - 1,
                                s)

        def on_rst(state):
            preds[:] = [0, 0, 0]

        return with_restarts(mcus_x * mcus_y, unit, on_rst)

    stream += sos_header([(0, 0, 0), (1, 0, 0), (2, 0, 0)],
                         0, 0, 0, dc_al)
    stream += dc_first_scan()

    # --- scans 2..4: AC first per component, Al=ac_al ---
    def ac_scan(ci, enc_fn, al):
        nb_y, nb_x = _comp_blocks(frame, comps[ci])
        out = bytearray()
        w = _BitWriter()
        st = _AcScanState(w, ac_codes)
        rst, count = 0, 0
        for u in range(nb_y * nb_x):
            if restart_interval and count == restart_interval:
                st.emit_eobrun()
                w.flush()
                out += bytes(w.out)
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                w = _BitWriter()
                st = _AcScanState(w, ac_codes)
                count = 0
            by, bx = divmod(u, nb_x)
            enc_fn(st, zzs[ci][by, bx], 1, 63, al)
            count += 1
        st.emit_eobrun()
        w.flush()
        out += bytes(w.out)
        return bytes(out)

    for ci in range(3):
        stream += sos_header([(ci, 0, 0)], 1, 63, 0, ac_al)
        stream += ac_scan(ci, _enc_ac_first, ac_al)

    # --- DC refine scans down to Al=0 ---
    for al in range(dc_al - 1, -1, -1):
        def dc_refine_scan(al=al):
            def unit(u, state):
                my, mx = divmod(u, mcus_x)
                for ci, comp in enumerate(comps):
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            dc = int(zzs[ci][my * comp["v"] + by,
                                             mx * comp["h"] + bx, 0])
                            state["w"].write((dc >> al) & 1, 1)

            return with_restarts(mcus_x * mcus_y, unit, lambda s: None)

        stream += sos_header([(0, 0, 0), (1, 0, 0), (2, 0, 0)],
                             0, 0, al + 1, al)
        stream += dc_refine_scan()

    # --- AC refine scans down to Al=0, per component ---
    for al in range(ac_al - 1, -1, -1):
        for ci in range(3):
            stream += sos_header([(ci, 0, 0)], 1, 63, al + 1, al)
            stream += ac_scan(ci, _enc_ac_refine, al)

    qbytes = np.empty(64, dtype=np.uint8)
    flat = _QUANT.reshape(64)
    for k in range(64):
        qbytes[k] = int(flat[ZIGZAG[k]])
    dqt = seg(0xDB, bytes([0x00]) + qbytes.tobytes())
    sof = seg(0xC2, struct.pack(">BHHB", 8, h, w, 3)
              + bytes([1, (sh << 4) | sv, 0,
                       2, 0x11, 0,
                       3, 0x11, 0]))
    dht = (seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALUES))
           + seg(0xC4, bytes([0x10]) + bytes(_AC_PROG_BITS)
                 + bytes(_AC_PROG_VALUES)))
    dri = (seg(0xDD, struct.pack(">H", restart_interval))
           if restart_interval else b"")
    return (b"\xff\xd8" + dqt + sof + dht + dri + bytes(stream)
            + b"\xff\xd9")
