"""Vendored baseline JPEG (ITU-T T.81 / JFIF) codec — pure
numpy + stdlib, the MJPEG sibling of the PNG/WAV codecs in
``functions/media.py`` (VERDICT r4 task 5: real compressed AVI
containers are MJPEG far more often than BI_RGB).

Scope: baseline sequential DCT, 8-bit, Huffman, 1 or 3 components,
any sampling factors on decode (4:4:4 / 4:2:2 / 4:2:0 — nearest
upsample), restart markers, missing-DHT MJPEG frames (the MJPEG
convention allows omitting tables; the Annex K defaults apply).
Progressive / arithmetic / 12-bit scans raise NotImplementedError.
The encoder emits 4:4:4 with the Annex K tables (quality-scaled the
libjpeg way) and exists to build hermetic fixtures.

Entropy decode is inherently sequential — this is the hermetic
fallback used inside actor-pool media stages; PyAV takes precedence
for bulk decode where importable (stages/multimodal.py).
"""

from __future__ import annotations

import struct

import numpy as np

# ---- constants (ITU-T T.81 Annex K) ---------------------------------------

_QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], np.int32).reshape(8, 8)

_QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], np.int32).reshape(8, 8)

_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))

_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]

_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]

assert sum(_AC_LUMA_BITS) == len(_AC_LUMA_VALS) == 162
assert sum(_AC_CHROMA_BITS) == len(_AC_CHROMA_VALS) == 162


def _zigzag():
    idx = []
    for s in range(15):
        rng = range(min(s, 7), max(0, s - 7) - 1, -1) if s % 2 == 0 \
            else range(max(0, s - 7), min(s, 7) + 1)
        idx.extend((r, s - r) for r in rng)
    return idx


_ZZ = _zigzag()                      # k -> (row, col)
_ZZ_ROWS = np.array([r for r, _ in _ZZ])
_ZZ_COLS = np.array([c for _, c in _ZZ])


def _dct_matrix() -> np.ndarray:
    x = np.arange(8)
    d = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) / 2.0
    d[0] /= np.sqrt(2.0)
    return d


_DCT = _dct_matrix()


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling (jcparam.c convention)."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    t = (base * scale + 50) // 100
    return np.clip(t, 1, 255).astype(np.int32)


def _build_decode_table(bits, vals):
    """(length, code) -> symbol map per T.81 C.2 canonical codes."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits, vals):
    """symbol -> (code, length)."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


# ---- bit IO ----------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)
        return bytes(self.buf)


class _BitReader:
    """Reads the (already unstuffed) entropy-coded segment."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def read_bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy segment")
            self.acc = self.data[self.pos]
            self.pos += 1
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _mag_bits(v: int) -> tuple[int, int]:
    size = int(abs(v)).bit_length()
    return (v if v >= 0 else v + (1 << size) - 1, size)


# ---- encoder (4:4:4, fixture builder) --------------------------------------


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = (ycc[..., i] for i in range(3))
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255)


def encode_baseline_jpeg(rgb: np.ndarray, quality: int = 95) -> bytes:
    """(h, w, 3) uint8 RGB → baseline JFIF bytes, 4:4:4, Annex K
    Huffman tables written as DHT (so any decoder round-trips)."""
    rgb = np.asarray(rgb, np.uint8)
    if rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError("encode_baseline_jpeg wants (h, w, 3) uint8")
    h, w = rgb.shape[:2]
    qy = _scaled_quant(_QUANT_LUMA, quality)
    qc = _scaled_quant(_QUANT_CHROMA, quality)

    ph, pw = -h % 8, -w % 8
    padded = np.pad(rgb, ((0, ph), (0, pw), (0, 0)), mode="edge")
    ycc = _rgb_to_ycbcr(padded) - 128.0
    H, W = padded.shape[:2]

    # forward DCT + quantize every 8x8 block of every component at once
    def blocks_of(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
        b = plane.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3)
        coef = np.einsum("ux,mnxy,vy->mnuv", _DCT, b, _DCT)
        return np.round(coef / q).astype(np.int32)

    comp_blocks = [blocks_of(ycc[..., 0], qy),
                   blocks_of(ycc[..., 1], qc),
                   blocks_of(ycc[..., 2], qc)]

    enc_dc = [_build_encode_table(_DC_LUMA_BITS, _DC_LUMA_VALS),
              _build_encode_table(_DC_CHROMA_BITS, _DC_CHROMA_VALS)]
    enc_ac = [_build_encode_table(_AC_LUMA_BITS, _AC_LUMA_VALS),
              _build_encode_table(_AC_CHROMA_BITS, _AC_CHROMA_VALS)]

    bw = _BitWriter()
    pred = [0, 0, 0]
    for my in range(H // 8):
        for mx in range(W // 8):
            for ci in range(3):
                ti = 0 if ci == 0 else 1
                blk = comp_blocks[ci][my, mx]
                zz = blk[_ZZ_ROWS, _ZZ_COLS]
                diff = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                mag, size = _mag_bits(diff)
                code, ln = enc_dc[ti][size]
                bw.write(code, ln)
                if size:
                    bw.write(mag, size)
                run = 0
                nz = np.nonzero(zz[1:])[0]
                last = nz[-1] + 1 if len(nz) else 0
                for k in range(1, last + 1):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = enc_ac[ti][0xF0]  # ZRL
                        bw.write(code, ln)
                        run -= 16
                    mag, size = _mag_bits(v)
                    code, ln = enc_ac[ti][(run << 4) | size]
                    bw.write(code, ln)
                    bw.write(mag, size)
                    run = 0
                if last < 63:
                    code, ln = enc_ac[ti][0x00]  # EOB
                    bw.write(code, ln)
    scan = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    def dqt(tid: int, q: np.ndarray) -> bytes:
        return seg(0xFFDB, bytes([tid])
                   + bytes(int(q[r, c]) for r, c in _ZZ))

    def dht(cls: int, tid: int, bits, vals) -> bytes:
        return seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits)
                   + bytes(vals))

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += dqt(0, qy) + dqt(1, qc)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        sof += bytes([cid, 0x11, tq])  # 1x1 sampling = 4:4:4
    out += seg(0xFFC0, sof)
    out += dht(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS)
    out += dht(1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS)
    out += dht(0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS)
    out += dht(1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS)
    sos = bytes([3])
    for cid, tdta in ((1, 0x00), (2, 0x11), (3, 0x11)):
        sos += bytes([cid, tdta])
    sos += bytes([0, 63, 0])
    out += seg(0xFFDA, sos)
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---- decoder ----------------------------------------------------------------


def decode_baseline_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF/MJPEG bytes → (h, w, 3) uint8 RGB (grayscale is
    replicated to 3 channels). Missing DHT/DQT fall back to the Annex K
    defaults (the MJPEG-in-AVI convention)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    scan_comps = None
    scan_start = None

    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0x01,) or 0xD0 <= marker <= 0xD9:
            if marker == 0xD9:
                break
            continue
        (seg_len,) = struct.unpack(">H", data[pos:pos + 2])
        body = data[pos + 2:pos + seg_len]
        nxt = pos + seg_len
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                p += 1
                if pq:
                    raise NotImplementedError("16-bit quant tables")
                q = np.zeros((8, 8), np.int32)
                q[_ZZ_ROWS, _ZZ_COLS] = np.frombuffer(
                    body[p:p + 64], np.uint8).astype(np.int32)
                quant[tq] = q
                p += 64
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0x0F
                bits = list(body[p + 1:p + 17])
                n = sum(bits)
                vals = list(body[p + 17:p + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = \
                    _build_decode_table(bits, vals)
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec = body[0]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG")
            h, w = struct.unpack(">HH", body[1:5])
            nc = body[5]
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG scan (SOF marker 0xFF{marker:02X})")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan_comps = []
            for i in range(ns):
                cs, tdta = body[1 + 2 * i:3 + 2 * i]
                scan_comps.append({"id": cs, "td": tdta >> 4,
                                   "ta": tdta & 0x0F})
            scan_start = nxt
            break
        pos = nxt

    if frame is None or scan_start is None:
        raise ValueError("JPEG missing SOF/SOS")
    if not huff_dc:  # MJPEG frames may omit tables — Annex K defaults
        huff_dc = {0: _build_decode_table(_DC_LUMA_BITS, _DC_LUMA_VALS),
                   1: _build_decode_table(_DC_CHROMA_BITS,
                                          _DC_CHROMA_VALS)}
        huff_ac = {0: _build_decode_table(_AC_LUMA_BITS, _AC_LUMA_VALS),
                   1: _build_decode_table(_AC_CHROMA_BITS,
                                          _AC_CHROMA_VALS)}
    if not quant:
        quant = {0: _QUANT_LUMA.copy(), 1: _QUANT_CHROMA.copy()}

    # unstuff the entropy segment, splitting on restart markers
    segments: list[bytes] = []
    cur = bytearray()
    p = scan_start
    while p < len(data):
        b = data[p]
        if b == 0xFF and p + 1 < len(data):
            m = data[p + 1]
            if m == 0x00:
                cur.append(0xFF)
                p += 2
                continue
            if 0xD0 <= m <= 0xD7:  # RSTn
                segments.append(bytes(cur))
                cur = bytearray()
                p += 2
                continue
            break  # EOI or next marker
        cur.append(b)
        p += 1
    segments.append(bytes(cur))

    h, w = frame["h"], frame["w"]
    comps = frame["comps"]
    max_h = max(c["h"] for c in comps)
    max_v = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * max_h))
    mcus_y = -(-h // (8 * max_v))
    by_id = {c["id"]: c for c in comps}
    order = [by_id[sc["id"]] for sc in scan_comps]
    for c, sc in zip(order, scan_comps):
        c["td"], c["ta"] = sc["td"], sc["ta"]
        c["plane"] = np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8),
                              np.float64)

    n_mcus = mcus_x * mcus_y
    mcu_i = 0
    idct = _DCT.T
    for seg_i, seg_bytes in enumerate(segments):
        reader = _BitReader(seg_bytes)
        pred = {c["id"]: 0 for c in comps}
        end = (min(n_mcus, mcu_i + restart_interval)
               if restart_interval else n_mcus)
        while mcu_i < end:
            my, mx = divmod(mcu_i, mcus_x)
            for c in order:
                for vy in range(c["v"]):
                    for vx in range(c["h"]):
                        s = reader.read_symbol(huff_dc[c["td"]])
                        diff = _extend(reader.read_bits(s), s) if s else 0
                        pred[c["id"]] += diff
                        zz = np.zeros(64, np.int32)
                        zz[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = reader.read_symbol(huff_ac[c["ta"]])
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overrun")
                            zz[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        blk = np.zeros((8, 8), np.float64)
                        blk[_ZZ_ROWS, _ZZ_COLS] = zz
                        blk *= quant[c["tq"]]
                        pix = idct @ blk @ _DCT + 128.0
                        y0 = (my * c["v"] + vy) * 8
                        x0 = (mx * c["h"] + vx) * 8
                        c["plane"][y0:y0 + 8, x0:x0 + 8] = pix
            mcu_i += 1
        if restart_interval and seg_i + 1 < len(segments) \
                and mcu_i >= n_mcus:
            break

    planes = []
    for c in order:
        plane = c["plane"]
        ry, rx = max_v // c["v"], max_h // c["h"]
        if ry > 1 or rx > 1:  # nearest-neighbor chroma upsample
            plane = np.repeat(np.repeat(plane, ry, 0), rx, 1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        y = np.clip(planes[0], 0, 255)
        return np.repeat(y[..., None], 3, axis=2).astype(np.uint8)
    ycc = np.stack(planes, axis=-1)
    return _ycbcr_to_rgb(ycc).round().astype(np.uint8)
