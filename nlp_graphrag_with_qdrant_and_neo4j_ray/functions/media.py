"""Minimal, dependency-free media codecs for the multimodal stages.

The container has no PIL/soundfile/pyav, which left the "real payload"
branches of ``stages/multimodal.py`` unexecutable (VERDICT r2 task 10).
This module vendors just enough of two REAL formats to run those
branches hermetically:

- PNG: pure-Python encoder (filter 0 + zlib) and decoder (8-bit
  greyscale/RGB/RGBA, non-interlaced, all five scanline filters).
  The decoder's filter-0/2 paths are vectorized; filters 1/3/4 fall
  back to per-byte loops — fine for fixtures, and real deployments use
  PIL (which takes precedence in the stage when importable).
- WAV: PCM16 encode/decode via the stdlib ``wave`` module.

Both are standard public formats (PNG: RFC 2083; WAV: RIFF PCM).
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"
_COLOR_TO_NC = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def encode_png(arr: np.ndarray) -> bytes:
    """8-bit greyscale (h,w) / RGB (h,w,3) / RGBA (h,w,4) → PNG bytes."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        color = 0
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color = 2
    elif arr.ndim == 3 and arr.shape[2] == 4:
        color = 6
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    h, w = arr.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw))
            + _chunk(b"IEND", b""))


def decode_png(payload: bytes) -> tuple[int, int, np.ndarray]:
    """PNG bytes → (width, height, uint8 array (h,w) or (h,w,nc))."""
    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat = 8, b""
    w = h = nc = None
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack(">I", payload[pos:pos + 4])
        tag = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, bit, color, _comp, _filt, inter = struct.unpack(
                ">IIBBBBB", data)
            if bit != 8 or inter != 0:
                raise NotImplementedError(
                    "vendored PNG decoder handles 8-bit non-interlaced only")
            nc = _COLOR_TO_NC.get(color)
            if nc is None:
                raise NotImplementedError(f"PNG color type {color}")
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("truncated PNG")
    raw = zlib.decompress(idat)
    stride = w * nc
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.int64)
    p = 0
    for y in range(h):
        ftype = raw[p]
        row = np.frombuffer(raw, np.uint8, stride, p + 1).astype(np.int64)
        p += stride + 1
        if ftype == 0:
            cur = row
        elif ftype == 2:  # up
            cur = (row + prev) & 0xFF
        elif ftype == 1:  # sub
            cur = row.copy()
            for i in range(nc, stride):
                cur[i] = (cur[i] + cur[i - nc]) & 0xFF
        elif ftype == 3:  # average
            cur = row.copy()
            for i in range(stride):
                left = cur[i - nc] if i >= nc else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # paeth
            cur = row.copy()
            for i in range(stride):
                a = cur[i - nc] if i >= nc else 0
                b = prev[i]
                c = prev[i - nc] if i >= nc else 0
                pp = a + b - c
                pa_, pb, pc_ = abs(pp - a), abs(pp - b), abs(pp - c)
                pred = a if (pa_ <= pb and pa_ <= pc_) else \
                    (b if pb <= pc_ else c)
                cur[i] = (cur[i] + pred) & 0xFF
        else:
            raise NotImplementedError(f"PNG filter {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    arr = out.reshape(h, w, nc) if nc > 1 else out.reshape(h, w)
    return int(w), int(h), arr


def encode_wav(rate: int, samples: np.ndarray) -> bytes:
    """float32 [-1,1] mono samples → PCM16 WAV bytes."""
    pcm = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    pcm16 = (pcm * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(int(rate))
        f.writeframes(pcm16.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """PCM16 WAV bytes → (sample_rate, float32 samples of channel 0)."""
    with wave.open(io.BytesIO(payload), "rb") as f:
        rate = f.getframerate()
        n = f.getnframes()
        nch = f.getnchannels()
        if f.getsampwidth() != 2:
            raise NotImplementedError("vendored WAV decoder handles PCM16")
        data = np.frombuffer(f.readframes(n), dtype="<i2")
    ch0 = data.reshape(-1, nch)[:, 0] if nch > 1 else data
    return rate, (ch0.astype(np.float32) / 32768.0)


# --------------------------- minimal PDF ------------------------------------
# Just enough of ISO 32000 to round-trip fixture documents hermetically:
# the builder emits a valid single-font PDF with Flate-compressed content
# streams; the extractor pulls show-text operators (Tj / ' / TJ) out of
# every stream in document order. Real deployments use PyMuPDF (which
# takes precedence in sources/files.py when importable).

import re as _re

_STREAM_RE = _re.compile(rb"<<(.*?)>>\s*stream\r?\n(.*?)\r?\nendstream",
                         _re.DOTALL)
_TEXT_OP_RE = _re.compile(
    rb"\(((?:\\.|[^\\()])*)\)\s*(Tj|')"   # (string) Tj   (string) '
    rb"|\[((?:\\.|[^\]])*)\]\s*TJ"        # [ (s1) -120 (s2) ] TJ
    rb"|(T\*)",                           # next-line operator
    _re.DOTALL,
)
_TJ_STR_RE = _re.compile(rb"\(((?:\\.|[^\\()])*)\)", _re.DOTALL)
_PDF_ESCAPES = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b",
                b"f": b"\f", b"(": b"(", b")": b")", b"\\": b"\\"}


def _pdf_unescape(raw: bytes) -> str:
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i:i + 1]
        if c == b"\\" and i + 1 < len(raw):
            nxt = raw[i + 1:i + 2]
            if nxt.isdigit():  # octal escape \ddd
                j = i + 1
                while j < min(i + 4, len(raw)) and raw[j:j + 1].isdigit():
                    j += 1
                out.append(int(raw[i + 1:j], 8) & 0xFF)
                i = j
                continue
            out += _PDF_ESCAPES.get(nxt, nxt)
            i += 2
            continue
        out += c
        i += 1
    return out.decode("latin-1")


def extract_pdf_text(payload: bytes) -> str:
    """Show-text extraction from a simple PDF: every stream object is
    FlateDecoded when marked, and Tj / ' / TJ operands concatenate in
    stream order, one newline per text block (ET)."""
    if not payload.startswith(b"%PDF-"):
        raise ValueError("not a PDF payload")
    pieces: list[str] = []
    for mdict, body in _STREAM_RE.findall(payload):
        if b"FlateDecode" in mdict:
            try:
                body = zlib.decompress(body)
            except zlib.error:
                continue
        block: list[str] = []
        for m in _TEXT_OP_RE.finditer(body):
            if m.group(4) is not None:  # T* → line break
                block.append("\n")
            elif m.group(1) is not None:
                if m.group(2) == b"'":  # ' shows on the NEXT line
                    block.append("\n")
                block.append(_pdf_unescape(m.group(1)))
            else:
                block.extend(_pdf_unescape(s)
                             for s in _TJ_STR_RE.findall(m.group(3)))
        if block:
            pieces.append("".join(block))
    if not pieces:
        # a real-world PDF with compressed xref streams / CID fonts lands
        # here — refuse rather than silently returning empty text
        raise NotImplementedError(
            "no extractable show-text operators; PDF too complex for the "
            "vendored extractor (use PyMuPDF)"
        )
    return "\n".join(pieces) + "\n"


def build_simple_pdf(pages: list[str]) -> bytes:
    """A minimal valid PDF (one Helvetica font, Flate-compressed content
    streams, xref table) for hermetic fixtures."""
    objs: list[bytes] = []

    def esc(s: str) -> bytes:
        return (s.replace("\\", r"\\").replace("(", r"\(")
                .replace(")", r"\)").encode("latin-1", "replace"))

    n_pages = len(pages)
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>"
                .encode())
    font_num = 3 + 2 * n_pages
    for i, text in enumerate(pages):
        page_num, content_num = 3 + 2 * i, 4 + 2 * i
        objs.append(
            (f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             f"/Contents {content_num} 0 R /Resources << /Font "
             f"<< /F1 {font_num} 0 R >> >> >>").encode()
        )
        lines = text.split("\n")
        ops = b"BT /F1 12 Tf 72 720 Td 14 TL\n"
        for j, line in enumerate(lines):
            ops += (b"(" + esc(line) + (b") Tj\n" if j == len(lines) - 1
                                        else b") Tj T*\n"))
        ops += b"ET"
        stream = zlib.compress(ops)
        objs.append(
            (f"<< /Length {len(stream)} /Filter /FlateDecode >>\nstream\n"
             ).encode() + stream + b"\nendstream"
        )
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, obj in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + obj + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n").encode()
    return bytes(out)


def gray2d(arr: np.ndarray, min_h: int = 8, min_w: int = 9) -> np.ndarray:
    """Any decoded image array → 2-D float64 grayscale of at least
    (min_h, min_w): channels average, 1-D payloads tile to a square,
    tiny images upscale by pixel repetition (deterministic)."""
    a = np.asarray(arr, dtype=np.float64)
    if a.ndim == 3:
        a = a.mean(axis=2)
    elif a.ndim == 1:
        side = max(int(np.ceil(np.sqrt(a.size))), 1)
        a = np.resize(a, (side, side))
    if a.shape[0] < min_h:
        a = np.repeat(a, int(np.ceil(min_h / a.shape[0])), axis=0)
    if a.shape[1] < min_w:
        a = np.repeat(a, int(np.ceil(min_w / a.shape[1])), axis=1)
    return a


def area_resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """EXACT area-average resample to (out_h, out_w) — per-channel
    integral-image block means, no interpolation library; float64
    output (2-D in → 2-D out, 3-D preserves channels).  Inputs smaller
    than the target upscale by pixel repetition first (deterministic)."""
    a = np.asarray(img, dtype=np.float64)
    squeeze = a.ndim == 2
    if squeeze:
        a = a[:, :, None]
    if a.shape[0] < out_h:
        a = np.repeat(a, int(np.ceil(out_h / a.shape[0])), axis=0)
    if a.shape[1] < out_w:
        a = np.repeat(a, int(np.ceil(out_w / a.shape[1])), axis=1)
    h, w, c = a.shape
    rows = np.linspace(0, h, out_h + 1).astype(np.int64)
    cols = np.linspace(0, w, out_w + 1).astype(np.int64)
    ii = np.zeros((h + 1, w + 1, c))
    ii[1:, 1:] = a.cumsum(axis=0).cumsum(axis=1)
    r0, r1 = rows[:-1], rows[1:]
    c0, c1 = cols[:-1], cols[1:]
    sums = (ii[np.ix_(r1, c1)] - ii[np.ix_(r0, c1)]
            - ii[np.ix_(r1, c0)] + ii[np.ix_(r0, c0)])
    grid = sums / np.outer(r1 - r0, c1 - c0)[:, :, None]
    return grid[:, :, 0] if squeeze else grid


def dhash64(img: np.ndarray) -> int:
    """64-bit difference hash (dHash): area-resample the grayscale to an
    8×9 grid of EXACT block means (:func:`area_resize`), emit one bit
    per horizontal neighbor comparison. Classic perceptual hash:
    near-duplicate images (re-encodes, small crops or noise) land
    within a small hamming distance, so the text near-dup machinery
    (band buckets + XOR popcount) applies unchanged."""
    grid = area_resize(gray2d(img), 8, 9)
    bits = (grid[:, 1:] > grid[:, :-1]).reshape(-1)
    return int(np.packbits(bits).view(np.dtype(">u8"))[0])


def audio_hash64(samples: np.ndarray) -> int:
    """64-bit audio fingerprint: RMS energy over 65 equal segments,
    one bit per consecutive-segment comparison — the audio analogue of
    the image dHash (gain-invariant: comparisons are unchanged under
    global amplitude scaling; robust to small noise), so near-duplicate
    recordings (re-encodes, gain changes, light noise) land within a
    small hamming distance and ride the same band-bucket + XOR-popcount
    pair machinery."""
    x = np.asarray(samples, dtype=np.float64)
    if x.size == 0:
        return 0
    bounds = np.linspace(0, x.size, 66).astype(np.int64)
    sq = np.concatenate([[0.0], np.cumsum(x * x)])
    seg = sq[bounds[1:]] - sq[bounds[:-1]]
    widths = np.maximum(bounds[1:] - bounds[:-1], 1)
    rms = np.sqrt(seg / widths)
    bits = rms[1:] > rms[:-1]
    return int(np.packbits(bits).view(np.dtype(">u8"))[0])
