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
