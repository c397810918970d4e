"""WARC / WET codec (ISO 28500 / WARC 1.0) — pure functions.

Web-scale text corpora ship as WARC (raw HTTP captures) and WET
(pre-extracted plain text) files: a sequence of records, each a
``WARC/1.0`` version line, ``Name: value`` headers, a blank line, then
exactly ``Content-Length`` payload bytes, then a blank-line separator.
Production files gzip each record as its OWN gzip member and
concatenate the members, so a reader can skip to any record offset —
Python's :mod:`gzip` transparently reads multi-member streams.

The reference ingests loose ``.txt``/``.pdf`` files
(/root/reference/graphrag/cli/main.py:115-156); this module extends the
same "files → pages table" seam to the archive format the 100 TB corpus
actually arrives in. Everything here is drawn from the public ISO 28500
spec and the published WET conventions (``WARC-Type: conversion``,
``WARC-Identified-Content-Language`` with ISO-639-3 codes).

Decode policy for WET text matches the engine-wide rule: UTF-8 with a
deterministic latin-1 fallback (:func:`..functions.html.decode_html`).
"""

from __future__ import annotations

import datetime
import gzip
import io
import uuid
from typing import IO, Iterator

from .html import decode_html
from .ids import QDRANT_NAMESPACE as NAMESPACE

_CRLF = b"\r\n"

# ISO-639-3 → the engine's 2-letter lang codes, for the WET
# ``WARC-Identified-Content-Language`` header (comma-separated, most
# confident first). Unknown codes fall through to the caller's default.
_ISO639_3_TO_2 = {
    "eng": "en", "deu": "de", "ger": "de", "fra": "fr", "fre": "fr",
    "spa": "es", "ita": "it", "por": "pt", "nld": "nl", "dut": "nl",
    "rus": "ru", "zho": "zh", "chi": "zh", "jpn": "ja", "kor": "ko",
    "ara": "ar", "pol": "pl", "swe": "sv", "tur": "tr", "ces": "cs",
}

_LANG_2_TO_3 = {v: k for k, v in reversed(list(_ISO639_3_TO_2.items()))}


def format_warc_date(ts: datetime.datetime) -> str:
    """``WARC-Date`` (ISO 8601, second precision, Z suffix)."""
    return ts.strftime("%Y-%m-%dT%H:%M:%SZ")


def parse_warc_date(s: str) -> datetime.datetime:
    s = s.strip()
    if s.endswith("Z"):
        s = s[:-1]
    # second- or sub-second precision both appear in the wild
    fmt = "%Y-%m-%dT%H:%M:%S.%f" if "." in s else "%Y-%m-%dT%H:%M:%S"
    return datetime.datetime.strptime(s, fmt)


def _record_id(url: str, warc_type: str) -> str:
    """Deterministic ``WARC-Record-ID`` (uuid5 over type+url) so encoded
    fixtures are byte-stable run-to-run."""
    return f"<urn:uuid:{uuid.uuid5(NAMESPACE, f'{warc_type}:{url}')}>"


def encode_warc_record(warc_type: str, headers: dict[str, str],
                       body: bytes) -> bytes:
    out = [b"WARC/1.0", _CRLF]
    fields = {"WARC-Type": warc_type, **headers,
              "Content-Length": str(len(body))}
    for k, v in fields.items():
        v = str(v)
        if any(c in v for c in "\r\n\x00"):
            # a CR/LF in a header value would let a hostile url inject
            # records/headers into the archive — refuse loudly
            raise ValueError(
                f"WARC header {k} contains control characters: {v!r}")
        out += [k.encode("ascii"), b": ", v.encode("utf-8"), _CRLF]
    out += [_CRLF, body, _CRLF, _CRLF]
    return b"".join(out)


def _gzip_member(record: bytes) -> bytes:
    """One record per gzip member (the production convention), with
    mtime pinned to 0 so output bytes are deterministic."""
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(record)
    return buf.getvalue()


def _warcinfo(filename: str, ts: datetime.datetime) -> bytes:
    body = (b"software: nlp-graphrag-ray\r\n"
            b"format: WARC File Format 1.0\r\n")
    return encode_warc_record(
        "warcinfo",
        {
            "WARC-Record-ID": _record_id(filename, "warcinfo"),
            "WARC-Date": format_warc_date(ts),
            "WARC-Filename": filename,
            "Content-Type": "application/warc-fields",
        },
        body,
    )


def encode_warc_pages(rows: list[dict], *, filename: str = "fixture.warc",
                      compress: bool = True) -> bytes:
    """Rows of ``{url, warc_ts, html}`` → a WARC file of ``response``
    records, each wrapping a full HTTP/1.1 response around the html
    payload. Leads with a ``warcinfo`` record like production files."""
    members = []
    ts0 = rows[0]["warc_ts"] if rows else datetime.datetime(2025, 3, 28)
    members.append(_warcinfo(filename, ts0))
    for r in rows:
        html = r["html"]
        http = (b"HTTP/1.1 200 OK\r\n"
                b"Content-Type: text/html; charset=utf-8\r\n"
                + b"Content-Length: " + str(len(html)).encode() + _CRLF
                + _CRLF + html)
        members.append(encode_warc_record(
            "response",
            {
                "WARC-Record-ID": _record_id(r["url"], "response"),
                "WARC-Date": format_warc_date(r["warc_ts"]),
                "WARC-Target-URI": r["url"],
                "Content-Type": "application/http; msgtype=response",
            },
            http,
        ))
    if compress:
        return b"".join(_gzip_member(m) for m in members)
    return b"".join(members)


def encode_wet_pages(rows: list[dict], *, filename: str = "fixture.wet",
                     compress: bool = True) -> bytes:
    """Rows of ``{url, warc_ts, text[, lang]}`` → a WET file of
    ``conversion`` records (UTF-8 plain-text payloads), carrying the
    published ``WARC-Identified-Content-Language`` header."""
    members = []
    ts0 = rows[0]["warc_ts"] if rows else datetime.datetime(2025, 3, 28)
    members.append(_warcinfo(filename, ts0))
    for r in rows:
        body = r["text"].encode("utf-8")
        headers = {
            "WARC-Record-ID": _record_id(r["url"], "conversion"),
            "WARC-Refers-To": _record_id(r["url"], "response"),
            "WARC-Date": format_warc_date(r["warc_ts"]),
            "WARC-Target-URI": r["url"],
            "Content-Type": "text/plain",
        }
        lang3 = _LANG_2_TO_3.get(r.get("lang", ""))
        if lang3:
            headers["WARC-Identified-Content-Language"] = lang3
        members.append(encode_warc_record("conversion", headers, body))
    if compress:
        return b"".join(_gzip_member(m) for m in members)
    return b"".join(members)


def iter_warc_records(stream: IO[bytes]) -> Iterator[tuple[dict, bytes]]:
    """Stream WARC records from a (decompressed) byte stream: yields
    ``(headers, body)`` with the version line under key ``'_version'``.
    Bounded memory: one record's headers + body at a time."""
    while True:
        line = stream.readline()
        if not line:
            return
        if not line.strip():
            continue  # inter-record blank lines
        if not line.startswith(b"WARC/"):
            raise ValueError(
                f"expected WARC version line, got {line[:40]!r}")
        headers: dict[str, str] = {"_version": line.strip().decode("ascii")}
        while True:
            hline = stream.readline()
            if not hline:
                raise ValueError("truncated WARC header block")
            if hline in (_CRLF, b"\n"):
                break
            if hline[:1] in (b" ", b"\t"):  # obs-fold continuation
                continue
            key, _, val = hline.partition(b":")
            headers[key.strip().decode("ascii")] = (
                val.strip().decode("utf-8", "replace"))
        try:
            n = int(headers["Content-Length"])
        except (KeyError, ValueError):
            raise ValueError(
                f"record missing Content-Length: {headers!r}") from None
        body = stream.read(n)
        if len(body) != n:
            raise ValueError(
                f"truncated WARC body: wanted {n} bytes, got {len(body)}")
        yield headers, body


def split_http_response(payload: bytes) -> tuple[dict, bytes]:
    """HTTP response bytes → (headers incl. ``_status``, body). Only
    identity transfer encoding is supported (what archives store)."""
    head, sep, body = payload.partition(b"\r\n\r\n")
    if not sep:
        raise ValueError("HTTP response without header terminator")
    lines = head.split(_CRLF)
    headers = {"_status": lines[0].decode("latin-1")}
    for hline in lines[1:]:
        key, _, val = hline.partition(b":")
        headers[key.strip().decode("latin-1").lower()] = (
            val.strip().decode("latin-1"))
    return headers, body


def wet_lang(headers: dict, default: str) -> str:
    codes = headers.get("WARC-Identified-Content-Language", "")
    first = codes.split(",")[0].strip().lower()
    if not first:
        return default
    return _ISO639_3_TO_2.get(first, first[:2] or default)


def record_to_page(headers: dict, body: bytes,
                   default_lang: str = "en") -> dict | None:
    """One WARC record → one pages-schema row, or None for record types
    that carry no page (warcinfo, request, metadata, non-200 responses).

    ``response`` records yield html (the extract stage parses it
    downstream, like the reference's raw-file path); ``conversion``
    (WET) records yield extracted text directly.
    """
    wtype = headers.get("WARC-Type", "").lower()
    url = headers.get("WARC-Target-URI", "")
    ts = (parse_warc_date(headers["WARC-Date"])
          if "WARC-Date" in headers else datetime.datetime(1970, 1, 1))
    if wtype == "response":
        # raw 'resource' captures aside, response payloads are HTTP
        http_headers, html = split_http_response(body)
        if " 200" not in http_headers["_status"]:
            return None
        return {"url": url, "warc_ts": ts, "html": html, "text": "",
                "lang": default_lang}
    if wtype == "conversion":
        return {"url": url, "warc_ts": ts, "html": b"",
                "text": decode_html(body),
                "lang": wet_lang(headers, default_lang)}
    return None


class _PrependStream(io.RawIOBase):
    """Forward-only stream that replays ``head`` before ``f`` — lets us
    sniff magic bytes off non-seekable inputs (Ray hands the datasource
    a non-seekable pyarrow input stream)."""

    def __init__(self, head: bytes, f: IO[bytes]):
        self._head = head
        self._f = f

    def readable(self) -> bool:  # pragma: no cover - io protocol
        return True

    def readinto(self, b) -> int:
        if self._head:
            n = min(len(b), len(self._head))
            b[:n] = self._head[:n]
            self._head = self._head[n:]
            return n
        chunk = self._f.read(len(b))
        if not chunk:
            return 0
        b[: len(chunk)] = chunk
        return len(chunk)


def maybe_gzip_stream(f: IO[bytes]) -> IO[bytes]:
    """Wrap a byte stream (file object or pyarrow NativeFile, seekable
    or not) in a multi-member gzip reader when the magic matches; pass
    through otherwise. :class:`gzip.GzipFile` reads concatenated
    members, so per-record-compressed production files decode
    transparently."""
    magic = f.read(2)
    raw = io.BufferedReader(_PrependStream(magic, f))
    if magic == b"\x1f\x8b":
        return gzip.GzipFile(fileobj=raw, mode="rb")
    return raw
