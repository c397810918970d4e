"""WARC/WET codec + streaming source (functions/warc.py, sources/warc.py).

The archive-format extension of the reference's loose-file ingest seam
(cli/main.py:115-156): ISO 28500 records, per-record gzip members,
bounded-memory stream parsing, pages-schema mapping.
"""

import datetime
import gzip
import io
import os

import pyarrow as pa
import pytest

from nlp_graphrag_with_qdrant_and_neo4j_ray.functions.warc import (
    encode_warc_pages,
    encode_warc_record,
    encode_wet_pages,
    format_warc_date,
    iter_warc_records,
    maybe_gzip_stream,
    parse_warc_date,
    record_to_page,
    split_http_response,
    wet_lang,
)

TS = datetime.datetime(2025, 3, 28, 12, 34, 56)


def _rows(n=5):
    return [
        {
            "url": f"https://crawl.example/src/doc-{i}",
            "warc_ts": TS + datetime.timedelta(seconds=i),
            "text": f"doc {i} café\n\nsecond paragraph {i}",
            "lang": ["en", "de", "fr", "es", "zh"][i % 5],
            "html": f"<html><body><p>doc {i}</p></body></html>".encode(),
        }
        for i in range(n)
    ]


def _parse_all(payload: bytes):
    stream = maybe_gzip_stream(io.BytesIO(payload))
    return list(iter_warc_records(stream))


class TestCodec:
    def test_wet_roundtrip_compressed_and_plain(self):
        rows = _rows()
        for compress in (True, False):
            recs = _parse_all(encode_wet_pages(rows, compress=compress))
            # warcinfo leads, like production files
            assert recs[0][0]["WARC-Type"] == "warcinfo"
            pages = [p for h, b in recs if (p := record_to_page(h, b))]
            assert len(pages) == len(rows)
            for got, want in zip(pages, rows):
                assert got["url"] == want["url"]
                assert got["warc_ts"] == want["warc_ts"]
                assert got["text"] == want["text"]
                assert got["lang"] == want["lang"]
                assert got["html"] == b""

    def test_warc_response_roundtrip(self):
        rows = _rows()
        recs = _parse_all(encode_warc_pages(rows))
        pages = [p for h, b in recs if (p := record_to_page(h, b))]
        assert len(pages) == len(rows)
        for got, want in zip(pages, rows):
            assert got["html"] == want["html"]
            assert got["text"] == ""

    def test_deterministic_bytes(self):
        rows = _rows()
        assert encode_wet_pages(rows) == encode_wet_pages(rows)
        assert encode_warc_pages(rows) == encode_warc_pages(rows)

    def test_multi_member_gzip(self):
        """Each record is its OWN gzip member (the production layout
        that makes archives offset-seekable)."""
        payload = encode_wet_pages(_rows(3))
        members = payload.count(b"\x1f\x8b\x08")
        assert members == 4  # warcinfo + 3 conversion records
        # and gzip reads the concatenation transparently
        assert len(_parse_all(payload)) == 4

    def test_non200_and_noise_records_skipped(self):
        http404 = (b"HTTP/1.1 404 Not Found\r\n\r\ngone")
        rec404 = encode_warc_record(
            "response",
            {"WARC-Target-URI": "https://x/404",
             "WARC-Date": format_warc_date(TS),
             "Content-Type": "application/http; msgtype=response"},
            http404,
        )
        req = encode_warc_record(
            "request",
            {"WARC-Target-URI": "https://x/a",
             "WARC-Date": format_warc_date(TS)},
            b"GET /a HTTP/1.1\r\n\r\n",
        )
        pages = [record_to_page(h, b)
                 for h, b in _parse_all(rec404 + req)]
        assert pages == [None, None]

    def test_truncated_body_raises(self):
        rec = encode_warc_record(
            "conversion",
            {"WARC-Target-URI": "https://x/t",
             "WARC-Date": format_warc_date(TS)},
            b"hello world",
        )
        with pytest.raises(ValueError, match="truncated"):
            _parse_all(rec[:-20])

    def test_garbage_raises(self):
        with pytest.raises(ValueError, match="version line"):
            _parse_all(b"not a warc file\r\n")

    def test_latin1_fallback_in_wet_body(self):
        """Engine-wide decode policy: utf-8, then latin-1."""
        rec = encode_warc_record(
            "conversion",
            {"WARC-Target-URI": "https://x/l1",
             "WARC-Date": format_warc_date(TS),
             "Content-Type": "text/plain"},
            b"caf\xe9",  # latin-1 bytes, invalid utf-8
        )
        (h, b), = _parse_all(rec)
        assert record_to_page(h, b)["text"] == "café"

    def test_warc_date_roundtrip(self):
        assert parse_warc_date(format_warc_date(TS)) == TS
        # sub-second precision appears in the wild
        assert parse_warc_date("2025-03-28T12:34:56.123456Z") == (
            TS + datetime.timedelta(microseconds=123456))

    def test_split_http_response(self):
        headers, body = split_http_response(
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<p>x</p>")
        assert headers["_status"] == "HTTP/1.1 200 OK"
        assert headers["content-type"] == "text/html"
        assert body == b"<p>x</p>"

    def test_wet_lang_mapping(self):
        assert wet_lang({"WARC-Identified-Content-Language": "eng"}, "xx") == "en"
        assert wet_lang({"WARC-Identified-Content-Language": "deu,eng"}, "xx") == "de"
        assert wet_lang({}, "xx") == "xx"
        # unknown ISO-639-3 code falls back to its 2-letter prefix
        assert wet_lang({"WARC-Identified-Content-Language": "swa"}, "xx") == "sw"

    def test_maybe_gzip_stream_nonseekable(self):
        """The Ray datasource hands a NON-seekable stream; magic must be
        sniffed without seek()."""

        class NoSeek(io.RawIOBase):
            def __init__(self, data):
                self._b = io.BytesIO(data)

            def readable(self):
                return True

            def readinto(self, b):
                chunk = self._b.read(len(b))
                b[: len(chunk)] = chunk
                return len(chunk)

        payload = encode_wet_pages(_rows(2))
        stream = maybe_gzip_stream(io.BufferedReader(NoSeek(payload)))
        assert len(list(iter_warc_records(stream))) == 3

    def test_whole_file_single_gzip_stream(self):
        """Some producers gzip the whole file as one member."""
        plain = encode_wet_pages(_rows(3), compress=False)
        whole = gzip.compress(plain, mtime=0)
        assert len(_parse_all(whole)) == 4


class TestRaySource:
    def _write_shards(self, tmp_path, n_shards=3, per_shard=40):
        paths = []
        for s in range(n_shards):
            rows = [
                {
                    "url": f"https://crawl.example/s{s}/doc-{i}",
                    "warc_ts": TS,
                    "text": f"shard {s} doc {i}",
                    "lang": "en",
                    "html": f"<p>shard {s} doc {i}</p>".encode(),
                }
                for i in range(per_shard)
            ]
            p = os.path.join(tmp_path, f"part-{s}.wet.gz")
            with open(p, "wb") as f:
                f.write(encode_wet_pages(rows))
            paths.append(p)
        return paths

    def test_read_wet_as_pages(self, ray_session, tmp_path):
        from nlp_graphrag_with_qdrant_and_neo4j_ray.sources.warc import (
            read_warc_as_pages,
        )

        paths = self._write_shards(str(tmp_path))
        ds = read_warc_as_pages(paths, records_per_block=16)
        rows = sorted(ds.take_all(), key=lambda r: r["url"])
        assert len(rows) == 120
        assert rows[0]["url"] == "https://crawl.example/s0/doc-0"
        assert rows[0]["text"] == "shard 0 doc 0"
        assert rows[0]["lang"] == "en"
        # bounded blocks: 40 records per shard at 16/block → ≥3 blocks/file
        assert ds.materialize().num_blocks() >= 3

    def test_schema_matches_pages(self, ray_session, tmp_path):
        from nlp_graphrag_with_qdrant_and_neo4j_ray.schemas import PAGES
        from nlp_graphrag_with_qdrant_and_neo4j_ray.sources.warc import (
            read_warc_as_pages,
        )

        paths = self._write_shards(str(tmp_path), n_shards=1, per_shard=4)
        got = read_warc_as_pages(paths).schema()
        assert got.names == PAGES.names
        assert [str(t) for t in got.types] == [str(f.type) for f in PAGES]

    def test_cli_ingest_from_wet_archive(self, ray_session, tmp_path, capsys):
        """`ingest --pages <dir of .wet.gz>` builds the full KG straight
        from archives — no intermediate parquet conversion step."""
        import json

        from nlp_graphrag_with_qdrant_and_neo4j_ray.__main__ import main

        d = os.path.join(str(tmp_path), "archives")
        os.makedirs(d)
        rows = [
            {"url": f"https://crawl.example/c/doc-{i}", "warc_ts": TS,
             "text": (f"Hugging Face released Transformers in doc {i}. "
                      f"The library supports PyTorch."),
             "lang": "en", "html": b""}
            for i in range(12)
        ]
        with open(os.path.join(d, "part-0.wet.gz"), "wb") as f:
            f.write(encode_wet_pages(rows))
        out = os.path.join(str(tmp_path), "kg")
        assert main(["ingest", "--pages", d, "--out", out]) == 0
        j = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert j["tables"]["chunks"] == 12
        assert j["tables"]["edges"] > 0

    def test_warc_response_through_extract_stage(self, ray_session, tmp_path):
        """Full archive path: WARC response records → pages → the
        unchanged extract stage → byte-identical text."""
        from nlp_graphrag_with_qdrant_and_neo4j_ray.config import PipelineConfig
        from nlp_graphrag_with_qdrant_and_neo4j_ray.functions.html import render_html
        from nlp_graphrag_with_qdrant_and_neo4j_ray.sources.warc import (
            read_warc_as_pages,
        )
        from nlp_graphrag_with_qdrant_and_neo4j_ray.stages.extract import (
            make_extract_fn,
        )

        texts = {f"doc-{i}": f"para one {i}\n\npara two café {i}"
                 for i in range(6)}
        rows = [
            {"url": f"https://crawl.example/x/{did}", "warc_ts": TS,
             "text": "", "lang": "en", "html": render_html(did, text)}
            for did, text in texts.items()
        ]
        p = os.path.join(str(tmp_path), "cap.warc.gz")
        with open(p, "wb") as f:
            f.write(encode_warc_pages(rows))
        docs = (
            read_warc_as_pages([p])
            .map_batches(make_extract_fn(PipelineConfig()),
                         batch_format="pyarrow", batch_size=4)
            .take_all()
        )
        assert {d["doc_id"]: d["text"] for d in docs} == texts


class TestProperties:
    def test_header_injection_refused(self):
        with pytest.raises(ValueError, match="control characters"):
            encode_warc_record(
                "conversion",
                {"WARC-Target-URI": "https://x/a\r\nWARC-Type: evil"},
                b"",
            )

    def test_wet_roundtrip_property(self):
        """decode(encode(rows)) == rows for adversarial text — including
        bodies that CONTAIN 'WARC/1.0' version lines, blank-line runs
        and partial records (Content-Length framing makes body content
        inert)."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        sane_url = st.from_regex(
            r"https://[a-z]{1,8}\.example/[A-Za-z0-9._~%/-]{0,24}",
            fullmatch=True)
        body_text = st.text(
            alphabet=st.characters(blacklist_categories=("Cs",)),
            max_size=400,
        )

        @settings(max_examples=60, deadline=None)
        @given(st.lists(
            st.tuples(sane_url, body_text), min_size=1, max_size=5))
        def prop(items):
            rows = [{"url": u, "warc_ts": TS,
                     "text": t + "\r\n\r\nWARC/1.0\r\nContent-Length: 3",
                     "lang": "en"}
                    for u, t in items]
            recs = _parse_all(encode_wet_pages(rows))
            pages = [p for h, b in recs if (p := record_to_page(h, b))]
            assert [(p["url"], p["text"]) for p in pages] == [
                (r["url"], r["text"]) for r in rows]

        prop()
