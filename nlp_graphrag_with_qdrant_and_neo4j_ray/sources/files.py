"""File-based ingestion parity with the reference CLI.

The reference processes loose ``.txt``/``.pdf`` files
(/root/reference/graphrag/cli/main.py:115-156: doc_id = basename sans
extension, utf-8 read with latin-1 fallback; PDFs via PyMuPDF page-text
concat, core/ingest.py:38-63). The engine's equivalent maps a directory
of files into the canonical ``pages`` table with
``ray.data.read_binary_files`` so the rest of the pipeline is unchanged.

PDF extraction prefers PyMuPDF when importable; without it (this
container) the vendored minimal extractor (``functions/media.py``:
FlateDecode streams + Tj/'/TJ/T* show-text operators) handles simple
PDFs hermetically, and anything it cannot parse raises an honest
``NotImplementedError`` — the Ray-side plumbing (paths → pages rows) is
real either way.
"""

from __future__ import annotations

import datetime
import os

import pyarrow as pa

from ..functions.html import decode_html
from ..schemas import PAGES

EPOCH = datetime.datetime(2025, 3, 28, 0, 0, 0)


def _doc_id(path: str) -> str:
    base = os.path.basename(path)
    stem, _ext = os.path.splitext(base)
    return stem or base


def _pdf_text(payload: bytes) -> str:
    try:  # pragma: no cover - optional heavyweight dependency
        import fitz  # type: ignore

        doc = fitz.open(stream=payload, filetype="pdf")
        return "".join(page.get_text() for page in doc)
    except ImportError:
        pass
    try:
        # vendored minimal extractor — the hermetic real-format branch
        from ..functions.media import extract_pdf_text

        return extract_pdf_text(payload)
    except Exception as e:
        raise NotImplementedError(
            "PDF extraction requires PyMuPDF (fitz) for anything beyond "
            f"simple Flate/Tj PDFs; vendored extractor said: {e!r}"
        ) from None


def read_files_as_pages(paths, lang: str = "en"):
    """Directory/paths of .txt/.html/.pdf files → pages Dataset."""
    import ray.data

    def to_pages(batch: pa.Table) -> pa.Table:
        rows = []
        for path, payload in zip(
            batch.column("path").to_pylist(), batch.column("bytes").to_pylist()
        ):
            ext = os.path.splitext(path)[1].lower()
            if ext == ".pdf":
                text = _pdf_text(payload)
                html = b""
            elif ext in (".html", ".htm"):
                text = ""  # extracted downstream by the extract stage
                html = payload
            else:
                # the reference's utf-8 → latin-1 read policy
                text = decode_html(payload)
                html = b""
            doc_id = _doc_id(path)
            if not html:
                # normalize to the pages contract: html carries the
                # payload the extract stage will parse
                from ..functions.html import render_html

                html = render_html(doc_id, text)
            rows.append(
                {
                    "url": f"file://{os.path.abspath(path)}",
                    "warc_ts": EPOCH,
                    "html": html,
                    "text": text,
                    "lang": lang,
                }
            )
        return pa.Table.from_pylist(rows, schema=PAGES)

    if isinstance(paths, str) and os.path.isdir(paths) and not any(os.scandir(paths)):
        # Ray's read_binary_files fails on an empty dir with an opaque
        # "not enough values to unpack" — give the user a real message
        raise ValueError(f"no input files found in directory: {paths}")
    ds = ray.data.read_binary_files(paths, include_paths=True)
    return ds.map_batches(to_pages, batch_format="pyarrow", batch_size=64)
