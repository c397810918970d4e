"""pages → documents: language filter + HTML→text extraction.

One stateless ``map_batches`` stage (batch_format="pyarrow"): the language
filter runs first inside the same batch fn (no extra pass, filtered counts
land in lineage), then html→text decoding with the deterministic utf-8/
latin-1 policy (the reference's file-read fallback, cli/main.py:135-143).
The wide ``html`` column is dropped here so every downstream block is slim
(SURVEY.md §7.5 item 4).
"""

from __future__ import annotations

import time

import pyarrow as pa
import pyarrow.compute as pc

from ..config import PipelineConfig
from ..functions.html import extract_text
from ..functions.ids import doc_id_from_url
from ..schemas import DOCUMENTS
from ..state.lineage import LineageRecorder, first_fragment


def make_extract_fn(cfg: PipelineConfig, lineage: LineageRecorder | None = None):
    langs = pa.array(sorted(set(cfg.languages)))

    def extract(batch: pa.Table) -> pa.Table:
        t0 = time.perf_counter()
        frag = first_fragment(batch, "url")
        rows_in = batch.num_rows
        kept = batch.filter(pc.is_in(batch.column("lang"), value_set=langs))
        urls = kept.column("url").to_pylist()
        # html→text for raw captures; WET-style rows (pre-extracted
        # text, html EMPTY — sources/warc.py conversion records set
        # b"") pass their text column through unchanged. html=NULL
        # stays an error (→ per-row quarantine): a capture row with no
        # payload at all is malformed, not pre-extracted.
        texts = [
            (t or "") if (h is not None and len(h) == 0) else extract_text(h)
            for h, t in zip(kept.column("html").to_pylist(),
                            kept.column("text").to_pylist())
        ]
        out = pa.table(
            {
                "doc_id": pa.array([doc_id_from_url(u) for u in urls], pa.string()),
                "url": pa.array(urls, pa.string()),
                "text": pa.array(texts, pa.large_string()),
                "n_chars": pc.cast(
                    pc.utf8_length(pa.array(texts, pa.large_string())), pa.int64()
                ),
            },
            schema=DOCUMENTS,
        )
        if lineage is not None:
            lineage.record(
                frag, rows_in, out.num_rows, 0, (time.perf_counter() - t0) * 1e3
            )
        return out

    return extract
