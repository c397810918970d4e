"""documents → chunks: sentence-pack chunker as a fan-out map_batches.

Rows in = documents, rows out = chunks (1 doc → 0..N chunks). The
reference's NEXT/PREV linked list (core/ingest.py:162-177) is two nullable
columns computed locally per document — no graph store, no shuffle
(SURVEY.md §1.4).
"""

from __future__ import annotations

import time

import pyarrow as pa

from ..config import PipelineConfig
from ..functions.chunk import chunk_text
from ..functions.ids import chunk_id
from ..schemas import CHUNKS
from ..state.lineage import LineageRecorder, first_fragment


def make_chunk_fn(cfg: PipelineConfig, lineage: LineageRecorder | None = None):
    max_tokens = cfg.max_tokens_per_chunk

    def chunker(batch: pa.Table) -> pa.Table:
        t0 = time.perf_counter()
        frag = first_fragment(batch, "doc_id")
        cid, did, idx, txt, ntok, prev, nxt = [], [], [], [], [], [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            chunks = chunk_text(text, max_tokens)
            n = len(chunks)
            for i, (ctext, n_tokens) in enumerate(chunks):
                cid.append(chunk_id(doc_id, i))
                did.append(doc_id)
                idx.append(i)
                txt.append(ctext)
                ntok.append(n_tokens)
                prev.append(chunk_id(doc_id, i - 1) if i > 0 else None)
                nxt.append(chunk_id(doc_id, i + 1) if i < n - 1 else None)
        out = pa.table(
            {
                "chunk_id": pa.array(cid, pa.string()),
                "doc_id": pa.array(did, pa.string()),
                "chunk_index": pa.array(idx, pa.int32()),
                "text": pa.array(txt, pa.large_string()),
                "n_tokens": pa.array(ntok, pa.int32()),
                "prev_chunk_id": pa.array(prev, pa.string()),
                "next_chunk_id": pa.array(nxt, pa.string()),
            },
            schema=CHUNKS,
        )
        if lineage is not None:
            lineage.record(
                frag, batch.num_rows, out.num_rows, 0, (time.perf_counter() - t0) * 1e3
            )
        return out

    return chunker
