"""Text-analysis pipelines over a documents table (training-data prep)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.textstats import (
    bpe_ish_token_count,
    detect_language,
    fingerprint64,
    quality_scores,
    ws_token_count,
)


def token_counts(docs_ds, id_col: str = "doc_id", text_col: str = "text"):
    """(id, ws_tokens, bpe_ish_tokens) per document."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        return pa.table(
            {
                id_col: batch.column(id_col),
                "ws_tokens": pa.array([ws_token_count(t) for t in texts], pa.int64()),
                "bpe_ish_tokens": pa.array(
                    [bpe_ish_token_count(t) for t in texts], pa.int64()
                ),
            }
        )

    return docs_ds.map_batches(fn, batch_format="pyarrow", batch_size=8192)


def language_id(docs_ds, id_col: str = "doc_id", text_col: str = "text"):
    """(id, detected_lang) via the function-word heuristic."""

    def fn(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: batch.column(id_col),
                "detected_lang": pa.array(
                    [detect_language(t) for t in batch.column(text_col).to_pylist()],
                    pa.string(),
                ),
            }
        )

    return docs_ds.map_batches(fn, batch_format="pyarrow", batch_size=8192)


def quality(docs_ds, id_col: str = "doc_id", text_col: str = "text"):
    """(id, n_chars, n_words, ratios..., quality) per document."""

    def fn(batch: pa.Table) -> pa.Table:
        rows = [quality_scores(t) for t in batch.column(text_col).to_pylist()]
        out = {id_col: batch.column(id_col)}
        for col in (
            "n_chars", "n_words", "mean_word_len", "alpha_ratio", "punct_ratio",
            "digit_ratio", "stopword_ratio", "quality",
        ):
            typ = pa.int64() if col in ("n_chars", "n_words") else pa.float64()
            out[col] = pa.array([r[col] for r in rows], typ)
        return pa.table(out)

    return docs_ds.map_batches(fn, batch_format="pyarrow", batch_size=8192)


def md5_fingerprints(docs_ds, id_col: str = "doc_id", text_col: str = "text"):
    """(id, fingerprint:string) — md5 hex of the whitespace-normalized
    text. The SQL-expressible content fingerprint (oracled in DuckDB as
    md5 over the same normalization); the order-sensitive rolling
    fingerprint stays in :func:`fingerprints`."""
    import hashlib

    def fn(batch: pa.Table) -> pa.Table:
        vals = [
            hashlib.md5(" ".join(t.split()).encode("utf-8")).hexdigest()
            for t in batch.column(text_col).to_pylist()
        ]
        return pa.table(
            {id_col: batch.column(id_col),
             "fingerprint": pa.array(vals, pa.string())}
        )

    return docs_ds.map_batches(fn, batch_format="pyarrow", batch_size=8192)


def fingerprints(docs_ds, window: int = 8,
                 id_col: str = "doc_id", text_col: str = "text"):
    """(id, fingerprint:int64 bit-view) rolling-hash document fingerprint."""

    def fn(batch: pa.Table) -> pa.Table:
        vals = [
            np.uint64(fingerprint64(t, window)).astype(np.int64)
            for t in batch.column(text_col).to_pylist()
        ]
        return pa.table(
            {id_col: batch.column(id_col), "fingerprint": pa.array(vals, pa.int64())}
        )

    return docs_ds.map_batches(fn, batch_format="pyarrow", batch_size=8192)
