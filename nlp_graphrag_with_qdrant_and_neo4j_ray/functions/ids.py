"""Deterministic identity functions (SURVEY.md §2.8)."""

from __future__ import annotations

import uuid

# Fixed namespace used by the reference for Qdrant point ids
# (/root/reference/graphrag/connectors/qdrant_connection.py:106).
QDRANT_NAMESPACE = uuid.UUID("bf8def8c-49bf-4e0d-93d5-1c1d1c6b6956")


def point_uuid(string_id: str) -> str:
    """UUIDv5 of a string id under the fixed app namespace — byte-compatible
    with the reference's ``_string_to_uuid``
    (connectors/qdrant_connection.py:95-107)."""
    return str(uuid.uuid5(QDRANT_NAMESPACE, string_id))


def chunk_id(doc_id: str, index: int) -> str:
    """``f"{doc_id}_chunk{i}"`` (/root/reference/graphrag/core/ingest.py:145)."""
    return f"{doc_id}_chunk{index}"


def parse_chunk_id(cid: str) -> tuple[str, int] | None:
    """Inverse of :func:`chunk_id` — the id scheme is this engine's own
    stable contract, so serving-path code can recover ``(doc_id, index)``
    without a table lookup. Returns None for ids not in the scheme."""
    head, sep, tail = cid.rpartition("_chunk")
    if not sep or not head or not tail.isdigit():
        return None
    return head, int(tail)


def doc_id_from_url(url: str) -> str:
    """Reference doc_id = filename without extension (cli/main.py:128);
    for the pages table: last path segment of the url, sans a trailing
    file extension."""
    seg = url.rstrip("/").rsplit("/", 1)[-1]
    # strip query-string / fragment deterministically
    for sep in ("?", "#"):
        seg = seg.split(sep, 1)[0]
    if "." in seg:
        base, ext = seg.rsplit(".", 1)
        if base and ext.isalnum() and len(ext) <= 5:
            seg = base
    return seg
