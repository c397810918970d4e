"""chunks → chunk_vectors: stateful embedder actor pool.

The reference loads the SentenceTransformer once per process via a global
cache (utils/common.py:20-48) and embeds one document's chunks per call;
here the model lives in the actor's ``__init__`` (once per pool worker)
and every call embeds a full Arrow batch. Output is the Qdrant-shaped
vector shard table: deterministic UUIDv5 point ids
(connectors/qdrant_connection.py:95-107) and the payload text truncation
``text[:1000]`` (core/ingest.py:200).
"""

from __future__ import annotations

import time

import pyarrow as pa

from ..config import PipelineConfig
from ..functions.embed import get_embedder
from ..functions.ids import point_uuid
from ..schemas import chunk_vectors as vectors_schema
from ..state.lineage import LineageRecorder, first_fragment


class EmbedChunks:
    """Actor-pool stage: ``map_batches(EmbedChunks, fn_constructor_kwargs=...,
    concurrency=N, batch_size=B)``."""

    def __init__(self, cfg: PipelineConfig, lineage: LineageRecorder | None = None):
        self.cfg = cfg
        self.lineage = lineage
        self.embedder = get_embedder(cfg.embedding_model, cfg.vector_size)
        self.schema = vectors_schema(cfg.vector_size)

    def __call__(self, batch: pa.Table) -> pa.Table:
        t0 = time.perf_counter()
        frag = first_fragment(batch, "chunk_id")
        texts = batch.column("text").to_pylist()
        # passage-side embedding: E5 prefix rules applied per text
        vecs = self.embedder.encode(texts)
        dim = self.cfg.vector_size
        emb = pa.FixedSizeListArray.from_arrays(
            pa.array(vecs.reshape(-1), type=pa.float32()), dim
        )
        chunk_ids = batch.column("chunk_id").to_pylist()
        out = pa.table(
            {
                "chunk_id": batch.column("chunk_id"),
                "doc_id": batch.column("doc_id"),
                "chunk_index": batch.column("chunk_index"),
                "embedding": emb,
                "point_uuid": pa.array([point_uuid(c) for c in chunk_ids], pa.string()),
                "payload_text": pa.array(
                    [t[: self.cfg.payload_text_max] for t in texts], pa.string()
                ),
            },
            schema=self.schema,
        )
        if self.lineage is not None:
            self.lineage.record(
                frag, batch.num_rows, out.num_rows, 0, (time.perf_counter() - t0) * 1e3
            )
        return out
