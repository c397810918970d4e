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


# process-global embedder cache for stateless-task mode (read-only state,
# built once per worker process — the reference's utils/common.py:20 cache)
_EMBEDDERS: dict = {}


def _embedder(model: str, dim: int):
    key = (model, dim)
    if key not in _EMBEDDERS:
        _EMBEDDERS[key] = get_embedder(model, dim)
    return _EMBEDDERS[key]


def _embed_batch(batch: pa.Table, cfg: PipelineConfig,
                 lineage: LineageRecorder | None) -> pa.Table:
    t0 = time.perf_counter()
    frag = first_fragment(batch, "chunk_id")
    texts = batch.column("text").to_pylist()
    # passage-side embedding: E5 prefix rules applied per text
    vecs = _embedder(cfg.embedding_model, cfg.vector_size).encode(texts)
    dim = cfg.vector_size
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
                [t[: cfg.payload_text_max] for t in texts], pa.string()
            ),
        },
        schema=vectors_schema(dim),
    )
    if lineage is not None:
        lineage.record(
            frag, batch.num_rows, out.num_rows, 0, (time.perf_counter() - t0) * 1e3
        )
    return out


class EmbedChunks:
    """Actor-pool stage: ``map_batches(EmbedChunks, fn_constructor_kwargs=...,
    concurrency=N, batch_size=B)`` — for models whose state is expensive
    to build (sentence-transformers weights, GPU placement)."""

    def __init__(self, cfg: PipelineConfig, lineage: LineageRecorder | None = None):
        self.cfg = cfg
        self.lineage = lineage
        # eager build in __init__: once per actor, amortized across batches
        _embedder(cfg.embedding_model, cfg.vector_size)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _embed_batch(batch, self.cfg, self.lineage)


def make_embed_fn(cfg: PipelineConfig, lineage: LineageRecorder | None = None):
    """Stateless-task variant for cheap deterministic embedders: runs on
    the warm task-worker pool (a Ray ACTOR is always a fresh process —
    ~2 s Python/import start each; a pool of 16 costs ~30 s of cold-start
    on a short job, which only amortizes for heavyweight model state)."""

    def embed(batch: pa.Table) -> pa.Table:
        return _embed_batch(batch, cfg, lineage)

    return embed


def wants_actor_pool(cfg: PipelineConfig) -> bool:
    """Heavy (real-model) embedders get an actor pool; hash doubles run as
    stateless tasks."""
    return not cfg.embedding_model.startswith("hash-")
