"""Sink seam (SURVEY.md §2.10): Parquet default, optional live Qdrant /
Neo4j writers behind the same interface.

The engine's canonical outputs are the partitioned Parquet tables
(``state/checkpoint.py`` owns those writes); a ``Sink`` re-publishes a
built table into a live store. The *format* functions are pure and
hermetically tested:

- :func:`qdrant_points` — chunk_vectors rows → Qdrant point dicts, byte-
  compatible with the reference writer (UUIDv5 under the fixed namespace,
  payload ``{doc_id, chunk_index, text[:1000], original_id}``;
  /root/reference/graphrag/connectors/qdrant_connection.py:94-152,
  core/ingest.py:181-214).
- :func:`neo4j_statements` — node/edge tables → batched ``UNWIND … MERGE``
  Cypher (reference core/ingest.py:126-179, core/nlp_graph.py:60-104,
  core/triplets.py:354-369 shapes).

The live clients (qdrant-client / neo4j bolt driver) are not in this
container: the sink classes gate on import and raise a clear
``NotImplementedError`` at CONSTRUCTION, so a deployment with the client
installed gets a working writer and this environment fails fast, never
silently.
"""

from __future__ import annotations

import os
from typing import Any, Protocol

import pyarrow as pa


class Sink(Protocol):
    """One method: publish a built table under its logical name."""

    def write(self, table_name: str, ds) -> dict[str, Any]:
        ...


class ParquetSink:
    """Default sink: partitioned Parquet directory per table (what the
    checkpoint layer already produces; this re-publishes to another
    root, e.g. shared storage)."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir

    def write(self, table_name: str, ds) -> dict[str, Any]:
        path = os.path.join(self.out_dir, table_name)
        ds.write_parquet(path)
        return {"sink": "parquet", "table": table_name, "path": path}


# ------------------------- Qdrant-shaped output ----------------------------

def qdrant_points(batch: pa.Table) -> list[dict]:
    """chunk_vectors rows → Qdrant point dicts (pure, client-free).

    Point id = the table's ``point_uuid`` column (UUIDv5 of chunk_id
    under namespace bf8def8c-…, computed at build time byte-compatibly
    with qdrant_connection.py:94-107); payload mirrors
    core/ingest.py:194-201 + the ``original_id`` the reference's
    upsert adds (qdrant_connection.py:126-132)."""
    out = []
    for row in batch.to_pylist():
        out.append(
            {
                "id": row["point_uuid"],
                "vector": list(row["embedding"]),
                "payload": {
                    "doc_id": row["doc_id"],
                    "chunk_index": row["chunk_index"],
                    "text": row["payload_text"],
                    "original_id": row["chunk_id"],
                },
            }
        )
    return out


class QdrantSink:
    """Live Qdrant writer (collection "tokens", cosine/768 — reference
    qdrant_connection.py:182-221). Requires ``qdrant-client``."""

    def __init__(self, url: str = "http://localhost:6333",
                 collection: str = "tokens", vector_size: int = 768):
        try:
            from qdrant_client import QdrantClient, models  # type: ignore
        except ImportError as e:  # pragma: no cover - dep absent here
            raise NotImplementedError(
                "QdrantSink needs the qdrant-client package (not installed "
                "in this environment); the Parquet vector-shard table is "
                "the default sink"
            ) from e
        self._models = models
        self.client = QdrantClient(url=url)
        self.collection = collection
        self.client.recreate_collection(
            collection_name=collection,
            vectors_config=models.VectorParams(
                size=vector_size, distance=models.Distance.COSINE
            ),
        )

    def write(self, table_name: str, ds) -> dict[str, Any]:  # pragma: no cover
        n = 0
        for batch in ds.iter_batches(batch_size=256, batch_format="pyarrow"):
            pts = [
                self._models.PointStruct(**p) for p in qdrant_points(batch)
            ]
            self.client.upsert(collection_name=self.collection, points=pts)
            n += len(pts)
        return {"sink": "qdrant", "table": table_name, "points": n}


# ------------------------- Neo4j-shaped output -----------------------------

_CYPHER = {
    # MERGE shapes of core/ingest.py:136-177 (Document/Chunk/CONTAINS/
    # NEXT/PREV from the chain columns), nlp_graph.py:88-97 (HAS_TERM),
    # triplets.py:354-369 (Entity / RELATES_TO)
    "chunks": (
        "UNWIND $rows AS r "
        "MERGE (d:Document {id: r.doc_id}) "
        "MERGE (c:Chunk {id: r.chunk_id}) "
        "SET c.text = r.text, c.index = r.chunk_index "
        "MERGE (d)-[:CONTAINS]->(c) "
        "FOREACH (_ IN CASE WHEN r.next_chunk_id IS NULL THEN [] ELSE [1] END | "
        " MERGE (n:Chunk {id: r.next_chunk_id}) MERGE (c)-[:NEXT]->(n)) "
        "FOREACH (_ IN CASE WHEN r.prev_chunk_id IS NULL THEN [] ELSE [1] END | "
        " MERGE (p:Chunk {id: r.prev_chunk_id}) MERGE (c)-[:PREV]->(p))"
    ),
    "terms": (
        "UNWIND $rows AS r "
        "MERGE (t:Term {text: r.term, type: r.term_type}) "
        "MERGE (c:Chunk {id: r.chunk_id}) "
        "MERGE (c)-[:HAS_TERM]->(t)"
    ),
    "edges": (
        "UNWIND $rows AS r "
        "MERGE (s:Entity {name: r.src_entity_id}) "
        "MERGE (o:Entity {name: r.dst_entity_id}) "
        "MERGE (s)-[rel:RELATES_TO {name: r.pred}]->(o) "
        "SET rel.label = 'triplet', rel.weight = r.weight, "
        "rel.source = r.chunk_id"
    ),
}


def neo4j_statements(table_name: str, batch: pa.Table,
                     batch_size: int = 100) -> list[tuple[str, dict]]:
    """Table rows → [(cypher, params)] in reference-sized batches (100
    rows per UNWIND, nlp_graph.py:77-79). Pure, client-free. Note the
    edges statement SETS ``rel.source`` — the provenance the reference's
    write path always left null (SURVEY.md §1.1 latent bug, fixed here
    and recorded)."""
    if table_name not in _CYPHER:
        raise KeyError(f"no Neo4j shape for table {table_name!r}")
    rows = [
        {k: v for k, v in r.items() if not k.endswith("embedding")}
        for r in batch.to_pylist()
    ]
    cypher = _CYPHER[table_name]
    return [
        (cypher, {"rows": rows[i : i + batch_size]})
        for i in range(0, len(rows), batch_size)
    ]


class Neo4jSink:
    """Live Neo4j writer. Requires the ``neo4j`` bolt driver."""

    def __init__(self, uri: str = "bolt://localhost:7687",
                 auth: tuple[str, str] | None = None):
        try:
            from neo4j import GraphDatabase  # type: ignore
        except ImportError as e:  # pragma: no cover - dep absent here
            raise NotImplementedError(
                "Neo4jSink needs the neo4j driver package (not installed "
                "in this environment); the sorted Parquet node/edge tables "
                "are the default sink"
            ) from e
        self.driver = GraphDatabase.driver(uri, auth=auth)

    def write(self, table_name: str, ds) -> dict[str, Any]:  # pragma: no cover
        n = 0
        with self.driver.session() as session:
            for batch in ds.iter_batches(batch_size=4096,
                                         batch_format="pyarrow"):
                for cypher, params in neo4j_statements(table_name, batch):
                    session.run(cypher, params)
                    n += len(params["rows"])
        return {"sink": "neo4j", "table": table_name, "rows": n}


def make_sink(kind: str, **kwargs) -> Sink:
    """Factory for the CLI/export surface."""
    if kind == "parquet":
        return ParquetSink(**kwargs)
    if kind == "qdrant":
        return QdrantSink(**kwargs)
    if kind == "neo4j":
        return Neo4jSink(**kwargs)
    raise ValueError(f"unknown sink kind {kind!r}")
