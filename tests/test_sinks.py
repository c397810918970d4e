"""Sink seam (SURVEY.md §2.10): Parquet default + live-writer interface,
with the pure point/statement builders checked against the reference's
byte-level semantics."""

import uuid

import pyarrow as pa
import pytest

from nlp_graphrag_with_qdrant_and_neo4j_ray.sinks import (
    Neo4jSink,
    ParquetSink,
    QdrantSink,
    make_sink,
    neo4j_statements,
    qdrant_points,
)

NAMESPACE = uuid.UUID("bf8def8c-49bf-4e0d-93d5-1c1d1c6b6956")


def _vec_batch():
    return pa.table(
        {
            "chunk_id": ["doc1_chunk0", "doc1_chunk1"],
            "doc_id": ["doc1", "doc1"],
            "chunk_index": pa.array([0, 1], pa.int32()),
            "embedding": [[0.1, 0.2], [0.3, 0.4]],
            "point_uuid": [
                str(uuid.uuid5(NAMESPACE, "doc1_chunk0")),
                str(uuid.uuid5(NAMESPACE, "doc1_chunk1")),
            ],
            "payload_text": ["alpha", "beta"],
        }
    )


def test_qdrant_points_reference_parity():
    """Point id = UUIDv5(chunk_id) under the reference's fixed namespace
    (qdrant_connection.py:94-107); payload = {doc_id, chunk_index,
    text[:1000], original_id} (core/ingest.py:194-201 + :126-132)."""
    pts = qdrant_points(_vec_batch())
    assert pts[0]["id"] == str(uuid.uuid5(NAMESPACE, "doc1_chunk0"))
    assert pts[0]["payload"] == {
        "doc_id": "doc1",
        "chunk_index": 0,
        "text": "alpha",
        "original_id": "doc1_chunk0",
    }
    assert pts[1]["vector"] == pytest.approx([0.3, 0.4])


def test_neo4j_statements_batching_and_shapes():
    rows = pa.table(
        {
            "chunk_id": [f"c{i}" for i in range(250)],
            "term": ["t"] * 250,
            "term_type": ["unigram"] * 250,
            "position": pa.array(range(250), pa.int32()),
        }
    )
    stmts = neo4j_statements("terms", rows)
    # reference batches 100 terms per UNWIND query (nlp_graph.py:77-79)
    assert [len(p["rows"]) for _, p in stmts] == [100, 100, 50]
    assert all("MERGE (t:Term {text: r.term, type: r.term_type})" in c
               for c, _ in stmts)

    edges = pa.table(
        {
            "src_entity_id": ["e:a"],
            "dst_entity_id": ["e:b"],
            "pred": ["likes"],
            "chunk_id": ["c0"],
            "weight": pa.array([2], pa.int64()),
            "pred_embedding": [[0.0, 0.1]],
        }
    )
    [(cypher, params)] = neo4j_statements("edges", edges)
    assert "rel.source = r.chunk_id" in cypher  # provenance fix vs reference
    assert "pred_embedding" not in params["rows"][0]  # vectors stay in parquet

    with pytest.raises(KeyError):
        neo4j_statements("nope", edges)


def test_parquet_sink_roundtrip(ray_session, tmp_path):
    import ray.data

    sink = ParquetSink(str(tmp_path))
    res = sink.write("vecs", ray.data.from_arrow(_vec_batch()))
    assert res["sink"] == "parquet"
    back = ray.data.read_parquet(res["path"]).take_all()
    assert {r["chunk_id"] for r in back} == {"doc1_chunk0", "doc1_chunk1"}


def test_live_sinks_gate_cleanly_without_clients():
    """qdrant-client / neo4j driver are not installed here: construction
    must raise NotImplementedError (fail fast), not crash mid-write."""
    with pytest.raises(NotImplementedError):
        QdrantSink()
    with pytest.raises(NotImplementedError):
        Neo4jSink()


def test_make_sink_dispatch(tmp_path):
    assert isinstance(make_sink("parquet", out_dir=str(tmp_path)), ParquetSink)
    with pytest.raises(ValueError):
        make_sink("bogus")


def test_cli_export_parquet(ray_session, tmp_path, capsys):
    import json

    from nlp_graphrag_with_qdrant_and_neo4j_ray.__main__ import main

    out = str(tmp_path / "kg")
    assert main(["ingest", "--pages", "synth:20", "--out", out]) == 0
    capsys.readouterr()
    target = str(tmp_path / "published")
    assert main(["export", "--out", out, "--target", target,
                 "--tables", "chunks,edges"]) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert [r["table"] for r in res] == ["chunks", "edges"]
    import os

    assert os.path.isdir(os.path.join(target, "chunks"))
