import uuid

import numpy as np

from nlp_graphrag_with_qdrant_and_neo4j_ray.functions.embed import (
    HashingEmbedder,
    apply_e5_prefix,
)
from nlp_graphrag_with_qdrant_and_neo4j_ray.functions.ids import (
    QDRANT_NAMESPACE,
    chunk_id,
    doc_id_from_url,
    point_uuid,
)


def test_e5_prefix_rules():
    # explicit prefix wins, space-joined (utils/common.py:73-74)
    assert apply_e5_prefix("text", "intfloat/e5-base-v2", "query:") == "query: text"
    # e5 auto passage prefix
    assert apply_e5_prefix("text", "intfloat/e5-base-v2") == "passage: text"
    # suppression when query:/passage: already present (per-text rule)
    assert apply_e5_prefix("query: q", "intfloat/e5-base-v2") == "query: q"
    assert apply_e5_prefix("has passage: inside", "intfloat/e5-base-v2") == "has passage: inside"
    # non-e5 model: no prefix
    assert apply_e5_prefix("text", "other-model") == "text"


def test_hashing_embedder_contract():
    e = HashingEmbedder(768, "hash-e5-double")
    v = e.encode(["hello world", "hello world", ""])
    assert v.shape == (3, 768) and v.dtype == np.float32
    # unit norm for non-empty, zero vector for empty (utils/common.py:86,92-98)
    assert abs(np.linalg.norm(v[0]) - 1.0) < 1e-5
    assert np.array_equal(v[0], v[1])  # deterministic
    # an e5-family double prefixes "" with "passage: " → real vector
    # (matches the reference, where the prefix is added before encoding);
    # a non-prefixing model yields the zero-vector fallback
    assert np.linalg.norm(v[2]) == 1.0
    plain = HashingEmbedder(768, "hash-plain")
    assert np.linalg.norm(plain.encode([""])[0]) == 0.0
    # query vs passage prefix produces different vectors
    q = e.encode(["hello world"], prefix="query:")
    assert not np.array_equal(q[0], v[0])


def test_point_uuid_byte_compat():
    # UUIDv5 under the reference's fixed namespace
    # (connectors/qdrant_connection.py:106-107)
    assert point_uuid("doc1_chunk0") == str(uuid.uuid5(QDRANT_NAMESPACE, "doc1_chunk0"))
    # frozen literal so a namespace/derivation regression can't hide
    assert point_uuid("doc1_chunk0") == "e3be1563-fe94-5d3e-ba9b-286b6f69f611"


def test_chunk_and_doc_ids():
    assert chunk_id("d", 3) == "d_chunk3"
    assert doc_id_from_url("https://fixture.test/tiny/tiny-0000001") == "tiny-0000001"
    assert doc_id_from_url("https://x.test/a/b/report.txt") == "report"
    assert doc_id_from_url("https://x.test/a/page.html?x=1#frag") == "page"


def test_parse_chunk_id_roundtrip():
    from nlp_graphrag_with_qdrant_and_neo4j_ray.functions.ids import (
        chunk_id,
        parse_chunk_id,
    )

    assert parse_chunk_id(chunk_id("doc1", 0)) == ("doc1", 0)
    assert parse_chunk_id(chunk_id("a_chunky_doc", 12)) == ("a_chunky_doc", 12)
    # doc ids containing the separator still round-trip (rpartition)
    assert parse_chunk_id(chunk_id("x_chunk1", 2)) == ("x_chunk1", 2)
    assert parse_chunk_id("garbage") is None
    assert parse_chunk_id("_chunk5") is None
    assert parse_chunk_id("doc_chunkX") is None
