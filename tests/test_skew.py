"""Skew handling: a Zipf-head entity dominating the corpus must aggregate
exactly (the salted two-level groupby, SURVEY.md §7.4)."""

import pytest

from nlp_graphrag_with_qdrant_and_neo4j_ray.config import PipelineConfig


@pytest.fixture(scope="module")
def skew_kg(ray_session, tmp_path_factory):
    """Corpus where 'the United States' appears in ~most documents
    (the fixture generator's HEAD_ENTITY template plus organic facts)."""
    from nlp_graphrag_with_qdrant_and_neo4j_ray.pipelines.kg import build_kg
    from nlp_graphrag_with_qdrant_and_neo4j_ray.sources.pages import pages_dataset

    out = str(tmp_path_factory.mktemp("skew"))
    cfg = PipelineConfig(salt_buckets=8)
    return build_kg(lambda: pages_dataset(120, "skewtest"), out, cfg,
                    resume=False, lineage=False), cfg


def test_head_entity_counts_exact(skew_kg):
    tables, cfg = skew_kg
    triples = tables["linked_triples"].take_all()
    # oracle: naive driver-side count over every linked mention
    naive: dict[str, int] = {}
    for t in triples:
        for col in ("src_entity_id", "dst_entity_id"):
            naive[t[col]] = naive.get(t[col], 0) + 1
    got = {r["entity_id"]: r["mention_count"]
           for r in tables["entity_nodes"].take_all()}
    assert got == naive
    # the head entity really is skewed (sanity of the fixture)
    head = naive.get("e:united states", 0)
    assert head >= 20
    assert head == got["e:united states"]


def test_salt_spreads_head_entity(skew_kg):
    """The salt column must actually split the head entity's rows across
    multiple level-1 groups (the mechanism, not just the result)."""
    import pandas as pd

    tables, cfg = skew_kg
    rows = [r for r in tables["linked_triples"].take_all()
            if "e:united states" in (r["src_entity_id"], r["dst_entity_id"])]
    salts = {r["salt"] for r in rows}
    assert len(salts) > 1  # hot key split across salt buckets
    assert all(0 <= s < cfg.salt_buckets for s in salts)


def test_edge_weights_exact(skew_kg):
    tables, _cfg = skew_kg
    triples = tables["linked_triples"].take_all()
    naive: dict[tuple, int] = {}
    for t in triples:
        k = (t["src_entity_id"], t["dst_entity_id"], t["pred"])
        naive[k] = naive.get(k, 0) + 1
    got = {
        (r["src_entity_id"], r["dst_entity_id"], r["pred"]): r["weight"]
        for r in tables["edges"].take_all()
    }
    assert got == naive


def test_edges_alias_fanout_reference_multiplicity(ray_session):
    """Optional reference-parity fan-out (core/triplets.py:372-398): a
    canonical edge between entities with |aliases| 2 and 1 materializes
    2x1 = 2 edges whose ids are the unmerged per-alias entity ids."""
    import pyarrow as pa
    import ray.data

    from nlp_graphrag_with_qdrant_and_neo4j_ray.functions.link import (
        canonical_key,
        entity_id_for,
    )
    from nlp_graphrag_with_qdrant_and_neo4j_ray.stages.link import (
        edges_alias_fanout,
    )

    nodes = ray.data.from_arrow(pa.table({
        "entity_id": ["e:acme corp", "e:bob"],
        "aliases": pa.array([["acme corp", "acme corporation"], ["bob"]],
                            pa.list_(pa.string())),
    }))
    edges = ray.data.from_arrow(pa.table({
        "src_entity_id": ["e:acme corp"],
        "dst_entity_id": ["e:bob"],
        "pred": ["EMPLOYS"],
        "chunk_id": ["c1"],
        "weight": pa.array([3], pa.int64()),
    }))
    rows = edges_alias_fanout(edges, nodes).take_all()
    assert len(rows) == 2
    want_src = {entity_id_for(canonical_key("acme corp")),
                entity_id_for(canonical_key("acme corporation"))}
    assert {r["src_entity_id"] for r in rows} == want_src
    assert all(r["dst_entity_id"] == "e:bob" and r["weight"] == 3
               and r["pred"] == "EMPLOYS" for r in rows)
