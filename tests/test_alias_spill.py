"""Alias-dictionary overflow: the ≥0.96 similarity merge must survive a
dictionary too large to broadcast (VERDICT r1 finding 4 — the previous
behavior silently dropped the dict and changed the entity graph with
corpus size). Forcing ``max_aliases=0`` routes linking through the
Parquet spill + partition-aligned map-side join, which must produce the
SAME linked ids as broadcast mode."""

import pyarrow as pa
import pytest

from nlp_graphrag_with_qdrant_and_neo4j_ray.config import PipelineConfig

CFG = PipelineConfig()


def _triples_ds():
    import ray.data

    # "apple x y" vs "apple y x": same token bag → hashing-embedder cosine
    # 1.0 ≥ 0.96, same first-token blocking bucket, DIFFERENT canonical
    # keys → only an alias entry can merge them.
    rows = {
        "chunk_id": [f"d{i}_chunk0" for i in range(6)],
        "doc_id": [f"d{i}" for i in range(6)],
        "sent_index": [0] * 6,
        "subj": ["apple x y", "apple y x", "apple x y",
                 "banana q r", "banana r q", "cherry solo"],
        "pred": ["likes"] * 6,
        "obj": ["cherry solo", "banana q r", "banana r q",
                "apple x y", "cherry solo", "apple y x"],
    }
    return ray.data.from_arrow(pa.table(rows))


@pytest.fixture(scope="module")
def linked_both_modes(ray_session, tmp_path_factory):
    from nlp_graphrag_with_qdrant_and_neo4j_ray.stages.link import (
        SpilledAlias,
        collect_alias_dict,
        link_triples,
    )
    from nlp_graphrag_with_qdrant_and_neo4j_ray.state.broadcast import BroadcastLookup

    spill_dir = str(tmp_path_factory.mktemp("alias_spill"))

    broadcast_alias = collect_alias_dict(_triples_ds(), CFG)
    assert isinstance(broadcast_alias, BroadcastLookup)
    via_broadcast = link_triples(_triples_ds(), broadcast_alias, CFG)

    spilled_alias = collect_alias_dict(
        _triples_ds(), CFG, max_aliases=0, spill_dir=spill_dir,
        spill_partitions=4,
    )
    assert isinstance(spilled_alias, SpilledAlias)
    via_spill = link_triples(_triples_ds(), spilled_alias, CFG)

    def key(rows):
        return sorted(
            (r["chunk_id"], r["subj"], r["obj"],
             r["src_entity_id"], r["dst_entity_id"])
            for r in rows
        )

    return key(via_broadcast.take_all()), key(via_spill.take_all())


def test_spill_mode_matches_broadcast(linked_both_modes):
    broadcast_rows, spill_rows = linked_both_modes
    assert broadcast_rows == spill_rows


def test_similarity_merge_survives_spill(linked_both_modes):
    _, spill_rows = linked_both_modes
    by_name = {}
    for _, subj, obj, src, dst in spill_rows:
        by_name[subj] = src
        by_name[obj] = dst
    # the ≥0.96 merge still happened through the spilled path
    assert by_name["apple x y"] == by_name["apple y x"]
    assert by_name["banana q r"] == by_name["banana r q"]
    assert by_name["cherry solo"] not in (by_name["apple x y"],
                                          by_name["banana q r"])


def test_overflow_records_lineage(ray_session, tmp_path):
    from nlp_graphrag_with_qdrant_and_neo4j_ray.stages.link import collect_alias_dict
    from nlp_graphrag_with_qdrant_and_neo4j_ray.state.lineage import LineageRecorder

    out = str(tmp_path)
    rec = LineageRecorder(out, "alias", "alias@test")
    collect_alias_dict(_triples_ds(), CFG, max_aliases=0,
                       spill_dir=f"{out}/_alias_spill", spill_partitions=4,
                       lineage=rec)
    import ray.data

    rows = ray.data.read_parquet(f"{out}/lineage").take_all()
    assert any(r["input_fragment"] == "alias-dict:spilled" for r in rows)
