"""Exact phrase scan (pipelines/textstats.phrase_matches): positions
match a per-doc python scan, phrases never match across document
boundaries, overlapping occurrences all surface, and results are
partition-independent."""

import pyarrow as pa
import ray.data as rd

from nlp_graphrag_with_qdrant_and_neo4j_ray.pipelines.textstats import (
    phrase_matches,
)


def py_scan(docs: dict[int, str], phrase: list[str]) -> set[tuple[int, int]]:
    out = set()
    k = len(phrase)
    for i, t in docs.items():
        toks = t.split(" ")
        for p in range(len(toks) - k + 1):
            if toks[p:p + k] == phrase:
                out.add((i, p + 1))
    return out


DOCS = {
    0: "a b c a b c a b",
    1: "b c a",
    2: "a a a a",
    3: "x  a b",          # double space: empty token keeps its slot
    4: "c",
    5: "",
}


def _ds(docs):
    return rd.from_arrow(pa.table({
        "doc_id": list(docs),
        "text": list(docs.values()),
    }))


def test_matches_python_scan(ray_session):
    for phrase in (["a", "b"], ["a", "b", "c"], ["c"], ["z", "q"]):
        got = phrase_matches(_ds(DOCS), phrase).to_pandas()
        assert set(map(tuple, got.values.tolist())) == py_scan(DOCS, phrase)


def test_overlapping_and_boundaries(ray_session):
    got = phrase_matches(_ds(DOCS), ["a", "a"]).to_pandas()
    # doc 2 "a a a a" has three overlapping matches; doc 0 ends in "b"
    # and doc 1 starts with "b c": no cross-document "b b" style bleed.
    assert set(map(tuple, got.values.tolist())) == {(2, 1), (2, 2), (2, 3)}
    empty = phrase_matches(_ds(DOCS), ["b", "b"]).to_pandas()
    assert len(empty) == 0


def test_raw_split_positions(ray_session):
    # doc 3 "x  a b": raw split is [x, '', a, b] so "a b" sits at pos 3.
    got = phrase_matches(_ds({3: DOCS[3]}), ["a", "b"]).to_pandas()
    assert set(map(tuple, got.values.tolist())) == {(3, 3)}


def test_partition_independent(ray_session):
    a = (phrase_matches(_ds(DOCS).repartition(1), ["a", "b"])
         .to_pandas().sort_values(["doc_id", "pos"]).reset_index(drop=True))
    b = (phrase_matches(_ds(DOCS).repartition(6), ["a", "b"])
         .to_pandas().sort_values(["doc_id", "pos"]).reset_index(drop=True))
    assert a.equals(b)
