"""Winnowing fingerprints (pipelines/textstats.winnow_fingerprints):
matches the per-window rightmost-minimum definition from the paper,
honors the w+k-1 shared-run detection guarantee, handles short
documents and ties, and is partition-independent."""

import hashlib

import pyarrow as pa
import ray.data as rd

from nlp_graphrag_with_qdrant_and_neo4j_ray.pipelines.textstats import (
    winnow_fingerprints,
)


def py_winnow(text: str, k: int, w: int) -> set[tuple[int, str]]:
    """Direct per-window definition: every window of w consecutive
    shingle hashes selects its minimum, rightmost on ties."""
    toks = [x for x in text.split(" ") if x]
    n = len(toks) - k + 1
    if n <= 0:
        return set()
    h = [hashlib.md5(" ".join(toks[p:p + k]).encode()).hexdigest()[:15]
         for p in range(n)]
    ww = min(w, n)
    out = set()
    for ws in range(n - ww + 1):
        best = ws
        for p in range(ws, ws + ww):
            if h[p] <= h[best]:
                best = p
        out.add((best + 1, h[best]))
    return out


DOCS = {
    0: "the quick brown fox jumps over the lazy dog again and again",
    1: "one two",                      # shorter than k: no shingles
    2: "one two three",                # exactly one shingle
    3: "a b c d e",                    # fewer shingles than w
    4: "x y x y x y x y x y x y",      # heavy hash ties
    5: "",
}


def _ds(docs):
    return rd.from_arrow(pa.table({
        "doc_id": list(docs),
        "text": list(docs.values()),
    }))


def test_matches_per_window_definition(ray_session):
    got = winnow_fingerprints(_ds(DOCS), k=3, w=4).to_pandas()
    for i, text in DOCS.items():
        rows = got[got["doc_id"] == i]
        assert set(zip(rows["gpos"], rows["fp"])) == py_winnow(text, 3, 4)


def test_shared_run_guarantee(ray_session):
    # Two documents sharing a run of w+k-1 = 6 tokens must share at
    # least one fingerprint (the winnowing detection guarantee).
    shared = "alpha beta gamma delta epsilon zeta"
    docs = {
        0: "intro words before " + shared + " trailing tail here",
        1: shared + " completely different ending tokens now",
    }
    got = winnow_fingerprints(_ds(docs), k=3, w=4).to_pandas()
    fps0 = set(got[got["doc_id"] == 0]["fp"])
    fps1 = set(got[got["doc_id"] == 1]["fp"])
    assert fps0 & fps1


def test_sampling_is_sparse(ray_session):
    # Winnowing keeps a subset of shingles, not all of them.
    text = DOCS[0]
    got = winnow_fingerprints(_ds({0: text}), k=3, w=4).to_pandas()
    n_shingles = len([x for x in text.split() if x]) - 2
    assert 0 < len(got) < n_shingles


def test_partition_independent(ray_session):
    a = (winnow_fingerprints(_ds(DOCS).repartition(1))
         .to_pandas().sort_values(["doc_id", "gpos"])
         .reset_index(drop=True))
    b = (winnow_fingerprints(_ds(DOCS).repartition(6))
         .to_pandas().sort_values(["doc_id", "gpos"])
         .reset_index(drop=True))
    assert a.equals(b)
