"""hard_negatives — exactness vs an in-memory reference, planted
structure, label-coverage edge cases."""

import numpy as np
import pandas as pd

from nlp_graphrag_with_qdrant_and_neo4j_ray.pipelines.similarity import (
    hard_negatives,
)


def _ds(ray_session, df, blocks=3):
    # arrow list<float> column, the shape the parquet tables ship
    # (from_pandas on ndarray cells makes Ray's tensor extension type)
    import pyarrow as pa
    import ray.data

    tbl = pa.table({
        "vec_id": pa.array(df["vec_id"].to_numpy(), pa.int64()),
        "embedding": pa.array(
            [list(map(float, v)) for v in df["embedding"]],
            pa.list_(pa.float32())),
        "label": pa.array(df["label"].to_numpy(), pa.int64()),
    })
    return ray.data.from_arrow(tbl).repartition(blocks)


def _emb(vecs, labels):
    return pd.DataFrame({
        "vec_id": np.arange(len(vecs), dtype=np.int64),
        "embedding": [np.asarray(v, np.float32) for v in vecs],
        "label": np.asarray(labels, np.int64),
    })


def _ref(df):
    M = np.stack([np.asarray(v, np.float64) for v in df["embedding"]])
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    s = M @ M.T
    out = {}
    ids = df["vec_id"].to_numpy()
    labels = df["label"].to_numpy()
    for i in range(len(ids)):
        mask = labels != labels[i]
        if not mask.any():
            continue
        cand = np.where(mask)[0]
        # max score, ties toward smaller id
        order = sorted(cand, key=lambda j: (-s[i, j], ids[j]))
        j = order[0]
        out[int(ids[i])] = (int(ids[j]), int(labels[j]),
                            round(float(s[i, j]), 6))
    return out


def test_matches_reference_random(ray_session):
    rng = np.random.default_rng(3)
    df = _emb(rng.normal(size=(60, 8)), rng.integers(0, 4, 60))
    got = hard_negatives(_ds(ray_session, df)).to_pandas()
    want = _ref(df)
    assert set(got["vec_id"]) == set(want)
    for r in got.itertuples():
        w = want[r.vec_id]
        assert (r.neg_id, r.neg_label) == (w[0], w[1]), (r, w)
        assert abs(r.score - w[2]) <= 1e-6


def test_planted_nearest_cross_label(ray_session):
    # two tight clusters with opposite labels + one bridge point whose
    # nearest other-label vector is unambiguous
    a = np.array([1.0, 0.0, 0.0])
    b = np.array([0.0, 1.0, 0.0])
    df = _emb([a, a + 0.01, b, b + 0.01,
               0.9 * a + 0.1 * b], [0, 0, 1, 1, 1])
    got = hard_negatives(_ds(ray_session, df, 2)).to_pandas()
    by_id = dict(zip(got["vec_id"], got["neg_id"]))
    # label-0 vectors' hardest negative is the bridge (id 4, label 1)
    assert by_id[0] == 4 and by_id[1] == 4


def test_single_label_corpus_yields_empty(ray_session):
    rng = np.random.default_rng(1)
    df = _emb(rng.normal(size=(10, 4)), [7] * 10)
    got = hard_negatives(_ds(ray_session, df, 2)).to_pandas()
    assert len(got) == 0


def test_every_row_covered_when_two_labels(ray_session):
    rng = np.random.default_rng(9)
    df = _emb(rng.normal(size=(30, 6)), [0] * 15 + [1] * 15)
    got = hard_negatives(_ds(ray_session, df)).to_pandas()
    assert len(got) == 30
    labels = dict(zip(df["vec_id"], df["label"]))
    for r in got.itertuples():
        assert labels[r.neg_id] != labels[r.vec_id]
