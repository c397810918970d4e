"""Embedding cluster-separation audit
(pipelines/similarity.label_separation): matches an explicit
per-member cosine reimplementation, separates planted clusters
positively, flags a label planted inside another cluster with
non-positive separation, and is partition-independent."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from nlp_graphrag_with_qdrant_and_neo4j_ray.pipelines.similarity import (
    label_separation,
)


def py_separation(vecs: np.ndarray, labels: np.ndarray):
    labs = np.unique(labels)
    cents = {l: vecs[labels == l].mean(axis=0) for l in labs}
    out = {}
    for l in labs:
        members = vecs[labels == l]
        unit = members / np.linalg.norm(members, axis=1)[:, None]
        cos = {
            m: float(np.mean(unit @ (c / np.linalg.norm(c))))
            for m, c in cents.items()
        }
        others = sorted((m for m in labs if m != l),
                        key=lambda m: (-cos[m], m))
        nearest = others[0]
        out[int(l)] = (
            int((labels == l).sum()), round(cos[l], 6), int(nearest),
            round(cos[nearest], 6), round(cos[l] - cos[nearest], 6),
        )
    return out


def _make(seed=7):
    rng = np.random.default_rng(seed)
    # three well-separated clusters + label 3 planted INSIDE cluster 0
    centers = {0: [10, 0, 0, 0], 1: [0, 10, 0, 0], 2: [0, 0, 10, 0],
               3: [10, 0, 0, 0]}
    vecs, labels = [], []
    for l, c in centers.items():
        for _ in range(12):
            vecs.append(np.array(c, float) + rng.normal(0, 0.5, 4))
            labels.append(l)
    return np.array(vecs), np.array(labels)


def _ds(vecs, labels):
    return rd.from_arrow(pa.table({
        "label": pa.array(labels.astype(np.int32), pa.int32()),
        "embedding": pa.array([v.astype(np.float32) for v in vecs],
                              pa.list_(pa.float32())),
    }))


def test_matches_python_reimplementation(ray_session):
    vecs, labels = _make()
    # float32 source like the parquet table, float64 math like the op
    vecs32 = vecs.astype(np.float32).astype(np.float64)
    got = label_separation(_ds(vecs, labels)).to_pandas()
    want = py_separation(vecs32, labels)
    assert len(got) == len(want)
    for _, r in got.iterrows():
        n, intra, nl, nc, sep = want[r["label"]]
        assert (r["n"], r["intra_cos"], r["nearest_label"],
                r["nearest_cos"], r["separation"]) == \
            (n, intra, nl, nc, sep)


def test_planted_clusters_separate(ray_session):
    vecs, labels = _make()
    got = label_separation(_ds(vecs, labels)).to_pandas().set_index("label")
    # labels 1 and 2 are isolated clusters: clearly positive margin
    assert (got.loc[[1, 2], "separation"] > 0.3).all()
    # label 3 sits inside cluster 0: the two prototypes coincide, so
    # the margin collapses to ~0 and each names the other as nearest
    assert abs(got.loc[3, "separation"]) < 0.05
    assert got.loc[3, "nearest_label"] == 0
    assert got.loc[0, "nearest_label"] == 3


def test_partition_independent(ray_session):
    vecs, labels = _make()
    a = (label_separation(_ds(vecs, labels).repartition(1))
         .to_pandas().reset_index(drop=True))
    b = (label_separation(_ds(vecs, labels).repartition(9))
         .to_pandas().reset_index(drop=True))
    assert a.equals(b)
